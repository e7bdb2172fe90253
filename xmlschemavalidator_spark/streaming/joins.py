"""Stream-stream joins: watermarked interval matching of two live
streams — the Structured Streaming capability batch joins can't fake
(both sides grow; matching needs bounded buffered state on each side).

The canonical shape (Spark SS docs' ad-monetization example): match
every left event to the right events with the same key that occur
within ``[left_ts, left_ts + max_delay]`` — impressions→clicks,
views→purchases, request→response pairing. Spark buffers each side's
state and evicts it using the watermark plus the join's time bound, so
state is bounded by ``watermark + max_delay``, not by stream length.

Batch equivalence: the inner interval join emits exactly the pairs the
same join would produce in batch, PROVIDED event-time disorder stays
within the watermark (late rows beyond it are dropped from state — the
documented Structured Streaming contract, not a quirk of this wrapper).
The driver query replays a real table as a chunked file stream and
hash-matches a DuckDB batch interval join, covering cross-micro-batch
matches (a click in batch 3 pairing with a view buffered since batch 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_delay_seconds: int,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked inner stream-stream join: rows ``(on, <left cols>,
    <right cols>)`` for every (left, right) pair with equal ``on`` key
    and ``left_ts <= right_ts <= left_ts + max_delay_seconds``
    (half-closed at the top: an instant response counts, one a full
    ``max_delay`` later still counts).

    Both inputs must already be projected to DISJOINT non-key column
    names (raising here beats Spark's ambiguous-reference error three
    operators later) with event-time columns of TIMESTAMP type.
    NULL-event-time rows are dropped up front: they can never satisfy
    the interval predicate, but they WOULD stall the watermark.

    State shape at scale: each side buffers only rows newer than
    (watermark + the join bound) — eviction is Spark's own
    state-watermark calculus; nothing is collected driver-side.
    """
    if max_delay_seconds <= 0:
        raise ValueError(
            f"stream_interval_join: max_delay_seconds must be > 0, "
            f"got {max_delay_seconds}"
        )
    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(
            "stream_interval_join: non-key columns must be disjoint, "
            f"both sides carry {sorted(overlap)}; project/rename first"
        )
    l = (
        left.where(F.col(left_ts).isNotNull())
        .withWatermark(left_ts, watermark)
        .alias("l")
    )
    r = (
        right.where(F.col(right_ts).isNotNull())
        .withWatermark(right_ts, watermark)
        .alias("r")
    )
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}")
            + F.expr(f"INTERVAL {int(max_delay_seconds)} SECONDS")
        )
    )
    joined = l.join(r, cond, "inner")
    keep = [F.col(f"l.{on}").alias(on)]
    keep += [F.col(f"l.{c}") for c in left.columns if c != on]
    keep += [F.col(f"r.{c}") for c in right.columns if c != on]
    return joined.select(*keep)


def stream_abandonment_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_delay_seconds: int,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked LEFT OUTER stream-stream join — the MISSING-event
    monitor the inner join can't express: every left row emits, matched
    rights attached, and a left whose ``[left_ts, left_ts+max_delay]``
    window expires unmatched emits ONCE with NULL right columns and
    ``is_abandoned = true`` (cart abandonment, unanswered requests,
    views that never convert). Same disjoint-columns / NULL-ts / state
    contract as :func:`stream_interval_join`.

    Emission semantics (the documented Structured Streaming contract,
    not a quirk here): the NULL-match row for a left emits only after
    the watermark passes ``left_ts + max_delay`` — i.e. in a LATER
    micro-batch, once the engine can prove no match can still arrive.
    A monitoring consumer therefore sees abandonment verdicts delayed
    by (watermark + max_delay), which is the price of exactness; tests
    replay a sentinel batch to advance the watermark deterministically.

    State at scale: both sides evict by watermark + join bound exactly
    like the inner form — the outer-ness adds only the per-left
    "matched?" bit Spark tracks in the same state store.
    """
    if max_delay_seconds <= 0:
        raise ValueError(
            f"stream_abandonment_join: max_delay_seconds must be > 0, "
            f"got {max_delay_seconds}"
        )
    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(
            "stream_abandonment_join: non-key columns must be disjoint, "
            f"both sides carry {sorted(overlap)}; project/rename first"
        )
    l = (
        left.where(F.col(left_ts).isNotNull())
        .withWatermark(left_ts, watermark)
        .alias("l")
    )
    r = (
        right.where(F.col(right_ts).isNotNull())
        .withWatermark(right_ts, watermark)
        .alias("r")
    )
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}")
            + F.expr(f"INTERVAL {int(max_delay_seconds)} SECONDS")
        )
    )
    joined = l.join(r, cond, "leftOuter")
    keep = [F.col(f"l.{on}").alias(on)]
    keep += [F.col(f"l.{c}") for c in left.columns if c != on]
    keep += [F.col(f"r.{c}") for c in right.columns if c != on]
    keep.append(F.col(f"r.{right_ts}").isNull().alias("is_abandoned"))
    return joined.select(*keep)
