"""Custom stateful streaming operators via applyInPandasWithState.

First use case: **cross-batch first-seen deduplication** — emit each key's
first occurrence only, remembering seen keys in the state store. This is
the streaming form of the corpus dedup ops (dedup.py): at crawl-ingest
time you drop re-crawled urls before they ever hit storage.

State is per-key (grouped on the dedup key), so the state store scales
horizontally with shuffle partitions; a processing-time timeout bounds
state size for keys never seen again.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_dedup_first_seen(
    stream_df: DataFrame,
    key: str,
    payload_cols: list[str],
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming first-seen dedup: one output row per distinct ``key``
    across ALL micro-batches (the first arrival wins).

    ``state_ttl_ms``: optional processing-time TTL after which a key's
    seen-marker expires (bounds state for one-shot keys; re-arrivals after
    expiry are emitted again — the documented trade-off).
    """
    out_schema = ", ".join([f"{key} string"] + [f"{c} string" for c in payload_cols])
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def fn(
        key_tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        if seen:
            for _ in batches:  # drain; key already emitted
                pass
            return
        first = None
        for b in batches:
            if len(b) and first is None:
                first = b.iloc[[0]]
        if first is not None:
            state.update((True,))
            if state_ttl_ms:
                state.setTimeoutDuration(state_ttl_ms)
            yield first[[key] + payload_cols].astype(str)

    return (
        stream_df.groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="seen boolean",
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def stream_near_dedup_first_seen(
    stream_df: DataFrame,
    payload_cols: list[str],
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming ingest-time NEAR-dedup: first arrival per
    :func:`~xmlschemavalidator_spark.dedup.near_dedup_key` wins (full
    MinHash signature = single-band LSH, the high-precision trade-off
    right at ingest: drop only confident near-dups in the stream, leave
    recall-oriented multi-band pairing to the batch layer —
    :func:`~xmlschemavalidator_spark.dedup.incremental_near_dedup` over
    the committed corpus). Output carries exactly ``payload_cols``.

    The key is a pure per-row Column expression, so no shuffle precedes
    the stateful grouping (chaining an aggregation into
    applyInPandasWithState is not a legal streaming plan without
    watermarks)."""
    from xmlschemavalidator_spark.dedup import near_dedup_key

    if "_near_key" in stream_df.columns:
        raise ValueError("input stream already has a _near_key column")
    keyed = stream_df.withColumn(
        "_near_key", near_dedup_key(text_col, num_hashes, shingle_n)
    )
    return stream_dedup_first_seen(
        keyed, "_near_key", payload_cols, state_ttl_ms
    ).select(*payload_cols)


def stream_latest_capture(
    stream_df: DataFrame,
    url_col: str,
    ts_col: str,
    payload_cols: list[str],
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming form of :func:`~xmlschemavalidator_spark.weburl.
    snapshot_dedup`: per canonical URL, emit a row whenever a STRICTLY
    newer capture than anything seen so far arrives (state remembers the
    best capture time per key). Append-mode streams cannot retract, so
    the output is the *improvement log* — consumers take the last
    emission per URL, or let the batch layer's snapshot_dedup compact
    the sink; equal-or-older re-crawls are dropped at ingest, which is
    the bulk of re-crawl traffic.

    The grouping key is a pure per-row Column (canonical URL), so no
    shuffle precedes the stateful grouping; NULL-URL rows are dropped
    (they would all share one meaningless NULL key). Within one
    micro-batch only the newest capture of a key is considered (ties
    inside a batch break to the first row scanned — arrival order,
    documented). ``ts_col`` may be a timestamp or numeric; state stores
    int64 (ns for timestamps).

    ``state_ttl_ms`` trade-off (same family as
    :func:`stream_dedup_first_seen`'s): the timeout is refreshed on
    EVERY arrival of a key, so state expires only for keys genuinely not
    re-crawled within the TTL — but after an expiry an older capture
    can re-emit. Consumers compacting the sink must therefore take the
    MAX ``capture_ts`` per URL (which the emitted column makes exact),
    never "the last emission".
    """
    from xmlschemavalidator_spark.weburl import canonical_url

    if "_canon_url" in stream_df.columns:
        raise ValueError("input stream already has a _canon_url column")
    keyed = stream_df.withColumn(
        "_canon_url", canonical_url(F.col(url_col))
    ).where(F.col("_canon_url").isNotNull())
    out_schema = ", ".join(
        ["_canon_url string"]
        + [f"{c} string" for c in payload_cols]
        + ["capture_ts long"]
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def to_ns(v) -> int | None:
        if v is None or v != v:  # NaN/NaT
            return None
        if isinstance(v, pd.Timestamp):
            return int(v.value)
        return int(v)

    def s(v):
        # preserve NULLs — str(None) would write the literal "None"
        # into the sink (review finding)
        return None if v is None or v != v else str(v)

    def fn(
        key_tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        best = state.get[0] if state.exists else None
        cand_row, cand_ts = None, None
        for b in batches:
            # vectorized per-chunk max (a hot URL can bring thousands of
            # captures per micro-batch; iterrows would materialize a
            # Series per row — review finding)
            vals = b[ts_col].map(to_ns)
            mask = vals.notna()
            if not mask.any():
                continue  # undated captures never beat anything
            # to_numeric: int64, not object (idxmax over object raises;
            # float64 would lose ns precision above 2^53)
            nums = pd.to_numeric(vals[mask])
            i = nums.idxmax()
            ts = int(nums[i])
            if cand_ts is None or ts > cand_ts:
                cand_row, cand_ts = b.loc[i], ts
        improved = cand_row is not None and (best is None or cand_ts > best)
        if improved:
            state.update((cand_ts,))
        if state_ttl_ms and state.exists:
            # refresh on EVERY arrival, not only improvements: otherwise
            # a key seen constantly but never improving would expire and
            # its next older re-crawl would re-emit (review finding)
            state.setTimeoutDuration(state_ttl_ms)
        if improved:
            out = {"_canon_url": [s(cand_row["_canon_url"])]}
            for c in payload_cols:
                out[c] = [s(cand_row[c])]
            out["capture_ts"] = [cand_ts]
            yield pd.DataFrame(out)

    return (
        keyed.groupBy("_canon_url")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="best_ts long",
            outputMode="append",
            timeoutConf=timeout,
        )
        .withColumnRenamed("_canon_url", "canonical_url")
    )


def stream_sessionize(
    stream_df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    order_col: str,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming form of :func:`~xmlschemavalidator_spark.temporal.
    sessionize`: per key, a new session starts when the gap to the
    previous event exceeds ``gap_seconds``; state carries (last event
    time, session counter) across micro-batches. Emits one row per
    event: ``(key, order_col, ts_us, session_seq)`` — stringly-typed key
    and order column per the stateful-operator convention (consumers
    cast back).

    Batch equivalence (what the driver oracle checks): if events arrive
    in non-decreasing ``ts`` order per key ACROSS micro-batches (the
    normal shape of an ingest stream; within a batch any order is fine —
    rows are sorted by (ts, order_col) before the walk), the output is
    row-identical to batch ``sessionize`` + the same SQL window replay.
    Late policy, documented: a row older than the key's last seen time
    joins the CURRENT session (a negative gap never exceeds
    ``gap_seconds``) and never reopens earlier ones — state time is
    monotone (max), so one late straggler cannot fake a fresh gap for
    the next on-time event. NULL-``ts`` rows are dropped at the input
    (batch sessionize opens a fresh session per NULL-ts row, which is a
    meaningless shape to preserve; the divergence is documented here).

    ``state_ttl_ms``: optional processing-time TTL, refreshed on every
    arrival; an expiry resets the key's counter to 1 on its next event.
    """
    out_schema = (
        f"{key} string, {order_col} string, ts_us long, session_seq long"
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms
        else GroupStateTimeout.NoTimeout
    )
    gap_us = int(gap_seconds) * 1_000_000

    def fn(
        key_tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last_us, seq = state.get if state.exists else (None, 0)
        frames = [b for b in batches if len(b)]
        if not frames:
            if state_ttl_ms and state.exists:
                state.setTimeoutDuration(state_ttl_ms)
            return
        b = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
        # Arrow may hand the UDF datetime64[ns] OR datetime64[us]
        # depending on the source type — pin ns explicitly, then
        # integer-divide to the engine's exact epoch-microsecond
        # convention (no float in the gap arithmetic)
        t = (
            pd.to_datetime(b[ts])
            .astype("datetime64[ns]")
            .astype("int64")
            // 1_000
        )
        b = b.assign(_ts_us=t).sort_values(
            ["_ts_us", order_col], kind="mergesort"
        )
        out_key, out_ord, out_ts, out_seq = [], [], [], []
        prev = last_us
        for ts_us, oc in zip(b["_ts_us"], b[order_col]):
            ts_us = int(ts_us)
            if prev is None or ts_us - prev > gap_us:
                seq += 1
            out_key.append(str(key_tuple[0]))
            out_ord.append(None if oc is None else str(oc))
            out_ts.append(ts_us)
            out_seq.append(seq)
            prev = ts_us if prev is None else max(prev, ts_us)
        state.update((prev, seq))
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(
            {key: out_key, order_col: out_ord, "ts_us": out_ts,
             "session_seq": out_seq}
        )

    return (
        stream_df.where(F.col(ts).isNotNull())
        .groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="last_us long, seq long",
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def stream_order_violations(
    stream_df: DataFrame,
    key: str,
    ts: str,
    order_col: str,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming form of ``checks.sequence.order_violations``: the
    per-key running-max-timestamp watermark maintained as keyed state,
    emitting a violation row the moment an arrival's event time trails
    the watermark its key had already advanced to — the online
    time-ran-backwards monitor (clock skew, replayed batch, mis-merged
    backfill) at INGEST time, before the bad rows ever land.

    Emits ``(key, order_col, ts_us, prev_max_us)`` per violation —
    stringly-typed key/order per the stateful-operator convention.
    State per key is ONE int (the max event time seen); rows within a
    micro-batch are walked in ``order_col`` order.

    Batch equivalence (the driver-oracle contract, same as
    stream_sessionize): when per-key arrival follows ``order_col``
    across micro-batches — the normal shape, since log order IS arrival
    order — the emitted set is row-identical to the batch check + its
    SQL window replay. NULL-``ts`` rows are dropped (no time, no
    ordering claim).

    ``state_ttl_ms``: optional processing-time TTL, refreshed per
    arrival; after expiry the key's watermark restarts (documented
    trade-off: a post-expiry late row is not flagged).
    """
    out_schema = (
        f"{key} string, {order_col} string, ts_us long, prev_max_us long"
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def fn(
        key_tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (max_us,) = state.get if state.exists else (None,)
        frames = [b for b in batches if len(b)]
        if not frames:
            if state_ttl_ms and state.exists:
                state.setTimeoutDuration(state_ttl_ms)
            return
        b = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
        t = (
            pd.to_datetime(b[ts])
            .astype("datetime64[ns]")
            .astype("int64")
            // 1_000
        )
        b = b.assign(_ts_us=t).sort_values([order_col], kind="mergesort")
        out_key, out_ord, out_ts, out_prev = [], [], [], []
        for ts_us, oc in zip(b["_ts_us"], b[order_col]):
            ts_us = int(ts_us)
            if max_us is not None and ts_us < max_us:
                out_key.append(str(key_tuple[0]))
                out_ord.append(None if oc is None else str(oc))
                out_ts.append(ts_us)
                out_prev.append(max_us)
            max_us = ts_us if max_us is None else max(max_us, ts_us)
        state.update((max_us,))
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)
        if out_key:
            yield pd.DataFrame(
                {
                    key: out_key,
                    order_col: out_ord,
                    "ts_us": out_ts,
                    "prev_max_us": out_prev,
                }
            )

    base = stream_df.where(F.col(ts).isNotNull())
    return base.groupBy(key).applyInPandasWithState(
        fn, out_schema, "state_ts bigint", "append", timeout
    )


def stream_rate_violations(
    stream_df: DataFrame,
    host: str,
    ts: str,
    max_per_window: int,
    window_s: int = 1,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming form of ``weburl.crawl_rate_violations``: per-host
    fixed-window request counting in keyed state, emitting
    ``(host, window_start)`` the MOMENT a window crosses
    ``max_per_window`` — the politeness breaker trips at ingest, not in
    tomorrow's batch audit. State per host is two ints (current window,
    its count): bounded regardless of stream length.

    Batch equivalence (the stream_order_violations contract): under
    per-host log-order arrival — window ids nondecreasing per host
    across micro-batches, rows within a batch sorted here — the emitted
    set equals the batch audit's violating (host, window) pairs, so the
    query carries a FULL SQL oracle. A late row from an already-passed
    window restarts that window's count (disclosed: its earlier rows
    are gone from state by design; the batch audit remains the
    authoritative backfill).

    NULL host/ts rows are dropped upstream by the caller's projection
    (keyed state cannot group NULL hosts usefully)."""
    if max_per_window < 1 or window_s < 1:
        raise ValueError("stream_rate_violations: positive limits required")
    out_schema = f"{host} string, window_start long"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def fn(
        key_tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        cur_w, cnt = state.get if state.exists else (None, 0)
        frames = [b for b in batches if len(b)]
        if not frames:
            if state_ttl_ms and state.exists:
                state.setTimeoutDuration(state_ttl_ms)
            return
        b = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
        t_us = (
            pd.to_datetime(b[ts]).astype("datetime64[ns]").astype("int64") // 1_000
        )
        ws = sorted(int(u) // (window_s * 1_000_000) * window_s for u in t_us)
        out = []
        for w in ws:
            if cur_w is None or w != cur_w:
                cur_w, cnt = w, 1
            else:
                cnt += 1
            if cnt == max_per_window + 1:
                out.append(w)
        state.update((cur_w, cnt))
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)
        if out:
            yield pd.DataFrame(
                {host: [str(key_tuple[0])] * len(out), "window_start": out}
            )

    base = stream_df.where(F.col(ts).isNotNull())
    return base.groupBy(host).applyInPandasWithState(
        fn, out_schema, "cur_w bigint, cnt bigint", "append", timeout
    )
