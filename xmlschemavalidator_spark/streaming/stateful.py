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
