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
    id_col: str,
    payload_cols: list[str],
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming ingest-time NEAR-dedup: first arrival per full-MinHash-
    signature key wins. Signature equality is single-band LSH — the
    high-precision end of the near-dup spectrum (docs must agree on ALL
    ``num_hashes`` minima), which is the right trade-off at ingest: drop
    only confident near-dups in the stream, leave recall-oriented
    multi-band pairing to the batch layer (:func:`~xmlschemavalidator_spark.
    dedup.incremental_near_dedup` over the committed corpus).

    The signature is :func:`~xmlschemavalidator_spark.dedup.
    minhash_signature` — a pure per-row Column expression, so no shuffle
    precedes the stateful grouping (chaining an aggregation into
    applyInPandasWithState is not a legal streaming plan without
    watermarks). Docs too short to shingle get their exact fingerprint as
    the key instead: an empty shingle array yields an all-NULL signature,
    and one shared key would collapse EVERY short doc into a single
    survivor (the batch-side sig=0 pitfall, VERDICT r2)."""
    from xmlschemavalidator_spark.dedup import minhash_signature, shingles
    from xmlschemavalidator_spark.textops import doc_fingerprint

    sig = F.when(
        F.size(shingles(F.col(text_col), shingle_n)) > 0,
        F.xxhash64(
            minhash_signature(F.col(text_col), num_hashes, shingle_n)
        ).cast("string"),
    ).otherwise(F.concat(F.lit("fp:"), doc_fingerprint(F.col(text_col))))
    keyed = stream_df.withColumn("_sig", sig)
    return stream_dedup_first_seen(keyed, "_sig", payload_cols, state_ttl_ms)
