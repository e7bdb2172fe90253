"""Sequence/order data-quality checks: per-key monotonicity of a
timestamp along an ingestion order, and contiguity of a sequence-number
column.

The two classic event-log invariants: (1) "within a user, event time
never runs backwards along the log order" — violated by clock skew,
replayed batches, or a mis-merged backfill; (2) "line numbers per order
are 1..n with no gaps or duplicates" — violated by dropped or
double-delivered rows. Both emit results in the engine's standard
shapes (violation rows / per-key summaries) so they flow into the same
sinks as facet and uniqueness checks.

Scale shape: monotonicity is ONE window pass per key (running max over
the preceding frame — partial ordering state, no self-join);
gap checking is ONE two-level aggregate (distinct-collapse first, so a
duplicate-heavy key reaches the shuffle collapsed). Both shuffle once
on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def order_violations(
    df: DataFrame,
    key: str,
    ts: str,
    order_col: str,
    id_col: str,
    rule_id: str | None = None,
) -> DataFrame:
    """Rows whose `ts` is EARLIER than the maximum `ts` seen before them
    in `order_col` order within the same `key` — time ran backwards.
    Returns violation rows ``(id, rule_id, observed_value, key,
    prev_max_ts)`` where observed_value is the offending timestamp as an
    ISO string (the engine's violation-row convention).

    The running max (not lag alone) is what makes this the real
    invariant: after one late row, every subsequent in-order row would
    "recover" under a lag check while still being earlier than the
    watermark the stream had already advanced to.
    """
    if "_prev_max" in df.columns:
        raise ValueError(
            "order_violations: column '_prev_max' collides with an "
            "internal name; rename it first"
        )
    rid = rule_id or f"order_{ts}_by_{order_col}"
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max(ts).over(w)
    return (
        df.withColumn("_prev_max", prev_max)
        .where(F.col("_prev_max").isNotNull() & (F.col(ts) < F.col("_prev_max")))
        .select(
            F.col(id_col),
            F.lit(rid).alias("rule_id"),
            F.date_format(F.col(ts), "yyyy-MM-dd HH:mm:ss").alias("observed_value"),
            F.col(key),
            F.date_format(F.col("_prev_max"), "yyyy-MM-dd HH:mm:ss").alias(
                "prev_max_ts"
            ),
        )
    )


def sequence_gap_summary(df: DataFrame, key: str, seq_col: str) -> DataFrame:
    """Per-key contiguity summary of an integer sequence column:
    ``(key, n_rows, n_distinct, min_seq, max_seq, n_missing,
    n_duplicates)`` where ``n_missing = (max-min+1) - n_distinct`` and
    ``n_duplicates = n_rows - n_distinct``. A clean 1..n key shows
    zeros in both. NULL sequence values are excluded from the range
    math but counted in ``n_rows`` (a NULL line number is its own
    finding for the null-rate check).

    Two-level aggregate: ``groupBy(key, seq)`` collapses duplicates
    map-side before the per-key rollup — a key with a million duplicate
    rows reaches the shuffle as one row per distinct value.
    """
    pair = df.groupBy(
        F.col(key), F.col(seq_col).alias("_seq")
    ).agg(F.count(F.lit(1)).alias("_n"))
    # duplicates are counted over NON-NULL sequence values only: a NULL
    # line number is a null-rate finding, not a double delivery
    n_nonnull = F.sum(F.when(F.col("_seq").isNotNull(), F.col("_n")))
    return pair.groupBy(key).agg(
        F.sum("_n").cast("bigint").alias("n_rows"),
        F.count("_seq").cast("bigint").alias("n_distinct"),
        F.min("_seq").cast("bigint").alias("min_seq"),
        F.max("_seq").cast("bigint").alias("max_seq"),
        (
            (F.max("_seq") - F.min("_seq") + 1) - F.count("_seq")
        ).cast("bigint").alias("n_missing"),
        F.coalesce(n_nonnull - F.count("_seq"), F.lit(0))
        .cast("bigint")
        .alias("n_duplicates"),
    )
