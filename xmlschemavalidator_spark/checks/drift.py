"""Distribution-drift checks: KS-style max-CDF-gap between a current table
and a baseline snapshot.

Two formulations:

* :func:`histogram` + :func:`ks_drift` — EXACT: bucketed counts → cumulative
  distribution → max |gap|. Bucket counts are a tiny partial+final aggregate
  (one shuffle of #buckets rows); the CDF join runs on #buckets rows, so the
  whole check is O(scan) at any scale and reproducible bit-for-bit (integer
  arithmetic until the final division). This is the oracle-checkable path.
* :func:`quantile_drift` — SKETCHED: ``percentile_approx`` (Greenwald-Khanna
  in Spark) on both sides over a quantile grid, max |baseline - current|
  normalized. Constant memory per partition, the 100 TB default when the
  value domain is unbounded/continuous.

The baseline snapshot is any DataFrame with the same shape (typically read
from the metrics manifest of a previous run — see manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram(df: DataFrame, column: str, bucket_width: float) -> DataFrame:
    """(bucket, n): bucket = floor(value / width). Nulls are dropped (drift
    over observed values; null-rate drift is covered by column_stats)."""
    bucket = F.floor(F.col(column) / F.lit(bucket_width)).cast("long")
    return (
        df.where(F.col(column).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def ks_drift(current_hist: DataFrame, baseline_hist: DataFrame) -> DataFrame:
    """Max |CDF_current(b) - CDF_baseline(b)| over the union of buckets.

    Returns a 1-row DataFrame ``(ks_stat: double)``. Runs entirely on
    #buckets rows — the window sort is over a tiny frame, not the data.

    Degenerate inputs (no judgement is better than a fabricated one): if a
    side has no observations, its CDF is undefined and ``ks_stat`` is NULL
    — never a division by zero. Single-bucket inputs are fine (identical →
    0.0, fully disjoint → 1.0).
    """
    cur = current_hist.select("bucket", F.col("n").alias("n_cur"))
    base = baseline_hist.select("bucket", F.col("n").alias("n_base"))
    joined = cur.join(base, on="bucket", how="full_outer").fillna(
        0, subset=["n_cur", "n_base"]
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    tot_cur = F.sum("n_cur").over(Window.partitionBy())
    tot_base = F.sum("n_base").over(Window.partitionBy())
    cdf = joined.select(
        F.when(tot_cur > 0, F.sum("n_cur").over(w) / tot_cur).alias("cdf_cur"),
        F.when(tot_base > 0, F.sum("n_base").over(w) / tot_base).alias("cdf_base"),
    )
    return cdf.agg(F.max(F.abs(F.col("cdf_cur") - F.col("cdf_base"))).alias("ks_stat"))


def quantile_drift(
    current: DataFrame,
    baseline: DataFrame,
    column: str,
    quantiles: list[float] | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """Sketch-based drift: per-grid-point |q_cur - q_base| / IQR_base.

    Returns ``(quantile, value_cur, value_base, gap)`` — the caller applies
    its threshold. ``percentile_approx`` aggregates with mergeable sketches,
    so both sides are one pass each regardless of size.
    """
    qs = quantiles or [0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99]
    qlit = F.array(*[F.lit(q) for q in qs])

    def _q(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.percentile_approx(F.col(column), qlit, F.lit(accuracy)).alias(name)
        )

    cur = _q(current, "vc")
    base = _q(baseline, "vb")
    both = cur.crossJoin(base).select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(q) for q in qs]).alias("quantile"),
                F.col("vc").alias("value_cur"),
                F.col("vb").alias("value_base"),
            )
        ).alias("z")
    ).select("z.quantile", "z.value_cur", "z.value_base")
    iqr = F.abs(
        F.max(F.when(F.col("quantile") == 0.75, F.col("value_base"))).over(Window.partitionBy())
        - F.max(F.when(F.col("quantile") == 0.25, F.col("value_base"))).over(Window.partitionBy())
    )
    return both.withColumn(
        "gap",
        F.abs(F.col("value_cur") - F.col("value_base"))
        / F.when(iqr > 0, iqr).otherwise(F.lit(1.0)),
    )
