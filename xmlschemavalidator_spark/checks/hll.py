"""Mergeable HyperLogLog distinct-count sketches across partitions AND runs.

North star: "distinct-count via HyperLogLog sketches with treeAggregate of
mergeable sketch accumulators". Spark ≥3.5 ships Apache DataSketches HLL
natively (``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``),
so the whole pipeline stays JVM-side:

* within a run — ``hll_sketch_agg`` is a partial+final aggregate (the
  map-side partial sketches ARE the tree-aggregate accumulators);
* across runs/snapshots — the per-snapshot sketch BINARIES are persisted
  (manifest/baseline) and combined later with ``hll_union_agg``: distinct
  counts over a year of snapshots cost one union over kilobyte blobs, not
  a rescan of 10^12 rows;
* distinct-count drift — estimate(current) vs estimate(union(baseline)),
  no raw data retained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 12  # 2^12 registers ≈ 1.6% relative standard error


def column_sketches(df: DataFrame, columns: list[str], lgk: int = DEFAULT_LGK) -> DataFrame:
    """One pass → one row per column: ``(column, sketch: binary, estimate)``."""
    aggs = []
    for c in columns:
        aggs.append(F.hll_sketch_agg(F.col(c).cast("string"), lgk).alias(f"{c}__sk"))
    wide = df.agg(*aggs)
    return wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"{c}__sk").alias("sketch"),
                        F.hll_sketch_estimate(F.col(f"{c}__sk")).alias("estimate"),
                    )
                    for c in columns
                ]
            )
        ).alias("s")
    ).select("s.*")


def union_sketches(*sketch_frames: DataFrame) -> DataFrame:
    """Combine per-snapshot sketch tables: ``(column, sketch, estimate)``
    with sketches unioned per column — the cross-run merge path."""
    all_rows = sketch_frames[0]
    for f in sketch_frames[1:]:
        all_rows = all_rows.unionByName(f)
    return (
        all_rows.groupBy("column")
        .agg(F.hll_union_agg("sketch").alias("sketch"))
        .withColumn("estimate", F.hll_sketch_estimate(F.col("sketch")))
    )


def save_sketches(sketches: DataFrame, path: str) -> None:
    """Persist sketch blobs (parquet) — the baseline-snapshot artifact."""
    sketches.write.mode("overwrite").parquet(path)


def distinct_drift(current: DataFrame, baseline_path: str) -> DataFrame:
    """(column, estimate_cur, estimate_base, ratio): distinct-count drift of
    the current sketches vs a persisted baseline. ratio = cur/base."""
    base = current.sparkSession.read.parquet(baseline_path).select(
        "column", F.col("estimate").alias("estimate_base")
    )
    return (
        current.select("column", F.col("estimate").alias("estimate_cur"))
        .join(base, on="column", how="full_outer")
        .withColumn(
            "ratio",
            F.when(
                F.col("estimate_base") > 0, F.col("estimate_cur") / F.col("estimate_base")
            ),
        )
    )
