"""Uniqueness / duplicate-key detection with skew-safe two-phase aggregation.

North-star op: "uniqueness via salted repartition-and-sort on url hash".
At 10^12 rows a plain ``groupBy(url).count()`` is correct (Spark already
map-side-combines), but a pathologically hot key (one url duplicated across
millions of rows) still concentrates its final count on one reducer. The
two-phase form makes the skew-safety explicit and cheap:

phase 1: groupBy(key, salt) partial counts  — salt splits a hot key across
         reducers; salt = spark_partition_id() is deterministic and free
         (no rand(), no extra column shuffle entropy);
phase 2: groupBy(key) sum of partials       — each key now contributes at
         most #input-partitions rows to the final shuffle, independent of
         its row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key_cols: list[str], salted: bool = True) -> DataFrame:
    """Keys appearing more than once: ``(*key_cols, dup_count)``."""
    if salted:
        partial = (
            df.groupBy(*key_cols, F.spark_partition_id().alias("_salt"))
            .agg(F.count(F.lit(1)).alias("_partial"))
        )
        counts = partial.groupBy(*key_cols).agg(F.sum("_partial").alias("dup_count"))
    else:
        counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("dup_count"))
    return counts.filter(F.col("dup_count") > 1)


def uniqueness_violations(df: DataFrame, key_cols: list[str], rule_id: str = "unique",
                          salted: bool = True) -> DataFrame:
    """Violation-row rendering of duplicate keys: ``(<key>, rule_id,
    observed_value)`` where observed_value is the duplicate count. The key
    column is NAMED like the engine's violations key (the single key
    column's own name, or ``<a|b|...>`` for composites) so the two frames
    actually unionByName cleanly — the engine aliases its key back to the
    original column name, never the literal 'key'."""
    dups = duplicate_keys(df, key_cols, salted=salted)
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    key_name = key_cols[0] if len(key_cols) == 1 else "|".join(key_cols)
    return dups.select(
        key.alias(key_name),
        F.lit(rule_id).alias("rule_id"),
        F.col("dup_count").cast("string").alias("observed_value"),
    )
