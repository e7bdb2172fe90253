"""Skew-handling helpers: salted wide operations for hot keys.

North rule: "skew handled by adaptive salting of hot lang/domain
partitions". Two layers:

1. AQE (enabled in session.py): runtime skew-join splitting and partition
   coalescing — free, always on.
2. Explicit salting below, for aggregations/joins whose hot keys are known
   or measured (a 60% 'en' lang key, boilerplate domains): a deterministic
   salt splits each hot key into K subkeys before the wide op, then a
   second cheap aggregation folds the subkeys back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: output_name → (input_expr, fn) with fn ∈ {sum, count, min, max}
    (the partial-aggregable fns where phase-2 re-aggregation is exact).

    Phase 1 groups by (keys..., salt) where salt = spark_partition_id() —
    deterministic, no extra entropy column, and already co-located so the
    partial agg is map-side only. Phase 2 groups by keys and folds partials:
    sum→sum, count→sum, min→min, max→max. A key with a billion rows
    contributes ≤ #partitions rows to the phase-2 shuffle.
    """
    fold = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    # salt = partition id folded into salt_buckets: co-located (rows of one
    # input partition share one salt, so phase 1 is map-side only) while the
    # knob bounds the phase-2 fan-in per key
    salt = F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
    phase1 = df.groupBy(*keys, salt.alias("_salt")).agg(
        *[
            getattr(F, fn)(F.expr(expr)).alias(name)
            for name, (expr, fn) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            getattr(F, fold[fn])(F.col(name)).alias(name)
            for name, (expr, fn) in aggs.items()
        ]
    )


def salt_hot_keys(
    df: DataFrame, key: str, hot_keys: list[str], salt_buckets: int = 16
) -> DataFrame:
    """Add a ``_salted_key`` column: hot keys get a deterministic per-row
    salt suffix (derived from a row hash, not rand() — reproducible), cold
    keys pass through. Join the other side against an exploded hot-key dim
    (each hot key replicated salt_buckets times) to keep equality."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    # STRUCT key, not string concat: a '<key>#<salt>' encoding collides when
    # a cold key's value itself contains '#' (URLs with fragments do)
    return df.withColumn(
        "_salted_key",
        F.struct(
            F.col(key).cast("string").alias("k"),
            F.when(F.col(key).isin(hot_keys), salt.cast("int"))
            .otherwise(F.lit(-1))
            .alias("s"),
        ),
    )


def explode_hot_dim(
    dim: DataFrame, key: str, hot_keys: list[str], salt_buckets: int = 16
) -> DataFrame:
    """The dim-side counterpart of :func:`salt_hot_keys`: replicate hot-key
    rows once per salt bucket so the salted equi-join still matches."""
    salts = F.when(
        F.col(key).isin(hot_keys),
        F.array(*[F.lit(i) for i in range(salt_buckets)]),
    ).otherwise(F.array(F.lit(-1)))
    exploded = dim.withColumn("_s", F.explode(salts))
    return exploded.withColumn(
        "_salted_key",
        F.struct(
            F.col(key).cast("string").alias("k"), F.col("_s").cast("int").alias("s")
        ),
    ).drop("_s")
