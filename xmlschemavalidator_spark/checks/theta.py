"""Fixed-threshold theta sketch: a deterministic, MERGEABLE,
oracle-exact approximate distinct count.

The repo already has two distinct-count paths: exact ``count_distinct``
(full-column shuffle — wrong at 100 TB for unbounded-cardinality
columns) and HyperLogLog++ (checks/hll.py — constant memory, but the
register packing is engine-specific, so its driver query is rows-only).
This closes the gap between them with the oldest trick in the sketch
literature (Bar-Yossef et al. RANDOM'02; the fixed-theta mode of the
DataSketches theta sketch): hash every value with the repo's portable
60-bit md5 key, KEEP only hashes below ``2^(60-p)`` — a NARROW filter
that sheds ~(1 - 2^-p) of the data before anything shuffles — and count
the distinct survivors exactly. Since sampling by hash value samples
the DISTINCT SET uniformly, ``n_survivors << p`` estimates the distinct
count with relative error ~1/sqrt(D·2^-p).

Why it earns its place next to HLL: the survivor-hash SET is the sketch
— unioning per-batch survivor sets and re-counting gives EXACTLY the
whole-corpus sketch (same hashes survive the same threshold), so
partial sketches merge losslessly like the rollup/CDC partials; and
because the hash is the portable md5 recipe (sampling.py:_sample_key),
DuckDB replays the estimate bit-for-bit — an approximate-cardinality
path the driver can hash-check, which HLL by construction cannot be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_BITS = 60  # 15 hex digits of md5 — exact in a BIGINT (gumbel_key's space)


def _theta_key(col: F.Column, salt: str) -> F.Column:
    """Portable 60-bit hash of the value: first 15 hex digits of
    md5(salt:value) as a BIGINT — the same content-addressed recipe as
    sampling._sample_key / quality_model.gumbel_key, so every engine
    (and every cluster size) sees the identical hash."""
    key = F.md5(F.concat(F.lit(salt), F.lit(":"), col.cast("string")))
    return F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint")


def theta_key_sql(value_sql: str, salt: str) -> str:
    """DuckDB expression for the same 60-bit key (oracle side)."""
    return (
        f"CAST('0x' || substr(md5('{salt}' || ':' || CAST({value_sql} AS VARCHAR)), "
        "1, 15) AS BIGINT)"
    )


def theta_sketch_rows(
    df: DataFrame, column: str, p: int = 4, salt: str = "theta"
) -> DataFrame:
    """The sketch itself: the distinct survivor hashes ``(h)`` of the
    column's non-NULL values under threshold ``2^(60-p)``. This is the
    mergeable object — union several batches' rows and feed the union to
    :func:`theta_estimate` for the exact whole-corpus sketch.

    Scale shape: one narrow filter drops ~(1 - 2^-p) of the rows at the
    scan, then ONE partial-aggregatable distinct over the survivors —
    the shuffle carries ~D·2^-p hashes, tunable by ``p``, never the
    column. NULLs are excluded (count-distinct convention).
    """
    if not 0 <= p < _HASH_BITS:
        raise ValueError(f"theta_sketch_rows: p must be in [0, {_HASH_BITS}), got {p}")
    h = _theta_key(F.col(column), salt)
    threshold = 1 << (_HASH_BITS - p)
    return (
        df.where(F.col(column).isNotNull())
        .select(h.alias("h"))
        .where(F.col("h") < F.lit(threshold))
        .distinct()
    )


def theta_estimate(sketch: DataFrame, p: int) -> DataFrame:
    """Estimate from a (possibly unioned) sketch: one row
    ``(n_survivors, estimate)`` with ``estimate = n_survivors · 2^p`` —
    pure integer arithmetic, so the whole path is hash-exact in any
    engine. A union of per-batch sketches double-counts nothing (the
    distinct is re-applied here)."""
    agg = sketch.select("h").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_survivors")
    )
    return agg.select(
        "n_survivors",
        (F.col("n_survivors") * F.lit(1 << p)).cast("bigint").alias("estimate"),
    )


def theta_distinct(
    df: DataFrame, column: str, p: int = 4, salt: str = "theta"
) -> DataFrame:
    """One-shot convenience: sketch + estimate in a single plan."""
    return theta_estimate(theta_sketch_rows(df, column, p, salt), p)


def theta_distinct_by_group(
    df: DataFrame, column: str, group_col: str, p: int = 4, salt: str = "theta"
) -> DataFrame:
    """Per-group sketched distinct count ``(group, n_survivors,
    estimate)`` — the per-domain / per-source cardinality panel. Same
    narrow pre-shuffle filter; the distinct runs on (group, h)."""
    if not 0 <= p < _HASH_BITS:
        raise ValueError(f"p must be in [0, {_HASH_BITS}), got {p}")
    h = _theta_key(F.col(column), salt)
    threshold = 1 << (_HASH_BITS - p)
    surv = (
        df.where(F.col(column).isNotNull())
        .select(F.col(group_col).alias("group"), h.alias("h"))
        .where(F.col("h") < F.lit(threshold))
        .distinct()
    )
    return (
        surv.groupBy("group")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_survivors"))
        .select(
            "group",
            "n_survivors",
            (F.col("n_survivors") * F.lit(1 << p)).cast("bigint").alias("estimate"),
        )
    )
