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


def theta_set_ops(sketch_a: DataFrame, sketch_b: DataFrame, p: int) -> DataFrame:
    """Set operations between two theta sketches built with the SAME
    salt and p (the actual point of the theta family — HLL unions but
    never intersects without inclusion–exclusion error stacking): one
    row ``(n_a, n_b, n_union, n_intersect, est_a, est_b, est_union,
    est_intersect, est_only_a, est_only_b, jaccard_micro)``.

    Because both sketches keep exactly the values hashing below the
    same threshold, the survivor sets ARE uniform samples of the two
    distinct sets drawn with the SAME coin flips — so intersection/
    difference of the sketches is a sketch of the intersection/
    difference, and every estimate is ``count · 2^p``. The Jaccard
    estimate needs no scaling at all: |S_A∩S_B| / |S_A∪S_B| is the
    direct KMV/theta similarity estimator (Beyer et al. SIGMOD'07) —
    emitted as integer micros (exact div), hash-checkable.

    The cross-crawl read: est_only_b = genuinely NEW distinct values in
    snapshot B (frontier growth); jaccard ≈ 1 = a refetch.

    Scale shape: both inputs are already ~D·2^-p rows; one union + one
    groupBy(h) membership fold + a 1-row aggregate. Mismatched salts or
    thresholds are the caller's contract (hashes wouldn't align);
    estimates on an empty union yield 0s with NULL jaccard, never div/0.
    """
    if not 0 <= p < _HASH_BITS:
        raise ValueError(f"theta_set_ops: p must be in [0, {_HASH_BITS}), got {p}")
    m = sketch_a.select(
        "h", F.lit(1).alias("_a"), F.lit(0).alias("_b")
    ).unionByName(sketch_b.select("h", F.lit(0).alias("_a"), F.lit(1).alias("_b")))
    per = m.groupBy("h").agg(
        F.max("_a").alias("_ina"), F.max("_b").alias("_inb")
    )
    agg = per.agg(
        F.coalesce(F.sum("_ina"), F.lit(0)).cast("bigint").alias("n_a"),
        F.coalesce(F.sum("_inb"), F.lit(0)).cast("bigint").alias("n_b"),
        F.count(F.lit(1)).cast("bigint").alias("n_union"),
        F.coalesce(F.sum(F.col("_ina") * F.col("_inb")), F.lit(0))
        .cast("bigint")
        .alias("n_intersect"),
    )
    scale = F.lit(1 << p)
    return agg.select(
        "n_a",
        "n_b",
        "n_union",
        "n_intersect",
        (F.col("n_a") * scale).cast("bigint").alias("est_a"),
        (F.col("n_b") * scale).cast("bigint").alias("est_b"),
        (F.col("n_union") * scale).cast("bigint").alias("est_union"),
        (F.col("n_intersect") * scale).cast("bigint").alias("est_intersect"),
        ((F.col("n_a") - F.col("n_intersect")) * scale)
        .cast("bigint")
        .alias("est_only_a"),
        ((F.col("n_b") - F.col("n_intersect")) * scale)
        .cast("bigint")
        .alias("est_only_b"),
        F.expr(
            "CASE WHEN n_union > 0 THEN"
            " n_intersect * 1000000 div n_union END"
        ).alias("jaccard_micro"),
    )
