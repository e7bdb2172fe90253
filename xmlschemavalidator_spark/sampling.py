"""Corpus sampling and mixing — the "data recipe" layer of a training
pipeline: reproducible subsampling, per-stratum mixing proportions, and
token-budget selection.

Everything here is CONTENT-ADDRESSED rather than rand()-based: membership
is a pure function of the row id, so a sample is stable across runs,
retries, engines, and cluster sizes — the property a resumable 10^12-row
pipeline needs (a rand() sample re-drawn after a failed stage silently
changes the corpus). It also makes every operator oracle-checkable in any
SQL engine with md5.

The md5-threshold trick: md5 hex digests are uniformly distributed and
both Spark and DuckDB render them as lowercase hex, so comparing the
digest STRING against a precomputed hex threshold is an exact, engine-
portable "keep with probability p" test — no hex parsing, no overflow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MD5_SPACE = 16 ** 32


def md5_threshold(fraction: float) -> str:
    """The 32-hex-digit threshold t such that P[md5 < t] = fraction."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * _MD5_SPACE), _MD5_SPACE - 1), "032x")


def _sample_key(id_col: Column, salt: str) -> Column:
    return F.md5(F.concat(F.lit(salt), F.lit(":"), id_col.cast("string")))


def sample_key_sql(id_sql: str, salt: str) -> str:
    """DuckDB expression for the same sampling key (oracle side)."""
    return f"md5('{salt}' || ':' || CAST({id_sql} AS VARCHAR))"


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership decided by
    md5(salt:id) < threshold — reproducible, engine-portable, and a pure
    narrow filter (pushes into the scan, no shuffle, no RNG state).
    Different ``salt`` values give independent samples; nested samples
    (holdouts within samples) compose by AND-ing predicates."""
    key = _sample_key(F.col(id_col), salt)
    return df.where(key < F.lit(md5_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    (e.g. keep 100% of en, 30% of de, 5% of everything else). Strata not
    in ``fractions`` get ``default_fraction``. Still a pure narrow filter:
    the threshold is a when-chain on the stratum column."""
    key = _sample_key(F.col(id_col), salt)
    expr = F.lit(md5_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        expr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(md5_threshold(frac))
        ).otherwise(expr)
    return df.where(key < expr)


def token_budget_select(
    df: DataFrame,
    id_col: str,
    group_col: str,
    cost_col: str,
    budget: int,
    order_col: str | None = None,
    ascending: bool = False,
) -> DataFrame:
    """Select the best rows per group until the group's budget is spent —
    the "N tokens per language/domain" recipe step. Rows are taken in
    ``order_col`` order (default: ``cost_col``; ``ascending=False`` takes
    highest first), ties broken by ``id_col`` for full determinism; a row
    is kept while the budget is not yet exhausted BEFORE it (the row that
    crosses the line is included — the standard first-to-exceed policy, so
    a group never stops short of its budget while candidates remain).

    One window per group (shuffle on ``group_col`` + in-group sort). At
    10^12 rows the sort is the cost — group cardinality is bounded
    (langs/domains) but per-group data is not; pre-filter with
    :func:`stratified_sample` or a quality floor first, which is also the
    published pipeline order (filter, then budget)."""
    order = F.col(order_col if order_col is not None else cost_col)
    order = order.asc() if ascending else order.desc()
    w = (
        Window.partitionBy(group_col)
        .orderBy(order, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    spent_through = F.sum(F.col(cost_col)).over(w)
    spent_before = spent_through - F.col(cost_col)
    return df.withColumn("_spent_before", spent_before).where(
        F.col("_spent_before") < F.lit(budget)
    ).drop("_spent_before")


def deterministic_shuffle(
    df: DataFrame, id_col: str, n_shards: int = 1024, salt: str = "shuffle"
) -> DataFrame:
    """Reproducible global shuffle for training output: adds ``shard``
    (which output shard the row lands in) and ``pos`` (its position within
    the shard). Training runs read shards in order, so this IS the data
    order the model sees — it must be a pure function of (salt, id), not
    of partitioning, cluster size, or retry history.

    shard = first 8 hex digits of md5(salt:id) mod ``n_shards`` (narrow,
    no shuffle to decide placement); pos = row_number within the shard
    ordered by (md5 key, id) — one shuffle on ``shard``, one in-shard
    sort. ``n_shards`` bounds the per-task sort: size it so a shard's rows
    fit an executor (10^12 rows / 2^17 shards ≈ 7.6M rows/shard). The
    md5-key order within a shard is itself the shuffled order — no extra
    randomness needed."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = _sample_key(F.col(id_col), salt)
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % F.lit(n_shards)
    ).cast("int")
    out = df.withColumn("_skey", key).withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(F.col("_skey"), F.col(id_col))
    return out.withColumn("pos", F.row_number().over(w)).drop("_skey")
