"""Functional-dependency (FD) data-quality checks: does ``lhs → rhs``
hold, and if not, which rows break it?

The Deequ-style analyzer family (`hasUniqueness`, compliance) covers
single-column shapes; FD violations are the cross-column one: "every
order maps to exactly one customer", "every canonical URL maps to one
registrable domain". A violated FD is the classic silent-join-bug
symptom — an upstream dedup regression turns a 1:1 mapping into 1:n and
every downstream join starts fanning out.

Scale shape: the summary is a TWO-LEVEL aggregate — ``groupBy(lhs, rhs)``
count first (partial-aggregatable map-side, so a hot LHS key arrives at
the shuffle as one row per distinct rhs, not one row per input row),
then ``groupBy(lhs)`` over that — never ``countDistinct`` straight over
the raw table. Violation rows come from ONE left-semi join of the source
against the (tiny, violations-only) offending-LHS set; AQE splits a
skewed LHS. Emits the engine's standard violation-row shape
``(id, rule_id, observed_value)`` so FD findings flow into the same
violations sink as facet/uniqueness checks (engine.py semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fd_summary(df: DataFrame, lhs: list[str], rhs: str) -> DataFrame:
    """Per-LHS fan-out: ``(*lhs, n_rhs_values, n_rows)`` for every LHS
    group, ordered for report use. ``n_rhs_values > 1`` rows are the FD
    violations. NULL rhs counts as a value (an FD that "holds" only
    because rhs went NULL is broken); NULL-valued LHS keys group
    together like any other key (groupBy null-groups, matching SQL
    GROUP BY)."""
    pair = df.groupBy(*lhs, F.col(rhs).alias("_rhs")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    return pair.groupBy(*lhs).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rhs_values"),
        F.sum("_n").cast("bigint").alias("n_rows"),
    )


def fd_violating_keys(df: DataFrame, lhs: list[str], rhs: str) -> DataFrame:
    """LHS groups that map to more than one rhs value — the offending-key
    set (tiny relative to the table when the FD mostly holds)."""
    return fd_summary(df, lhs, rhs).where(F.col("n_rhs_values") > 1)


def fd_violation_rows(
    df: DataFrame,
    lhs: list[str],
    rhs: str,
    id_col: str,
    rule_id: str | None = None,
) -> DataFrame:
    """Violation rows ``(id, rule_id, observed_value, *lhs)`` — every row
    whose LHS group breaks the FD, with the row's own rhs as the observed
    value. One semi join against the offending-key set; the base table is
    scanned once for the summary and once here (the summary output is
    violations-only and small, so the join side broadcasts or
    AQE-splits)."""
    rid = rule_id or f"fd_{'_'.join(lhs)}_to_{rhs}"
    bad = fd_violating_keys(df, lhs, rhs).select(
        *[F.col(c).alias(f"_b_{c}") for c in lhs]
    )
    # null-SAFE key equality: fd_summary groups NULL LHS keys like any
    # other key, so a violating NULL group's rows must reach the sink
    # too (null-unsafe '=' would silently drop them — the
    # incremental.py:61 precedent)
    cond = None
    for c in lhs:
        eq = F.col(c).eqNullSafe(F.col(f"_b_{c}"))
        cond = eq if cond is None else (cond & eq)
    return (
        df.join(bad, on=cond, how="left_semi")
        .select(
            F.col(id_col),
            F.lit(rid).alias("rule_id"),
            F.col(rhs).cast("string").alias("observed_value"),
            *[F.col(c) for c in lhs],
        )
    )


def suggest_fds(df: DataFrame, columns: list[str], max_columns: int = 8) -> DataFrame:
    """FD mining over a candidate column set (the constraint-suggestion
    companion of checks/suggest.py): for every ordered pair (a, b),
    does a → b hold? Returns ``(lhs, rhs, n_lhs, n_pairs, holds)`` —
    ``holds`` iff the distinct (a, b) count equals the distinct a count
    (each LHS value maps to exactly one rhs). Discovered FDs become
    :func:`fd_violation_rows` monitors on future snapshots — mine once
    on a healthy snapshot, enforce forever.

    ONE aggregation job computes every distinct count (m single-column
    + m·(m−1) pair counts). Each countDistinct multiplies the Expand
    factor, so the candidate set is capped at `max_columns` (8 → 64
    counts) — FD mining is a schema-sized operation, not a
    wide-table sweep; run it on a column subset you suspect. NULLs: a
    NULL rhs counts as a value (the fd_summary convention) via a
    sentinel-free distinct over coalesced pairs — countDistinct drops
    all-NULL tuples, so both sides coalesce through one struct.
    """
    if len(columns) > max_columns:
        raise ValueError(
            f"suggest_fds: {len(columns)} candidate columns exceeds "
            f"max_columns={max_columns} — each adds an Expand multiple; "
            "pass a smaller suspect set"
        )
    # aliases by POSITION, not name concatenation: column names containing
    # underscores would otherwise collide ('a'+'b_c' vs 'a_b'+'c')
    aggs = [
        F.count_distinct(F.struct(F.col(a))).alias(f"_d_{i}")
        for i, a in enumerate(columns)
    ]
    idx = {c: i for i, c in enumerate(columns)}
    pairs = [(a, b) for a in columns for b in columns if a != b]
    for a, b in pairs:
        aggs.append(
            F.count_distinct(F.struct(F.col(a), F.col(b))).alias(
                f"_p_{idx[a]}_{idx[b]}"
            )
        )
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [
        (
            a,
            b,
            int(row[f"_d_{idx[a]}"]),
            int(row[f"_p_{idx[a]}_{idx[b]}"]),
            int(row[f"_p_{idx[a]}_{idx[b]}"]) == int(row[f"_d_{idx[a]}"]),
        )
        for a, b in pairs
    ]
    return spark.createDataFrame(
        out, "lhs string, rhs string, n_lhs bigint, n_pairs bigint, holds boolean"
    )


def fd_g3(
    df: DataFrame, lhs: list[str], rhs: str, name: str | None = None
) -> DataFrame:
    """Approximate-FD strength: the g3 error metric (Kivinen &
    Mannila's "Approximate inference of functional dependencies from
    relations") — the minimum FRACTION of rows to delete so that
    ``lhs → rhs`` holds exactly. g3 = 1 - Σ_per-lhs max(rhs count) / N.

    The summary form (`fd_summary`) answers "which keys violate"; g3
    answers "how badly does the dependency hold overall" — the number a
    profiler trends across snapshots ("url → domain used to be 0.0001,
    today it's 0.02": an upstream canonicalization regression).

    Scale shape: the SAME two-level aggregate as fd_summary (pair counts
    are map-side partial-aggregated, a hot LHS arrives at the shuffle
    one row per distinct rhs), finished by a single global sum over
    per-LHS maxima. NULL rhs counts as a value; NULL LHS keys group
    normally.

    Returns ONE row: ``(fd, n_rows, n_keep, g3)`` — ``n_keep`` is the
    kept-row count of the repair, ``g3`` rounded 6dp.
    """
    fd_name = name or f"{'_'.join(lhs)}->{rhs}"
    pair = df.groupBy(*lhs, F.col(rhs).alias("_rhs")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    per = pair.groupBy(*lhs).agg(
        F.max("_n").alias("_keep"), F.sum("_n").alias("_rows")
    )
    return per.agg(
        F.sum("_rows").cast("bigint").alias("n_rows"),
        F.sum("_keep").cast("bigint").alias("n_keep"),
    ).select(
        F.lit(fd_name).alias("fd"),
        "n_rows",
        "n_keep",
        F.round(F.lit(1.0) - F.col("n_keep") / F.col("n_rows"), 6).alias("g3"),
    )


def inclusion_check(
    df_a: DataFrame, col_a: str, df_b: DataFrame, col_b: str
) -> DataFrame:
    """Inclusion-dependency check A[col_a] ⊆ B[col_b] — the VALUE-SET
    question referential_violations' row-level FK check doesn't answer
    and the discovery input FK *suggestion* needs (Deequ
    ``isContainedIn`` / Binder, De Marchi et al.): of the DISTINCT
    values of A, how many exist in B at all?

    ONE row ``(n_distinct_a, n_distinct_b, n_missing, containment_micro,
    contained)``: containment_micro = (dₐ−missing)·10⁶ div dₐ (integer
    floor division — bit-identical cross-engine), contained ⇔ missing=0.

    Scale shape: both sides reduce to their distinct-value tables first
    (partial-aggregatable groupBys — the shuffle carries values once,
    not rows), then ONE left-anti join between the distinct tables
    (AQE broadcasts the smaller) and a count. NULLs are excluded on
    both sides (SQL semantics: NULL ∈ anything is unknown, and a NULL
    FK is the referential check's business, not containment's).

    Reference scope note: eliassona/xmlschemavalidator has no dataset
    layer (core.clj:263-285); north-rule check beside fd_summary and
    checks/referential.py.
    """
    da = (
        df_a.where(F.col(col_a).isNotNull())
        .select(F.col(col_a).cast("string").alias("_v"))
        .groupBy("_v")
        .agg(F.lit(1).alias("_one"))
    )
    db = (
        df_b.where(F.col(col_b).isNotNull())
        .select(F.col(col_b).cast("string").alias("_v"))
        .groupBy("_v")
        .agg(F.lit(1).alias("_one"))
    )
    counts = da.agg(F.count(F.lit(1)).cast("bigint").alias("n_distinct_a")).crossJoin(
        F.broadcast(db.agg(F.count(F.lit(1)).cast("bigint").alias("n_distinct_b")))
    )
    missing = (
        da.join(db, "_v", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_missing"))
    )
    j = counts.crossJoin(F.broadcast(missing))
    return j.select(
        "n_distinct_a",
        "n_distinct_b",
        "n_missing",
        F.expr(
            "CASE WHEN n_distinct_a > 0 THEN "
            "((n_distinct_a - n_missing) * 1000000) div n_distinct_a END"
        ).alias("containment_micro"),
        ((F.col("n_missing") == 0) & (F.col("n_distinct_a") > 0)).alias("contained"),
    )


def inclusion_discovery(df: DataFrame, columns: list[str]) -> DataFrame:
    """All-ordered-pairs inclusion discovery over one table's candidate
    columns — the fd.py suggest_fds device applied to INDs: ONE long
    distinct table ``(column, value)`` self-joins on value, so every
    pair's intersection size comes from one job bounded by Σ distincts,
    never #columns² table scans. Returns per ordered pair (a ≠ b):
    ``(col_a, col_b, n_a, n_shared, containment_micro, contained)``
    where contained ⇔ every distinct a-value appears under b. Values
    compare as strings (the one cast both engines agree on); NULLs
    excluded."""
    if len(columns) < 2:
        raise ValueError("inclusion_discovery: need ≥2 candidate columns")
    long_parts = [
        df.where(F.col(c).isNotNull()).select(
            F.lit(c).alias("_col"), F.col(c).cast("string").alias("_v")
        )
        for c in columns
    ]
    long_df = long_parts[0]
    for p in long_parts[1:]:
        long_df = long_df.unionByName(p)
    dist = long_df.groupBy("_col", "_v").agg(F.lit(1).alias("_one"))
    per_col = dist.groupBy("_col").agg(F.count(F.lit(1)).cast("bigint").alias("_d"))
    a = dist.select(F.col("_col").alias("col_a"), "_v")
    b = dist.select(F.col("_col").alias("col_b"), "_v")
    shared = (
        a.join(b, "_v")
        .where(F.col("col_a") != F.col("col_b"))
        .groupBy("col_a", "col_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    pairs = (
        per_col.select(F.col("_col").alias("col_a"), F.col("_d").alias("n_a"))
        .crossJoin(F.broadcast(per_col.select(F.col("_col").alias("col_b"))))
        .where(F.col("col_a") != F.col("col_b"))
    )
    j = pairs.join(shared, ["col_a", "col_b"], "left").select(
        "col_a",
        "col_b",
        "n_a",
        F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
    )
    return j.select(
        "col_a",
        "col_b",
        "n_a",
        "n_shared",
        F.expr(
            "CASE WHEN n_a > 0 THEN (n_shared * 1000000) div n_a END"
        ).alias("containment_micro"),
        ((F.col("n_shared") == F.col("n_a")) & (F.col("n_a") > 0)).alias("contained"),
    )


def fd_condition_scan(
    df: DataFrame, cond_col: str, lhs: list[str], rhs: str
) -> DataFrame:
    """Conditional-FD scope discovery (the discovery-lite half of
    Bohannon et al. ICDE'07: given an FD that fails globally, WHICH
    values of a condition column carve out a scope where it holds?) →
    ``(cond, n_lhs_groups, n_violating_groups, n_rows, holds)`` per
    condition value. A mixed verdict is the CFD finding itself: "the
    mapping is 1:1 except for rows where status = 'F'" — the repair
    scope a global FD check cannot express.

    Scale shape: the :func:`fd_summary` discipline with the condition
    folded into the FIRST groupBy — two stacked partial-aggregatable
    aggregates, ``groupBy(cond, lhs, rhs)`` then ``groupBy(cond,
    lhs)`` then ``groupBy(cond)``; a hot (cond, lhs) key arrives at
    the shuffle as one row per distinct rhs. Output is bounded by
    distinct condition values. NULL rhs counts as a value, NULL cond
    groups like any other key (the fd_summary conventions)."""
    pair = df.groupBy(
        F.col(cond_col).alias("cond"), *lhs, F.col(rhs).alias("_rhs")
    ).agg(F.count(F.lit(1)).alias("_n"))
    per_key = pair.groupBy("cond", *lhs).agg(
        F.count(F.lit(1)).alias("_nv"), F.sum("_n").alias("_rows")
    )
    return per_key.groupBy("cond").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lhs_groups"),
        F.sum((F.col("_nv") > 1).cast("long")).cast("bigint").alias(
            "n_violating_groups"
        ),
        F.sum("_rows").cast("bigint").alias("n_rows"),
        F.max(F.col("_nv")).cast("bigint").alias("max_rhs_values"),
    ).withColumn("holds", F.col("n_violating_groups") == 0)


def cfd_violation_rows(
    df: DataFrame,
    cond_col: str,
    cond_value,
    lhs: list[str],
    rhs: str,
    id_col: str,
    rule_id: str | None = None,
) -> DataFrame:
    """Enforcement half of the CFD: violation rows ``(id, rule_id,
    observed_value)`` for the variable CFD ``(cond = v) ∧ lhs → rhs``
    — the FD checked ONLY inside the condition scope (rows outside the
    scope can never violate). The pattern-constant filter runs BEFORE
    the aggregate, so it reaches the scan as a pushed predicate and
    the shuffle carries only the scoped slice."""
    rid = rule_id or f"cfd_{cond_col}_{'_'.join(lhs)}__{rhs}"
    scoped = df.where(F.col(cond_col) == F.lit(cond_value))
    return fd_violation_rows(scoped, lhs, rhs, id_col, rule_id=rid)
