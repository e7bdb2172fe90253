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


def assign_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
    split_col: str = "split",
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic train/val/test (or any n-way) corpus split: every
    row gets a ``split_col`` label, membership decided by where
    md5(salt:id) falls among the cumulative weight thresholds — the same
    engine-portable key as :func:`deterministic_sample`, so splits are
    reproducible, disjoint by construction, exhaustive (the last label
    absorbs the md5-space remainder), and stable under corpus growth (a
    doc's label never changes when other docs are added). Pure narrow
    projection; weights must sum to 1 (±1e-9).

    Label order follows ``weights`` insertion order — (train, val, test)
    with (0.98, 0.01, 0.01) gives train the low md5 range.

    ``group_col`` makes the split GROUP-AWARE: the key hashes the group
    value instead of the row id, so every member of a group (all pages
    of a domain, all chunks of a document) lands in the SAME split —
    the standard leakage guard (near-duplicate pages of one site split
    across train and test silently inflate eval scores). Still one
    narrow projection — no group table, no join; weights then apportion
    GROUPS, so realized row fractions track group-size skew (check with
    :func:`split_leakage_audit`). Rows with a NULL group all land in
    the last label (NULL key compares NULL through every threshold —
    identical in both engines)."""
    if not weights:
        raise ValueError("weights must name at least one split")
    negative = {k: w for k, w in weights.items() if w < 0}
    if negative:
        # a negative weight passes the sum check while silently emptying
        # its split and inflating a later one (review finding)
        raise ValueError(f"split weights must be >= 0, got {negative}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    key = _sample_key(F.col(group_col if group_col else id_col), salt)
    labels = list(weights)
    expr = F.lit(labels[-1])  # last label absorbs the remainder
    cum = 0.0
    bounds = []
    for lab in labels[:-1]:
        # clamp: a tolerated +5e-10 overshoot must not reach
        # md5_threshold's hard [0,1] check (review finding)
        cum = min(cum + weights[lab], 1.0)
        bounds.append((lab, md5_threshold(cum)))
    for lab, bound in reversed(bounds):
        expr = F.when(key < F.lit(bound), F.lit(lab)).otherwise(expr)
    return df.withColumn(split_col, expr)


def split_leakage_audit(
    df: DataFrame, group_col: str, split_col: str = "split"
) -> DataFrame:
    """The check a group-aware split exists to pass: one row
    ``(n_groups, n_leaky_groups, max_splits_per_group)`` where a group
    is LEAKY when its rows span more than one split. 0 leaky groups by
    construction for :func:`assign_split` keyed on ``group_col``; a
    measured >0 for an id-keyed split of grouped data — run it on every
    eval split, not just the ones expected to pass (an upstream rename
    of the group column is exactly the bug this catches). NULL groups
    count as one group, like the split treats them.

    Scale: one partial-aggregatable (group, split)-distinct collapse,
    then a #groups-row aggregate — the corpus is scanned once.
    """
    per_group = df.groupBy(group_col).agg(
        F.count_distinct(F.col(split_col)).alias("_ns")
    )
    return per_group.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum((F.col("_ns") > 1).cast("long")).cast("bigint").alias("n_leaky_groups"),
        F.max("_ns").cast("bigint").alias("max_splits_per_group"),
    )


def assign_split_sql(
    id_sql: str, weights: dict[str, float], salt: str = "split"
) -> str:
    """DuckDB rendering of :func:`assign_split`'s label expression."""
    key = sample_key_sql(id_sql, salt)
    labels = list(weights)
    cases = []
    cum = 0.0
    for lab in labels[:-1]:
        cum = min(cum + weights[lab], 1.0)
        cases.append(f"WHEN {key} < '{md5_threshold(cum)}' THEN '{lab}'")
    return "CASE " + " ".join(cases) + f" ELSE '{labels[-1]}' END"


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


# ---------------------------------------------------------------------------
# UniMax budget allocation (Chung et al., ICLR 2023): given per-group
# corpus sizes, a total training budget, and a max-epochs cap, distribute
# the budget uniformly over groups, capping any group whose full
# max_epochs·size fits below the uniform share — the published
# alternative to temperature sampling that needs NO transcendental math,
# so allocation and application are integer-exact and oracle-checkable.
# ---------------------------------------------------------------------------

def unimax_allocation_py(
    sizes: dict[str, int], total_budget: int, max_epochs: int
) -> dict[str, int]:
    """Pure-integer waterfilling, the single source of truth (the Spark
    op replays it driver-side over the collected per-group sums; tests
    and the DuckDB oracle replay the same arithmetic).

    Process groups by cap = size·max_epochs ascending (name-tiebroken):
    a group whose cap·(groups left) fits the remaining budget is capped
    (gets its full cap); the first group that doesn't fit — and therefore
    every later one, since caps only grow — shares the remainder equally,
    with the division remainder going to the alphabetically-first
    uncapped groups (one surplus unit each, fully deterministic). The
    capped-prefix test is monotone (cap_j ≥ cap_i keeps the inequality
    false once it fails), which is what lets the oracle evaluate it with
    window prefix sums instead of sequentially."""
    if total_budget < 0 or max_epochs < 1:
        raise ValueError("total_budget must be >= 0 and max_epochs >= 1")
    items = sorted(sizes.items(), key=lambda kv: (kv[1] * max_epochs, kv[0]))
    alloc: dict[str, int] = {}
    remaining = total_budget
    left = len(items)
    uncapped: list[str] = []
    for g, n in items:
        cap = n * max_epochs
        if not uncapped and cap * left <= remaining:
            alloc[g] = cap
            remaining -= cap
            left -= 1
        else:
            uncapped.append(g)
    if uncapped:
        share, extra = divmod(remaining, len(uncapped))
        for j, g in enumerate(sorted(uncapped)):
            alloc[g] = share + (1 if j < extra else 0)
    return alloc


def unimax_allocation(
    df: DataFrame,
    group_col: str,
    cost_col: str,
    total_budget: int,
    max_epochs: int,
) -> DataFrame:
    """Per-group UniMax budget table: ``(group, corpus_cost, alloc_cost,
    capped)``. One partial-aggregated sum per group, then a bounded
    driver-side waterfill — group cardinality is languages/domains (the
    same bound the stratified mix already assumes), never corpus-sized."""
    spark = df.sparkSession
    sizes = {
        r[0]: int(r[1])
        for r in df.groupBy(group_col)
        .agg(F.sum(F.col(cost_col)).cast("long"))
        .collect()
    }
    alloc = unimax_allocation_py(sizes, total_budget, max_epochs)
    rows = [
        (g, sizes[g], alloc[g], alloc[g] == sizes[g] * max_epochs)
        for g in sorted(sizes)
    ]
    return spark.createDataFrame(
        rows, f"{group_col} string, corpus_cost long, alloc_cost long, capped boolean"
    )


def unimax_apply(
    df: DataFrame,
    id_col: str,
    group_col: str,
    cost_col: str,
    total_budget: int,
    max_epochs: int,
    salt: str = "unimax",
) -> DataFrame:
    """Materialize the UniMax allocation as training rows: every kept row
    carries an ``epoch`` column (1-based). A group allocated
    ``alloc = e·size + r`` emits ``e`` full copies of every document
    (epochs 1..e) plus a partial epoch ``e+1`` holding documents in
    md5(salt:id) order until ``r`` cost is spent (first-to-exceed, the
    :func:`token_budget_select` policy — deterministic, engine-portable,
    no RNG state).

    Scale shape: the allocation table is broadcast (≤ #groups rows); full
    epochs are an explode over a bounded ``sequence`` (guarded — Spark's
    ``sequence(a,b)`` counts DOWN when b<a); the partial epoch costs one
    window per group ordered by the md5 key. Epoch replication multiplies
    output volume by design — callers write shards, not collect."""
    sizes_df = unimax_allocation(
        df, group_col, cost_col, total_budget, max_epochs
    ).withColumnRenamed("corpus_cost", "_n").withColumnRenamed(
        "alloc_cost", "_alloc"
    ).drop("capped")
    # a zero-cost group allocates 0 and would make `div _n` an ANSI
    # divide-by-zero — it can contribute nothing, drop it at the join
    j = df.join(F.broadcast(sizes_df), group_col).where(F.col("_n") > 0)
    full_epochs = F.expr("_alloc div _n").alias("_fe")
    j = j.withColumn("_fe", full_epochs)
    full = (
        j.where(F.col("_fe") >= 1)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1).cast("long"), "_fe")))
        .drop("_n", "_alloc", "_fe")
    )
    key = _sample_key(F.col(id_col), salt)
    w = (
        Window.partitionBy(group_col)
        .orderBy(key, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    spent_before = F.sum(F.col(cost_col)).over(w) - F.col(cost_col)
    partial = (
        j.withColumn("_rem", F.expr("_alloc - _fe * _n"))
        .withColumn("_spent_before", spent_before)
        .where(F.col("_spent_before") < F.col("_rem"))
        .withColumn("epoch", (F.col("_fe") + 1).cast("long"))
        .drop("_n", "_alloc", "_fe", "_rem", "_spent_before")
    )
    return full.unionByName(partial)


# ---------------------------------------------------------------------------
# Temperature sampling (alpha-scaled language mixing; Devlin et al. mBERT,
# Conneau et al. XLM-R) — the transcendental sibling of UniMax: per-group
# rates follow q_l ∝ n_l^alpha, so low-resource groups are boosted smoothly
# instead of epoch-capped. alpha=1 is proportional (no reweighting), alpha=0
# is uniform-over-groups, 0.3 is the XLM-R default.
# ---------------------------------------------------------------------------

def temperature_mix(
    df: DataFrame,
    id_col: str,
    group_col: str,
    budget_rows: int,
    alpha: float = 0.3,
    salt: str = "temp",
) -> DataFrame:
    """Deterministic temperature-sampled mix: every kept row carries
    ``n_copies >= 1`` with E[sum(n_copies)] = ``budget_rows`` and
    per-group expected share ∝ n_g^alpha. Rate r_g may exceed 1
    (upsampling): a doc gets floor(r_g) guaranteed copies plus one more
    iff its content-addressed uniform falls under frac(r_g) — pure
    function of (salt, id), so the mix is reproducible and
    oracle-replayable. NULL-group rows are excluded (the validation
    layer upstream owns flagging them).

    Scale shape: one partial-aggregated count per group (bounded by
    group cardinality), a 1-row total crossJoin onto it, broadcast join
    back onto the corpus, then a narrow projection — no corpus shuffle
    anywhere. The alpha power is the ONE float in the pipeline (the
    documented transcendental-ulp caveat shared with the idf micros);
    UniMax is the integer-exact alternative when that caveat matters."""
    if budget_rows < 0:
        raise ValueError("budget_rows must be >= 0")
    from xmlschemavalidator_spark.textops import portable_hash64

    src = df.where(F.col(group_col).isNotNull())
    counts = src.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    z = counts.agg(F.sum(F.pow(F.col("_n"), F.lit(alpha))).alias("_z"))
    rates = counts.crossJoin(z).select(
        group_col,
        (
            F.lit(budget_rows)
            * F.pow(F.col("_n"), F.lit(alpha))
            / (F.col("_z") * F.col("_n"))
        ).alias("_rate"),
    )
    j = src.join(F.broadcast(rates), group_col)
    h = portable_hash64(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    base = F.floor(F.col("_rate"))
    extra = F.when(
        h < (F.col("_rate") - base) * F.lit(4294967296.0), F.lit(1)
    ).otherwise(F.lit(0))
    out = j.withColumn("n_copies", (base + extra).cast("bigint")).drop("_rate")
    return out.where(F.col("n_copies") >= 1)


def temperature_mix_sql(
    id_sql: str,
    group_sql: str,
    budget_rows: int,
    alpha: float = 0.3,
    salt: str = "temp",
    table: str = "documents",
) -> str:
    """DuckDB replay of :func:`temperature_mix` (same portable-md5
    uniform, same rate arithmetic) returning (doc, grp, n_copies)."""
    from xmlschemavalidator_spark.textops import PORTABLE_HASH64_SQL

    h = PORTABLE_HASH64_SQL.format(
        x=f"'{salt}:' || CAST({id_sql} AS VARCHAR)"
    )
    return f"""WITH counts AS (
  SELECT {group_sql} AS grp, CAST(count(*) AS BIGINT) AS n
  FROM {table} WHERE {group_sql} IS NOT NULL GROUP BY 1
), z AS (
  SELECT sum(pow(n, {alpha!r})) AS z FROM counts
), rates AS (
  SELECT grp, {budget_rows} * pow(n, {alpha!r}) / ((SELECT z FROM z) * n) AS rate
  FROM counts
), j AS (
  SELECT {id_sql} AS doc, {group_sql} AS grp, rate,
         floor(rate) AS base, {h} AS h
  FROM {table} JOIN rates ON {group_sql} = rates.grp
)
SELECT doc, grp,
       CAST(base + (CASE WHEN h < (rate - base) * 4294967296.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_copies
FROM j
WHERE base + (CASE WHEN h < (rate - base) * 4294967296.0 THEN 1 ELSE 0 END) >= 1"""


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: k rows drawn with
    probability proportional to `weight_col` (Efraimidis & Spirakis
    IPL'06, the exponential-key formulation): each row gets
    ``key = ln(u) / w`` with u a content-addressed uniform from
    md5(salt:id) — the k LARGEST keys are exactly a weight-proportional
    draw. The importance-sampling primitive behind quality-weighted
    corpus selection (DSIR's Gumbel top-k is the log-ratio special
    case; this is the generic any-weight-column form).

    Content-addressed like everything in this module: the sample is a
    pure function of (salt, id, weight) — stable across runs, retries
    and engines, and the DuckDB oracle replays it exactly (same 60-bit
    md5-prefix uniform as gumbel_key; ln on bit-identical doubles is
    the established libm contract). Ties are impossible in practice
    (distinct ids give distinct u) but the (key, id) order makes even
    those deterministic.

    Rows with NULL or non-positive weight are excluded (zero weight
    means "never sample"; E-S is undefined for w <= 0). Selection is
    ``TakeOrderedAndProject`` — right for report/eval-grade k; a
    corpus-fraction k wants the dsir_sample threshold path
    (quality_model.py), which this deliberately mirrors.
    """
    if k <= 0:
        raise ValueError(f"weighted_sample: k must be positive, got {k}")
    if "es_key" in df.columns:
        raise ValueError(
            "weighted_sample: column 'es_key' collides with the output "
            "key column; rename it first"
        )
    u_space = float(16 ** 15)
    hexpart = F.substring(_sample_key(F.col(id_col), salt), 1, 15)
    u = (F.conv(hexpart, 16, 10).cast("bigint") + F.lit(0.5)) / F.lit(u_space)
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("es_key", F.round(key, 10))
        .orderBy(F.col("es_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def weighted_sample_sql(
    table_sql: str, id_sql: str, weight_sql: str, k: int, salt: str = "wsample"
) -> str:
    """DuckDB replay of :func:`weighted_sample` (oracle side): identical
    uniform, identical key, identical (key, id) order."""
    u = (
        f"(CAST(concat('0x', substr({sample_key_sql(id_sql, salt)}, 1, 15)) "
        f"AS BIGINT) + 0.5) / {float(16 ** 15)!r}"
    )
    return (
        f"SELECT * FROM (SELECT t.*, round(ln({u}) / CAST({weight_sql} AS DOUBLE), 10) AS es_key "
        f"FROM ({table_sql}) t "
        f"WHERE {weight_sql} IS NOT NULL AND {weight_sql} > 0) "
        f"ORDER BY es_key DESC, {id_sql} ASC LIMIT {int(k)}"
    )


def stratified_fixed_k(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    k: int,
    salt: str = "fixedk",
    n_salts: int = 32,
) -> DataFrame:
    """EXACTLY ``min(k, |stratum|)`` rows per stratum (the eval-set /
    per-language-probe shape: "give me 1000 docs per lang"), where
    :func:`stratified_sample` keeps a deterministic FRACTION — a
    fraction can't promise a fixed-size artifact, and a fixed size
    can't come from a threshold filter. Selection order is the
    content-addressed md5(salt:id) key, so the sample is a pure
    function of (salt, id): stable under partitioning, retries,
    engines, and corpus additions that don't enter a stratum's top-k
    by key.

    Scale: the two-phase salted row_number (weburl.domain_cap's
    discipline) — phase 1 ranks within (stratum, salt-of-id) and keeps
    k per salt-group (a superset of the global top-k), phase 2 ranks
    the ≤ k·n_salts survivors. No mega-stratum ever sorts in one task.
    """
    if k < 1:
        raise ValueError(f"stratified_fixed_k: k must be >= 1, got {k}")
    for c in ("_fk_key", "_fk_salt", "_fk_rn"):
        if c in df.columns:
            raise ValueError(
                f"stratified_fixed_k: column '{c}' collides with an "
                "internal name; rename it first"
            )
    keyed = df.withColumn("_fk_key", _sample_key(F.col(id_col), salt)).withColumn(
        "_fk_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
    )
    order = [F.col("_fk_key").asc(), F.col(id_col).asc()]
    w1 = Window.partitionBy(strata_col, "_fk_salt").orderBy(*order)
    phase1 = (
        keyed.withColumn("_fk_rn", F.row_number().over(w1))
        .where(F.col("_fk_rn") <= k)
        .drop("_fk_rn")
    )
    w2 = Window.partitionBy(strata_col).orderBy(*order)
    return (
        phase1.withColumn("_fk_rn", F.row_number().over(w2))
        .where(F.col("_fk_rn") <= k)
        .drop("_fk_rn", "_fk_key", "_fk_salt")
    )


def interleave_by_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    salt: str = "ilv",
) -> DataFrame:
    """Group-interleaved training order: assign every doc a global
    ``interleave_pos`` such that consecutive positions rotate through
    the groups (languages, sources) round-robin — the curriculum-
    smoothing order that keeps a shard from serving an hour of one
    language (a known loss-spike source) without any extra shuffle
    pass downstream: writers just sort by the position.

    Construction: within each group, docs take a deterministic
    md5-shuffled rank r (the :func:`deterministic_shuffle` keying —
    pure function of (salt, id)); group g of G gets positions
    ``r · G + dense_rank(g)`` — a strided lattice, so groups alternate
    with period G until a group exhausts (after which its slots are
    simply absent; the order stays deterministic and gap-free per
    surviving group). Exact integers; ONE window per group + a tiny
    broadcast of the G-row group index.

    Scale note: the within-group window sorts each group once — the
    same cost as the deterministic shard shuffle; for mega-groups
    compose with ``n_shards``-style salting upstream if a single
    group's sort must not land in one task."""
    from xmlschemavalidator_spark.textops import portable_hash64

    from pyspark.sql import Window

    key = portable_hash64(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    groups = (
        df.select(F.col(group_col).alias("_g"))
        .distinct()
        .withColumn(
            "_gi",
            F.row_number().over(Window.orderBy(F.col("_g").asc_nulls_last())) - 1,
        )
    )
    n_groups = groups.count()
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_r", F.row_number().over(w) - 1)
        .join(F.broadcast(groups), F.col(group_col).eqNullSafe(F.col("_g")))
        .withColumn(
            "interleave_pos",
            (F.col("_r").cast("bigint") * n_groups + F.col("_gi")).cast("bigint"),
        )
        .drop("_r", "_g", "_gi")
    )


def neyman_allocation(
    df: DataFrame,
    value_col: str,
    stratum_col: str,
    total_n: int,
    quantum: int = 1_000_000,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation (Neyman 1934): split
    a fixed audit budget ``total_n`` across strata proportional to
    N_h·S_h — the design that minimizes the variance of the stratified
    mean estimator, vs proportional allocation's N_h. The validation
    read: a human-review budget should oversample the strata where the
    metric VARIES (a high-variance lang tells you more per label than a
    uniform one). Emits the plan ``(stratum, n_rows, mean, sd,
    n_proportional, n_neyman)`` — both allocations side by side, their
    difference being Neyman's gain.

    Exactness end-to-end INTEGER: per-stratum moment sums in the house
    quantized DECIMAL(38,0) lanes; S_h floor-quantizes to micros; the
    weights w_h = N_h·s_micro are integers apportioned by the largest-
    remainder (Hamilton) method — base_h = (total_n·w_h) div W exact
    integral division, the leftover seats go to the largest remainders
    (ties: stratum asc) — so BOTH columns sum exactly to ``total_n``
    and no float rounding can drift between engines. An all-zero-
    variance corpus falls back to proportional weights for n_neyman
    (Neyman is undefined at W=0; the plan must still allocate).
    Allocations are NOT capped at N_h: a stratum smaller than its
    allocation is a design warning the reader must see, not something
    to silently redistribute.

    Scale shape: one scan into a #strata-row aggregate; the
    apportionment windows run over strata, never rows.
    """
    if total_n < 0:
        raise ValueError(f"neyman_allocation: total_n={total_n}")
    d38 = "decimal(38,0)"
    v = F.col(value_col).cast("double")
    q = F.floor(v * F.lit(quantum)).cast(d38)
    base = df.where(v.isNotNull() & F.col(stratum_col).isNotNull()).select(
        F.col(stratum_col).alias("stratum"), q.alias("_q")
    )
    per = base.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("_q").alias("_s"),
        F.sum(F.col("_q") * F.col("_q")).alias("_ss"),
    )
    nd = F.col("n_rows").cast("double")
    sd_ = F.col("_s").cast("double")
    ssd = F.col("_ss").cast("double")
    qd = F.lit(float(quantum))
    var = F.when(
        F.col("n_rows") > 1,
        F.greatest(
            (ssd - sd_ * sd_ / nd) / (nd - F.lit(1.0)) / (qd * qd), F.lit(0.0)
        ),
    ).otherwise(F.lit(0.0))
    s_micro = F.floor(F.sqrt(var) * F.lit(1e6)).cast(d38)
    wall = Window.partitionBy()
    stats = per.select(
        "stratum",
        "n_rows",
        F.round(sd_ / nd / qd, 6).alias("mean"),
        F.round(F.sqrt(var), 6).alias("sd"),
        (F.col("n_rows").cast(d38) * s_micro).cast(d38).alias("_wn_raw"),
        F.col("n_rows").cast(d38).alias("_wp"),
    )
    # Neyman weight falls back to proportional when EVERY stratum has
    # zero variance (W = 0)
    staged = stats.withColumn(
        "_wn",
        F.when(
            F.sum("_wn_raw").over(wall) > 0, F.col("_wn_raw")
        ).otherwise(F.col("_wp")),
    )
    out = staged
    for wcol, outcol in (("_wp", "n_proportional"), ("_wn", "n_neyman")):
        out = (
            out.withColumn(f"_tot{wcol}", F.sum(wcol).over(wall))
            .withColumn(
                f"_base{wcol}",
                F.expr(
                    f"CAST(CASE WHEN _tot{wcol} > 0 THEN"
                    f" (CAST({total_n} AS {d38}) * {wcol}) div _tot{wcol}"
                    f" ELSE 0 END AS BIGINT)"
                ),
            )
            .withColumn(
                f"_rem{wcol}",
                F.expr(
                    f"CASE WHEN _tot{wcol} > 0 THEN"
                    f" CAST({total_n} AS {d38}) * {wcol}"
                    f" - CAST(_base{wcol} AS {d38}) * _tot{wcol}"
                    f" ELSE CAST(0 AS {d38}) END"
                ),
            )
        )
        worder = Window.partitionBy().orderBy(
            F.col(f"_rem{wcol}").desc(), F.col("stratum").asc()
        )
        leftover = F.lit(total_n).cast("bigint") - F.sum(f"_base{wcol}").over(
            wall
        ).cast("bigint")
        out = out.withColumn(
            outcol,
            (
                F.col(f"_base{wcol}")
                + F.when(
                    (F.row_number().over(worder) <= leftover)
                    & (F.col(f"_tot{wcol}") > 0),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).cast("bigint"),
        )
    return out.select(
        "stratum", "n_rows", "mean", "sd", "n_proportional", "n_neyman"
    )


def stratified_estimate(
    full_df: DataFrame,
    sample_df: DataFrame,
    value_col: str,
    stratum_col: str,
    quantum: int = 1_000_000,
    z_crit_milli: int = 1960,
    round_to: int = 6,
) -> DataFrame:
    """Design-based stratified estimator (the Horvitz–Thompson form for
    stratified SRS, Cochran 1977 §5): project an audited SAMPLE back to
    the population — the third leg of the audit loop
    (:func:`neyman_allocation` CHOOSES the design,
    :func:`stratified_fixed_k` DRAWS it, this ESTIMATES from what came
    back). ``full_df`` supplies only the per-stratum population counts
    N_h (counting is cheap; the VALUE — a human label, an expensive
    model score — exists only on ``sample_df``). One row:

    ``(n_population, n_pop_covered, n_sampled, n_strata,
    n_strata_unsampled, est_mean, est_total, se_total, ci_lo_total,
    ci_hi_total)`` with T̂ = Σ N_h·x̄_h and the with-replacement-
    corrected variance  V̂ = Σ N_h²(1 − n_h/N_h)·s_h²/n_h.

    Coverage is EXPLICIT, never imputed: strata present in the
    population but absent from the sample contribute nothing to T̂ and
    drop out of ``n_pop_covered`` (est_mean divides by the covered
    population, so it stays an unbiased mean OF THE COVERED part);
    ``n_strata_unsampled`` makes the gap visible. Single-row strata
    carry zero variance contribution (disclosed downward bias on
    se_total, the standard fallback). Sampled values NULL-filter out;
    a stratum whose every sampled value is NULL counts as unsampled.

    Exactness: per-stratum moments in the quantized DECIMAL(38,0)
    lanes; each stratum's total/variance contribution is a fixed double
    chain on exact integers, 12-dp-rounded then DECIMAL-summed over the
    #strata rows (order-free); the CI is ±(z_crit_milli/1000)·se.

    Scale shape: two #strata-row aggregates joined on stratum; nothing
    row-sized crosses a window.
    """
    d38 = "decimal(38,0)"
    pop = full_df.where(F.col(stratum_col).isNotNull()).groupBy(
        F.col(stratum_col).alias("stratum")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_Np"))
    v = F.col(value_col).cast("double")
    q = F.floor(v * F.lit(quantum)).cast(d38)
    smp = (
        sample_df.where(v.isNotNull() & F.col(stratum_col).isNotNull())
        .select(F.col(stratum_col).alias("stratum"), q.alias("_q"))
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_ns"),
            F.sum("_q").alias("_s"),
            F.sum(F.col("_q") * F.col("_q")).alias("_ss"),
        )
    )
    j = pop.join(smp, "stratum", "left")
    nd = F.col("_ns").cast("double")
    Nd = F.col("_Np").cast("double")
    qd = F.lit(float(quantum))
    mean_h = F.col("_s").cast("double") / nd / qd
    var_h = F.when(
        F.col("_ns") > 1,
        F.greatest(
            (
                F.col("_ss").cast("double")
                - F.col("_s").cast("double") * F.col("_s").cast("double") / nd
            )
            / (nd - F.lit(1.0))
            / (qd * qd),
            F.lit(0.0),
        ),
    ).otherwise(F.lit(0.0))
    sampled = F.col("_ns").isNotNull() & (F.col("_ns") > 0)
    tot_term = F.when(sampled, Nd * mean_h).otherwise(F.lit(0.0))
    var_term = F.when(
        sampled & (F.col("_ns") > 1),
        Nd * Nd * (F.lit(1.0) - nd / Nd) * var_h / nd,
    ).otherwise(F.lit(0.0))
    terms = j.select(
        "_Np",
        F.coalesce(F.col("_ns"), F.lit(0)).alias("_nn"),
        sampled.cast("long").alias("_cov"),
        F.round(tot_term, 12).cast("decimal(38,12)").alias("_t"),
        F.round(var_term, 12).cast("decimal(38,12)").alias("_v"),
    )
    agg = terms.agg(
        F.sum("_Np").cast("bigint").alias("n_population"),
        F.sum(F.col("_Np") * F.col("_cov")).cast("bigint").alias("n_pop_covered"),
        F.sum("_nn").cast("bigint").alias("n_sampled"),
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum(F.lit(1) - F.col("_cov")).cast("bigint").alias("n_strata_unsampled"),
        F.sum("_t").alias("_T"),
        F.sum("_v").alias("_V"),
    )
    Td = F.col("_T").cast("double")
    se = F.sqrt(F.greatest(F.col("_V").cast("double"), F.lit(0.0)))
    zc = F.lit(z_crit_milli / 1000.0)
    est_mean = F.when(
        F.col("n_pop_covered") > 0, Td / F.col("n_pop_covered").cast("double")
    )
    return agg.select(
        "n_population",
        "n_pop_covered",
        "n_sampled",
        "n_strata",
        "n_strata_unsampled",
        F.round(est_mean, round_to).alias("est_mean"),
        F.round(Td, round_to).alias("est_total"),
        F.round(se, round_to).alias("se_total"),
        F.round(Td - zc * se, round_to).alias("ci_lo_total"),
        F.round(Td + zc * se, round_to).alias("ci_hi_total"),
    )


def poisson_ht_estimate(
    df: DataFrame,
    id_col: str,
    y_col: str,
    size_col: str,
    expected_n: int,
    salt: str = "ht",
    z_milli: int = 1960,
    round_to: int = 6,
) -> DataFrame:
    """Poisson πps sampling + the Horvitz–Thompson estimator (Horvitz &
    Thompson JASA 1952; Poisson design per Särndal et al. §3.5) — the
    unequal-probability member of the audit-sampling family:
    :func:`neyman_allocation` stratifies, this sizes each row's
    inclusion probability to an auxiliary SIZE measure (π_i ∝ size_i,
    capped at 1) so big rows are near-certain and the long tail is
    thinned, and Ŷ = Σ_sample y_i/π_i is design-unbiased for the
    population total with the Poisson variance estimator
    V̂ = Σ_sample (1−π_i)/π_i²·y_i². ONE row ``(n_pop, n_sampled,
    expected_n, y_hat, se, ci_low, ci_high)``.

    Content-addressed like everything in this module: inclusion is
    ``u_i < π_i`` with u the 60-bit md5(salt:id) uniform (the
    gumbel_key recipe) — the draw is a pure function of (salt, id,
    size) and replays identically in the oracle. π_i is computed by the
    SAME fixed IEEE chain in both engines ((expected_n · s)/T, capped
    at 1, over micro-quantized sizes), and the estimator's per-row
    terms are 12dp-rounded then DECIMAL-summed — order-free. Two scans
    (one size-total partial agg, one narrow filter + estimate), no
    shuffle beyond the single-row aggregates. Rows with NULL/
    non-positive size are excluded from frame and estimate (π=0 rows
    cannot be sampled — the HT contract); NULL y on a sampled row is a
    measured zero contribution, disclosed by n_sampled.
    """
    if expected_n <= 0:
        raise ValueError(
            f"poisson_ht_estimate: expected_n must be positive, got {expected_n}"
        )
    s_q = F.floor(F.col(size_col).cast("double") * F.lit(1_000_000)).cast(
        "bigint"
    )
    base = df.where(
        F.col(id_col).isNotNull()
        & F.col(size_col).isNotNull()
        & (F.col(size_col).cast("double") > 0)
    ).select(
        F.col(id_col).alias("_id"),
        F.col(y_col).cast("double").alias("_y"),
        s_q.alias("_s"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pop"),
        F.sum("_s").cast("decimal(38,0)").alias("_T"),
    )
    j = base.crossJoin(F.broadcast(tot))
    p = F.least(
        F.lit(1.0),
        F.lit(float(expected_n))
        * F.col("_s").cast("double")
        / F.col("_T").cast("double"),
    )
    u = (
        F.conv(F.substring(_sample_key(F.col("_id"), salt), 1, 15), 16, 10)
        .cast("bigint")
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 60))
    sampled = j.where(u < p)
    yq = F.coalesce(F.col("_y"), F.lit(0.0))
    term = F.round(yq / p, 12).cast("decimal(38,12)")
    vterm = F.round(
        (F.lit(1.0) - p) / (p * p) * yq * yq, 12
    ).cast("decimal(38,12)")
    est = sampled.agg(
        F.max("n_pop").alias("n_pop"),
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.coalesce(F.sum(term), F.lit(0).cast("decimal(38,12)"))
        .cast("double")
        .alias("_yhat"),
        F.coalesce(F.sum(vterm), F.lit(0).cast("decimal(38,12)"))
        .cast("double")
        .alias("_vhat"),
    )
    zc = F.lit(z_milli / 1000.0)
    se = F.sqrt(F.col("_vhat"))
    return est.select(
        "n_pop",
        "n_sampled",
        F.lit(int(expected_n)).cast("bigint").alias("expected_n"),
        F.round(F.col("_yhat"), round_to).alias("y_hat"),
        F.round(se, round_to).alias("se"),
        F.round(F.col("_yhat") - zc * se, round_to).alias("ci_low"),
        F.round(F.col("_yhat") + zc * se, round_to).alias("ci_high"),
    )


def poisson_ht_oracle_sql(
    from_sql: str,
    expected_n: int,
    salt: str = "ht",
    z_milli: int = 1960,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`poisson_ht_estimate`; ``from_sql`` must
    yield ``id``, ``y``, ``size``. Same md5 uniform, same fixed π
    chain, same 12dp-round-then-DECIMAL sums."""
    key = sample_key_sql("id", salt)
    u = (
        f"((CAST(('0x' || substr({key}, 1, 15)) AS BIGINT) + 0.5)"
        f" / {float(1 << 60)})"
    )
    p = (
        f"least(1.0, {float(expected_n)} * CAST(s AS DOUBLE)"
        " / CAST(T AS DOUBLE))"
    )
    z = z_milli / 1000.0
    return f"""WITH src AS ({from_sql}),
b AS (SELECT id, CAST(y AS DOUBLE) AS y,
        CAST(floor(CAST(size AS DOUBLE) * 1000000) AS BIGINT) AS s
      FROM src WHERE id IS NOT NULL AND size IS NOT NULL
        AND CAST(size AS DOUBLE) > 0),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_pop,
          CAST(sum(s) AS DECIMAL(38,0)) AS T FROM b),
sampled AS (SELECT b.*, tot.n_pop, tot.T FROM b, tot WHERE {u} < {p}),
est AS (SELECT max(n_pop) AS n_pop,
    CAST(count(*) AS BIGINT) AS n_sampled,
    CAST(coalesce(sum(CAST(round(coalesce(y, 0.0) / {p}, 12)
        AS DECIMAL(38,12))), 0) AS DOUBLE) AS yhat,
    CAST(coalesce(sum(CAST(round((1.0 - {p}) / ({p} * {p})
        * coalesce(y, 0.0) * coalesce(y, 0.0), 12)
        AS DECIMAL(38,12))), 0) AS DOUBLE) AS vhat
  FROM sampled)
SELECT n_pop, n_sampled, CAST({expected_n} AS BIGINT) AS expected_n,
  round(yhat, {round_to}) AS y_hat,
  round(sqrt(vhat), {round_to}) AS se,
  round(yhat - {z} * sqrt(vhat), {round_to}) AS ci_low,
  round(yhat + {z} * sqrt(vhat), {round_to}) AS ci_high
FROM est"""
