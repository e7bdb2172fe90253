"""Poisson bootstrap — resampling confidence intervals AT SCALE
(Chamandy/Muralidharan/Najmi/Naidu, "Estimating uncertainty for massive
data streams", Google 2012; also Kleiner et al.'s bag-of-little-
bootstraps lineage): the classical bootstrap resamples n rows WITH
replacement R times, which is unimplementable when n doesn't fit
anywhere — the Poisson bootstrap replaces each replicate's multinomial
row counts with independent Poisson(1) weights per (row, replicate),
which is exact in the n→∞ limit and needs only ONE streaming pass:
every row contributes to all R replicate sums as it is scanned.

Engine rendering: weights are CONTENT-ADDRESSED, not rand()-based — the
Poisson(1) count of (row, replicate) is the inverse-CDF bucket of
md5(salt:rep:id), compared as a hex STRING against precomputed
cumulative thresholds (the sampling.py md5-threshold trick, so the
draw is reproducible across runs/engines/cluster sizes and the DuckDB
oracle replays it bit-exactly). The CDF is truncated at k=8
(P[k>8] ≈ 1.1e-7 — the tail mass collapses onto 8; at 10⁹ rows ~100
rows per replicate carry weight 8 instead of 9+, far inside bootstrap
noise and identical on both engines).

Scale shape: the replicate dimension explodes MAP-SIDE and is partially
aggregated before the one shuffle — the exchange carries at most
(partitions × groups × (R+1)) pre-combined rows, never n×R. The
percentile step runs over R replicate means per group (R ≈ 200): a
window row_number with an INTEGER rank pick (floor((R−1)·milli/10⁵)),
so there is no interpolation convention to diverge between engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xmlschemavalidator_spark.sampling import md5_threshold

_POISSON_MAX_K = 8


def _poisson1_cdf() -> list[float]:
    """Cumulative P[X ≤ k] for X ~ Poisson(1), k = 0..MAX_K-1."""
    out, acc = [], 0.0
    for k in range(_POISSON_MAX_K):
        acc += math.exp(-1.0) / math.factorial(k)
        out.append(acc)
    return out


def poisson_thresholds() -> list[str]:
    """The hex md5 thresholds t_k with P[md5 < t_k] = P[X ≤ k]; the
    weight of a draw is the number of thresholds ≤ its hash."""
    return [md5_threshold(c) for c in _poisson1_cdf()]


def poisson_bootstrap_mean(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: tuple[str, ...] = (),
    n_reps: int = 200,
    lo_milli: int = 2500,
    hi_milli: int = 97500,
    salt: str = "boot",
    quantum: int = 1_000_000,
    round_to: int = 6,
) -> DataFrame:
    """Bootstrap CI for the mean of ``value_col``: one row per group
    ``(group…, n, mean, ci_lo, ci_hi, n_reps)`` where mean is the exact
    full-sample mean and [ci_lo, ci_hi] are the lo/hi_milli percentile
    replicate means (integer milli-percent, rank-picked — 2500/97500 =
    the 95% interval).

    One corpus scan: each row explodes into reps −1..R−1 (rep −1 is the
    point-estimate lane with weight 1; it rides the same aggregate so
    no second pass), weight = Poisson(1) inverse-CDF bucket of
    md5(salt:rep:id). Values quantize to DECIMAL(38,0) micros before
    the weighted sums — exact, order-independent — and each replicate
    mean is one double division at the end."""
    if n_reps < 2:
        raise ValueError("n_reps must be >= 2")
    g = list(group_cols)
    v = F.col(value_col).cast("double")
    q = F.floor(v * F.lit(quantum)).cast("decimal(38,0)")
    base = df.where(v.isNotNull()).select(
        *g, q.alias("_q"), F.col(id_col).cast("string").alias("_id")
    )
    rep = F.explode(F.sequence(F.lit(-1), F.lit(n_reps - 1))).alias("rep")
    h = F.md5(
        F.concat(
            F.lit(salt),
            F.lit(":"),
            F.col("rep").cast("string"),
            F.lit(":"),
            F.col("_id"),
        )
    )
    w = F.lit(0)
    for t in poisson_thresholds():
        w = w + (h >= F.lit(t)).cast("int")
    w = F.when(F.col("rep") == -1, F.lit(1)).otherwise(w)
    long = base.select(*g, "_q", "_id", rep).select(
        *g, "rep", w.alias("_w"), F.col("_q")
    )
    per_rep = long.groupBy(*g, "rep").agg(
        F.sum(F.col("_w").cast("decimal(38,0)") * F.col("_q")).alias("_sw"),
        F.sum("_w").cast("bigint").alias("_n"),
    )
    mean_rep = F.when(
        F.col("_n") > 0,
        F.col("_sw").cast("double") / F.col("_n").cast("double") / F.lit(float(quantum)),
    )
    # materialize the tiny (groups × R+1) aggregate ONCE — the point
    # estimate and both percentile picks all read it; without this the
    # three output branches each re-scan the corpus (seen in the plan:
    # 3 parquet scans -> 1)
    reps = per_rep.withColumn("_m", mean_rep).localCheckpoint()
    point = reps.where(F.col("rep") == -1).select(
        *g,
        F.col("_n").alias("n"),
        F.round(F.col("_m"), round_to).alias("mean"),
    )
    wnd = Window.partitionBy(*g) if g else Window.partitionBy(F.lit(1))
    order = wnd.orderBy(F.col("_m").asc_nulls_first(), F.col("rep").asc())
    ranked = (
        reps.where(F.col("rep") >= 0)
        .withColumn("_rn", F.row_number().over(order))
    )
    lo_idx = (n_reps - 1) * lo_milli // 100_000 + 1
    hi_idx = (n_reps - 1) * hi_milli // 100_000 + 1
    lo = ranked.where(F.col("_rn") == lo_idx).select(
        *g, F.round(F.col("_m"), round_to).alias("ci_lo")
    )
    hi = ranked.where(F.col("_rn") == hi_idx).select(
        *g, F.round(F.col("_m"), round_to).alias("ci_hi")
    )
    out = point
    for side in (lo, hi):
        out = out.join(side, g) if g else out.crossJoin(side)
    return out.select(
        *g, "n", "mean", "ci_lo", "ci_hi",
        F.lit(n_reps).cast("int").alias("n_reps"),
    )


def poisson_bootstrap_oracle_sql(
    from_sql: str,
    value_col: str,
    id_col: str,
    group_cols: tuple[str, ...] = (),
    n_reps: int = 200,
    lo_milli: int = 2500,
    hi_milli: int = 97500,
    salt: str = "boot",
    quantum: int = 1_000_000,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`poisson_bootstrap_mean` — same hex
    thresholds, same quantized sums, same integer rank picks."""
    g = list(group_cols)
    gsel = "".join(f"{c}, " for c in g)
    gby = ("GROUP BY " + ", ".join(g + ["rep"])) if g else "GROUP BY rep"
    part = ("PARTITION BY " + ", ".join(g) + " ") if g else ""
    jn = (" AND ".join(f"p.{c} = l.{c}" for c in g)) or "true"
    jn2 = (" AND ".join(f"p.{c} = h.{c}" for c in g)) or "true"
    wsum = " + ".join(
        f"CASE WHEN md5('{salt}' || ':' || CAST(rep AS VARCHAR) || ':' "
        f"|| CAST({id_col} AS VARCHAR)) >= '{t}' THEN 1 ELSE 0 END"
        for t in poisson_thresholds()
    )
    lo_idx = (n_reps - 1) * lo_milli // 100_000 + 1
    hi_idx = (n_reps - 1) * hi_milli // 100_000 + 1
    pg = "".join(f"p.{c}, " for c in g)
    return f"""WITH src AS ({from_sql}),
base AS (SELECT {gsel}CAST(floor(CAST({value_col} AS DOUBLE) * {quantum})
                    AS HUGEINT) AS q, {id_col}
         FROM src WHERE {value_col} IS NOT NULL),
long AS (SELECT {gsel}rep,
                CASE WHEN rep = -1 THEN 1 ELSE {wsum} END AS w, q
         FROM base CROSS JOIN (SELECT unnest(range(-1, {n_reps})) AS rep)),
per AS (SELECT {gsel}rep, sum(CAST(w AS HUGEINT) * q) AS sw,
               CAST(sum(w) AS BIGINT) AS n
        FROM long {gby}),
reps AS (SELECT *, CASE WHEN n > 0 THEN CAST(sw AS DOUBLE) / CAST(n AS DOUBLE)
                        / {float(quantum)} END AS m
         FROM per),
pt AS (SELECT {gsel}n, round(m, {round_to}) AS mean FROM reps WHERE rep = -1),
rk AS (SELECT *, row_number() OVER ({part}ORDER BY m ASC NULLS FIRST, rep ASC) AS rn
       FROM reps WHERE rep >= 0),
lo AS (SELECT {gsel}round(m, {round_to}) AS ci_lo FROM rk WHERE rn = {lo_idx}),
hi AS (SELECT {gsel}round(m, {round_to}) AS ci_hi FROM rk WHERE rn = {hi_idx})
SELECT {pg}p.n, p.mean, l.ci_lo, h.ci_hi, CAST({n_reps} AS INTEGER) AS n_reps
FROM pt p JOIN lo l ON {jn} JOIN hi h ON {jn2}"""
