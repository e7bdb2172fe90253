"""Model / retrieval evaluation analyzers.

The pipeline trains rankers and classifiers in-engine (quality_model.py's
NB scorer, lang_model.py's language ID, textops.bm25_topk, the ANN family)
but until now had no in-engine way to MEASURE them — AUC lived in a test
docstring and retrieval quality was eyeballed. These two analyzers close
that loop with the repo's exactness contract (integer/DECIMAL arithmetic,
fixed double chains, pre-sum rounding) so both are oracle-checkable.

Reference scope note: eliassona/xmlschemavalidator validates per record
and has no evaluation layer (core.clj:263-285 stops at valid?); these are
north-rule additions in the Deequ-analyzer style of checks/stats.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    quantum: int = 1_000_000,
    round_to: int = 6,
) -> DataFrame:
    """Exact tie-aware ROC AUC of a score against a boolean label: one
    row ``(n_pos, n_neg, n_scores, auc)`` — the Mann-Whitney identity
    AUC = P(score+ > score-) + ½·P(score+ = score-), which is what a
    rank-based AUC with average-rank tie handling computes.

    Exactness: scores quantize to integer ``quantum``-ths (ties are then
    a deterministic property of the quantized value, identical in both
    engines), and the whole statistic is one exact rational:
    ``2·Σ_s [n_pos(s)·(2·cum_neg_below(s) + n_neg(s))] / (2·P·N)`` with
    the numerator summed in DECIMAL(38,0) (n_pos·cum_neg reaches P·N —
    past BIGINT at ~3e9 rows per class) and ONE final double division,
    rounded. No sort of the corpus and no float accumulation anywhere.

    Scale shape: one partial-aggregatable groupBy on the quantized score,
    then a single-partition ordered window over the DISTINCT-score table
    — bounded by ``quantum × score range``, NOT by the corpus (a [0,1]
    probability score has ≤ quantum+1 distinct rows at any corpus size;
    for unbounded-range scores pick a coarser quantum — the knob trades
    tie granularity, not correctness of the tie handling).

    Rows with a NULL score or label are excluded (pairwise-complete);
    a single-class input yields NULL auc (undefined), never a div/0.
    """
    lab = F.col(label_col).cast("boolean")
    base = df.where(
        F.col(score_col).isNotNull() & lab.isNotNull()
    ).select(
        F.floor(F.col(score_col).cast("double") * F.lit(quantum))
        .cast("bigint")
        .alias("_s"),
        lab.cast("long").alias("_y"),
    )
    g = base.groupBy("_s").agg(
        F.sum("_y").cast("decimal(38,0)").alias("_np"),
        F.sum(F.lit(1) - F.col("_y")).cast("decimal(38,0)").alias("_nn"),
    )
    below = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    contrib = F.col("_np") * (
        F.lit(2) * F.coalesce(F.sum("_nn").over(below), F.lit(0).cast("decimal(38,0)"))
        + F.col("_nn")
    )
    agg = g.select("_np", "_nn", contrib.alias("_c")).agg(
        F.sum("_np").alias("p"),
        F.sum("_nn").alias("n"),
        F.sum("_c").alias("num2"),
        F.count(F.lit(1)).cast("bigint").alias("n_scores"),
    )
    p, n = F.col("p").cast("double"), F.col("n").cast("double")
    return agg.select(
        F.col("p").cast("bigint").alias("n_pos"),
        F.col("n").cast("bigint").alias("n_neg"),
        "n_scores",
        F.round(
            F.when(
                (p > 0) & (n > 0),
                F.col("num2").cast("double") / (F.lit(2.0) * p * n),
            ),
            round_to,
        ).alias("auc"),
    )


def retrieval_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query",
    doc_col: str = "doc",
    rank_col: str = "rank",
    rel_col: str = "rel",
    round_to: int = 6,
) -> DataFrame:
    """TREC-style ranked-retrieval evaluation: per query,
    ``(query, n_ret, n_rel, n_rel_ret, precision_k, recall_k, rr,
    dcg_k, ndcg_k)`` from a run ``(query, doc, rank)`` (rank 1-based —
    BM25/ANN/RRF top-k output passed through :func:`similarity.ranked`)
    and graded judgments ``(query, doc, rel)`` (rel ≥ 1 = relevant).

    Metric definitions (Järvelin & Kekäläinen TOIS'02 for nDCG):
    ``rr`` = 1/rank of the first relevant hit within k (0 if none —
    MRR is the mean of this column); ``dcg_k = Σ (2^rel − 1)/log2(rank+1)``
    over retrieved ranks ≤ k; ``ndcg_k = dcg_k / idcg_k`` with the ideal
    ranking ordered by (rel desc, doc asc) — the deterministic tie-break
    that makes IDCG a pure function of the judgment multiset.

    Exactness: precision/recall/rr are exact rationals (one rounded
    division each). Each DCG term is a fixed double chain on exact
    integer inputs (pow(2, rel) and log2 are the same IEEE ops in both
    engines), rounded to 12 dp and summed in DECIMAL(20,12) —
    order-independent, the categorical_entropy contract.

    Scale shape: run⋈qrels is an equi-join on (query, doc), both sides
    keyed; every aggregate is partial-aggregatable on query; the only
    window (ideal ranking) partitions BY QUERY over the judgments —
    bounded per query by editorial contract, never corpus-wide.
    Unjudged retrieved docs count rel = 0 (the standard convention);
    queries with no relevant judgments get NULL recall/ndcg.
    """
    qc, dc, rk = F.col(query_col), F.col(doc_col), F.col(rank_col)
    runk = run.where(rk <= k).select(
        qc.alias("_q"), dc.alias("_d"), rk.cast("bigint").alias("_rank")
    )
    judged = qrels.select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rel_col).cast("bigint").alias("_rel"),
    )

    def _dcg_term(rel, rank):
        return F.round(
            (F.pow(F.lit(2.0), rel.cast("double")) - F.lit(1.0))
            / F.log2(rank.cast("double") + F.lit(1.0)),
            12,
        ).cast("decimal(20,12)")

    hits = runk.join(judged, ["_q", "_d"], "left").withColumn(
        "_rel", F.coalesce("_rel", F.lit(0))
    )
    per_run = hits.groupBy("_q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ret"),
        F.sum((F.col("_rel") > 0).cast("long")).cast("bigint").alias("n_rel_ret"),
        F.min(F.when(F.col("_rel") > 0, F.col("_rank"))).alias("_first"),
        F.sum(_dcg_term(F.col("_rel"), F.col("_rank"))).alias("_dcg"),
    )
    n_rel = judged.where(F.col("_rel") > 0).groupBy("_q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rel")
    )
    iw = Window.partitionBy("_q").orderBy(F.col("_rel").desc(), F.col("_d").asc())
    ideal = (
        judged.where(F.col("_rel") > 0)
        .withColumn("_irank", F.row_number().over(iw))
        .where(F.col("_irank") <= k)
        .groupBy("_q")
        .agg(F.sum(_dcg_term(F.col("_rel"), F.col("_irank"))).alias("_idcg"))
    )
    out = per_run.join(n_rel, "_q", "left").join(ideal, "_q", "left")
    dcg = F.col("_dcg").cast("double")
    idcg = F.col("_idcg").cast("double")
    return out.select(
        F.col("_q").alias(query_col),
        "n_ret",
        F.coalesce("n_rel", F.lit(0)).cast("bigint").alias("n_rel"),
        "n_rel_ret",
        F.round(F.col("n_rel_ret") / F.lit(float(k)), round_to).alias("precision_k"),
        F.round(
            F.when(F.col("n_rel") > 0, F.col("n_rel_ret") / F.col("n_rel")),
            round_to,
        ).alias("recall_k"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("_first"), F.lit(0.0)), round_to
        ).alias("rr"),
        F.round(dcg, round_to).alias("dcg_k"),
        F.round(F.when(idcg > 0, dcg / idcg), round_to).alias("ndcg_k"),
    )


def calibration_report(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Reliability diagram + Expected Calibration Error (Naeini et al.
    AAAI'15; Guo et al. ICML'17 popularized the binned form): predicted
    probabilities in [0, 1] fall into ``n_bins`` equal-width bins; this
    returns the PER-BIN reliability table — :func:`ece` computes the
    scalar verdict over the same binning.

    Per-bin columns: ``bin`` (0-based; p = 1.0 joins the top bin, the
    standard closed-right convention), ``n``, ``conf`` = mean predicted
    probability, ``acc`` = empirical positive rate, ``gap`` = acc −
    conf (signed: positive = under-confident).

    Exactness: probabilities quantize to integer millionths BEFORE
    binning and averaging — bin membership is integer floor division
    and both means are exact rationals (DECIMAL(38,0) micro sums, one
    rounded double division each). NULL prob/label rows are excluded;
    out-of-[0,1] probabilities clamp into the end bins (a miscalibrated
    scorer is data to be measured, not a job-killing error).

    Scale shape: ONE partial-aggregatable groupBy on the bin id —
    ``n_bins`` result rows at any corpus size.
    """
    if n_bins < 1:
        raise ValueError(f"calibration_report: n_bins={n_bins}")
    lab = F.col(label_col).cast("boolean")
    micro = F.floor(F.col(prob_col).cast("double") * F.lit(1_000_000)).cast("bigint")
    micro = F.least(F.greatest(micro, F.lit(0)), F.lit(1_000_000))
    base = df.where(F.col(prob_col).isNotNull() & lab.isNotNull()).select(
        F.least(
            F.floor(micro * F.lit(n_bins) / F.lit(1_000_000)).cast("bigint"),
            F.lit(n_bins - 1).cast("bigint"),
        ).alias("bin"),
        micro.alias("_p"),
        lab.cast("long").alias("_y"),
    )
    g = base.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("_p").cast("decimal(38,0)")).alias("_sp"),
        F.sum(F.col("_y").cast("decimal(38,0)")).alias("_sy"),
    )
    return g.select(
        "bin",
        "n",
        F.round(F.col("_sp").cast("double") / (F.col("n") * F.lit(1e6)), round_to).alias("conf"),
        F.round(F.col("_sy").cast("double") / F.col("n"), round_to).alias("acc"),
        F.round(
            F.col("_sy").cast("double") / F.col("n")
            - F.col("_sp").cast("double") / (F.col("n") * F.lit(1e6)),
            round_to,
        ).alias("gap"),
    )


def ece(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Scalar calibration verdict over the same binning as
    :func:`calibration_report`: one row ``(n, n_bins_used, ece, mce)``
    — ECE = Σ_b (n_b/N)·|acc_b − conf_b| (the weighted mean absolute
    reliability gap) and MCE = max_b |acc_b − conf_b|.

    Exactness: the per-bin gap |Σy/n − Σp/(n·1e6)| is the exact
    rational |1e6·Σy − Σp| / (n·1e6); ECE's weighted sum telescopes to
    Σ_b |1e6·Σy_b − Σp_b| / (N·1e6) — integer micro numerators summed
    in DECIMAL(38,0), ONE final double division. MCE takes the max of
    per-bin exact rationals via one rounded division per bin (n_bins
    rows, driver-bounded).
    """
    lab = F.col(label_col).cast("boolean")
    micro = F.floor(F.col(prob_col).cast("double") * F.lit(1_000_000)).cast("bigint")
    micro = F.least(F.greatest(micro, F.lit(0)), F.lit(1_000_000))
    base = df.where(F.col(prob_col).isNotNull() & lab.isNotNull()).select(
        F.least(
            F.floor(micro * F.lit(n_bins) / F.lit(1_000_000)).cast("bigint"),
            F.lit(n_bins - 1).cast("bigint"),
        ).alias("bin"),
        micro.alias("_p"),
        lab.cast("long").alias("_y"),
    )
    g = base.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(F.col("_p").cast("decimal(38,0)")).alias("_sp"),
        F.sum(F.col("_y").cast("decimal(38,0)")).alias("_sy"),
    )
    absnum = F.abs(F.col("_sy") * F.lit(1_000_000).cast("decimal(38,0)") - F.col("_sp"))
    return g.select("_n", absnum.alias("_a")).agg(
        F.sum("_n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins_used"),
        F.round(
            F.sum("_a").cast("double") / (F.sum("_n") * F.lit(1e6)), round_to
        ).alias("ece"),
        F.round(
            F.max(F.round(F.col("_a").cast("double") / (F.col("_n") * F.lit(1e6)), 9)),
            round_to,
        ).alias("mce"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
    round_to: int = 6,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Kaplan–Meier product-limit survival estimate (Kaplan & Meier
    JASA 1958) over right-censored durations — the retention/churn
    curve done correctly: a user still active at observation end is
    CENSORED (drops from the risk set without counting as a death),
    which the naive "fraction still active at t" conflates. One row
    per distinct duration with >= 1 observed event:
    ``(*group_cols, t, n_risk, n_events, n_censored, logsurv_micro,
    survival)`` — pass ``group_cols`` for per-cohort curves (windows
    partition by group; the single-partition form is the ungrouped
    special case).

    Exactness: each factor (1 − d_t/n_t) is the exact rational
    (n_t − d_t)/n_t of BIGINT counts; its ln floor-quantizes to integer
    micros and the product becomes an ORDERED cumulative integer sum
    (one expanding window over the distinct-duration table — bounded by
    distinct durations, not rows). ``survival`` = exp(logsurv/1e6)
    rounded — derived for the reader; the hash-grade statistic is
    ``logsurv_micro`` (the perplexity_score convention: exp stays out
    of the cross-engine contract, ln's last-ulp agreement is the
    established libm contract).

    Convention: censoring ties at t leave the risk set AFTER the events
    at t (the standard KM tie rule). Scale shape: one groupBy on the
    duration + one single-partition window over distinct durations —
    fine at any corpus size for bounded duration grids (days); for
    continuous micro-second durations, bucket first.
    """
    gc = list(group_cols)
    lab = F.col(observed_col).cast("boolean")
    base = df.where(
        F.col(duration_col).isNotNull() & lab.isNotNull()
    ).select(
        *[F.col(c) for c in gc],
        F.col(duration_col).cast("bigint").alias("t"),
        lab.cast("long").alias("_e"),
    )
    g = base.groupBy(*gc, "t").agg(
        F.sum("_e").cast("bigint").alias("n_events"),
        F.sum(F.lit(1) - F.col("_e")).cast("bigint").alias("n_censored"),
        F.count(F.lit(1)).cast("bigint").alias("_n"),
    )
    # n_risk at t = everyone with duration >= t: a cumulative sum from
    # the END of the distinct-duration table
    wtail = Window.partitionBy(*gc).orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    g2 = g.withColumn("n_risk", F.sum("_n").over(wtail).cast("bigint"))
    # S hits exact 0 when every remaining subject dies at t (ln(0) = -inf
    # has no integer form): that terminal row carries NULL logsurv_micro
    # and survival 0.0 — and since nobody survives past it, no later
    # event row exists to inherit the NULL term
    hit_zero = F.col("n_events") == F.col("n_risk")
    term = F.when(
        ~hit_zero,
        F.floor(
            F.log(
                (F.col("n_risk") - F.col("n_events")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * F.lit(1_000_000)
        ).cast("bigint"),
    )
    wcum = Window.partitionBy(*gc).orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = (
        g2.where(F.col("n_events") > 0)
        .withColumn("_lt", term)
        .withColumn(
            "logsurv_micro",
            F.when(~hit_zero, F.sum("_lt").over(wcum)).cast("bigint"),
        )
    )
    return out.select(
        *gc,
        "t",
        "n_risk",
        "n_events",
        "n_censored",
        "logsurv_micro",
        F.when(hit_zero, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("logsurv_micro") / F.lit(1e6)), round_to))
        .alias("survival"),
    )


def two_proportion_test(
    df: DataFrame,
    group_col: str,
    success_col: str,
    group_a,
    group_b,
    z_crit_milli: int = 1960,
    round_to: int = 6,
) -> DataFrame:
    """Two-proportion z-test (the A/B experiment staple): ONE row
    ``(n_a, x_a, n_b, x_b, rate_a, rate_b, rate_diff, z, significant)``
    comparing success rates between the two named groups under the
    pooled-variance normal approximation
    z = (p_a − p_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)).

    Exactness: counts are exact integers from one partial-agg pass;
    every derived value is a fixed double chain on those integers
    (divisions, one sqrt — correctly-rounded IEEE ops, the OLS/Pearson
    contract), rounded. ``significant`` compares |z| against
    ``z_crit_milli``/1000 (1960 = the two-sided 5% level) — an integer
    parameter so the threshold itself can't drift between engines.
    Degenerate inputs (either group empty, or pooled rate 0/1 giving
    zero variance) yield NULL z and significant=false, never a div/0."""
    s = F.col(success_col).cast("double")
    base = df.where(
        s.isNotNull() & F.col(group_col).isin([group_a, group_b])
    ).select(
        (F.col(group_col) == group_a).alias("_ga"), s.cast("long").alias("_y")
    )
    agg = base.agg(
        F.sum(F.col("_ga").cast("long")).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("_ga"), F.col("_y")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("x_a"),
        F.sum((~F.col("_ga")).cast("long")).cast("bigint").alias("n_b"),
        F.sum(F.when(~F.col("_ga"), F.col("_y")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("x_b"),
    )
    na, xa = F.col("n_a").cast("double"), F.col("x_a").cast("double")
    nb, xb = F.col("n_b").cast("double"), F.col("x_b").cast("double")
    pa, pb = xa / na, xb / nb
    pool = (xa + xb) / (na + nb)
    var = pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    z = (pa - pb) / F.sqrt(var)
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    zval = F.when(ok & (var > 0), z)
    return agg.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.round(F.when(ok, pa), round_to).alias("rate_a"),
        F.round(F.when(ok, pb), round_to).alias("rate_b"),
        F.round(F.when(ok, pa - pb), round_to).alias("rate_diff"),
        F.round(zval, round_to).alias("z"),
        F.coalesce(
            F.abs(zval) * 1000 > F.lit(float(z_crit_milli)), F.lit(False)
        ).alias("significant"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    quantum: int = 1_000_000,
    z_crit_milli: int = 1960,
    round_to: int = 6,
) -> DataFrame:
    """Mann–Whitney U rank-sum test (the nonparametric two-sample test
    — 'do these two groups draw from the same value distribution?'
    without normality assumptions; the location-shift companion to the
    KS drift check): ONE row ``(n_a, n_b, u, z, significant)`` with the
    normal approximation and FULL tie correction.

    Exactness (the roc_auc machinery — AUC·n_a·n_b IS U/…): values
    quantize to integer ``quantum``-ths; 2U = Σ_s n_a(s)·(2·cum_b<(s)
    + n_b(s)) sums in DECIMAL(38,0) over the bounded distinct-score
    table; the tie term Σ(t³−t) likewise (t³ needs DECIMAL — a
    10⁹-row tie cubes past BIGINT); z = (U − n_a·n_b/2)/√var with
    var = (n_a·n_b/12)·(n+1 − Σ(t³−t)/(n(n−1))) — a fixed double
    chain with one IEEE sqrt. All-tied input → zero variance → NULL z,
    significant false."""
    base = df.where(
        F.col(value_col).isNotNull() & F.col(group_col).isin([group_a, group_b])
    ).select(
        F.floor(F.col(value_col).cast("double") * F.lit(quantum))
        .cast("bigint")
        .alias("_s"),
        (F.col(group_col) == group_a).cast("long").alias("_a"),
    )
    g = base.groupBy("_s").agg(
        F.sum("_a").cast("decimal(38,0)").alias("_na"),
        F.sum(F.lit(1) - F.col("_a")).cast("decimal(38,0)").alias("_nb"),
    )
    below = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    two_u = F.col("_na") * (
        F.lit(2) * F.coalesce(F.sum("_nb").over(below), F.lit(0).cast("decimal(38,0)"))
        + F.col("_nb")
    )
    t = F.col("_na") + F.col("_nb")
    ties = t * t * t - t
    agg = g.select("_na", "_nb", two_u.alias("_2u"), ties.alias("_t3")).agg(
        F.sum("_na").alias("na"),
        F.sum("_nb").alias("nb"),
        F.sum("_2u").alias("u2"),
        F.sum("_t3").alias("t3"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    n = na + nb
    u = F.col("u2").cast("double") / F.lit(2.0)
    var = (
        na
        * nb
        / F.lit(12.0)
        * ((n + F.lit(1.0)) - F.col("t3").cast("double") / (n * (n - F.lit(1.0))))
    )
    ok = (F.col("na") > 0) & (F.col("nb") > 0) & (n > 1)
    z = F.when(ok & (var > 0), (u - na * nb / F.lit(2.0)) / F.sqrt(var))
    return agg.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round(u, round_to).alias("u"),
        F.round(z, round_to).alias("z"),
        F.coalesce(
            F.abs(z) * 1000 > F.lit(float(z_crit_milli)), F.lit(False)
        ).alias("significant"),
    )


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
    quantum: int = 1_000_000,
    round_to: int = 6,
) -> DataFrame:
    """Kruskal–Wallis H test — the k-group generalization of
    :func:`mann_whitney_u` ('do ANY of these groups draw from a shifted
    distribution?'), with average-rank ties and the standard tie
    correction: ONE row ``(n, n_groups, h, h_corrected, df)``; compare
    ``h_corrected`` against the chi-square(k−1) critical value of your
    chosen level (the statistic is emitted rather than a verdict — k
    varies, so no single integer critical value can ship with the
    operator).

    Exactness: values quantize to integer ``quantum``-ths; average
    ranks per DISTINCT value are exact halves (2·avgrank = 2·cum_below
    + t + 1, an integer), so per-group rank sums 2R_g = Σ n_g(s)·
    (2·avgrank) are exact DECIMAL(38,0) integers over the bounded
    distinct-value grid; H = 12/(n(n+1))·Σ R_g²/n_g − 3(n+1) and the
    tie divisor 1 − Σ(t³−t)/(n³−n) are fixed double chains on those.
    Scale shape: one (value, group) groupBy, one bounded ordered window
    over distinct values, one k-row aggregate; NULL value/group rows
    are dropped; a single group or all-tied input yields NULL h."""
    base = df.where(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.floor(F.col(value_col).cast("double") * F.lit(quantum))
        .cast("bigint")
        .alias("_s"),
        F.col(group_col).alias("_g"),
    )
    cell = base.groupBy("_s", "_g").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_c")
    )
    per_s = cell.groupBy("_s").agg(F.sum("_c").alias("_t"))
    below = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_s.withColumn(
        "_cum",
        F.coalesce(F.sum("_t").over(below), F.lit(0).cast("decimal(38,0)")),
    ).select(
        "_s",
        "_t",
        (F.lit(2) * F.col("_cum") + F.col("_t") + F.lit(1)).alias("_2ar"),
        (F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t")).alias("_t3"),
    )
    j = cell.join(ranked, "_s")
    per_g = j.groupBy("_g").agg(
        F.sum("_c").alias("_ng"),
        F.sum(F.col("_c") * F.col("_2ar")).alias("_2rg"),
    )
    ties = ranked.agg(F.sum("_t3").alias("t3"), F.sum("_t").alias("nn"))
    agg = per_g.agg(
        F.sum("_ng").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(
            (F.col("_2rg") * F.col("_2rg")).cast("double")
            / (F.lit(4.0) * F.col("_ng").cast("double"))
        ).alias("_sr2"),
    ).crossJoin(ties)
    n = F.col("n").cast("double")
    h = F.lit(12.0) / (n * (n + F.lit(1.0))) * F.col("_sr2") - F.lit(3.0) * (
        n + F.lit(1.0)
    )
    corr = F.lit(1.0) - F.col("t3").cast("double") / (n * n * n - n)
    ok = (F.col("n_groups") >= 2) & (n > 1) & (corr > 0)
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        "n_groups",
        F.round(F.when(ok, h), round_to).alias("h"),
        F.round(F.when(ok, h / corr), round_to).alias("h_corrected"),
        (F.col("n_groups") - 1).cast("int").alias("df"),
    )


def mann_whitney_one_vs_rest(
    df: DataFrame,
    value_col: str,
    group_col: str,
    quantum: int = 1_000_000,
    z_crit_milli: int = 1960,
    round_to: int = 6,
) -> DataFrame:
    """The drill-down for a fired :func:`kruskal_wallis`: WHICH group
    shifted? One :func:`mann_whitney_u` per group against its
    complement, all served from ONE shared distinct-value lattice —
    never a per-group corpus scan. Returns per group:
    ``(group, n_a, n_b, u, z, significant)`` (a = the group, b = the
    rest; positive z = the group's values rank higher).

    Machinery: the (value, group) cell table joins the per-value totals
    into a groups × distinct-values lattice (bounded by G·S, the
    roc_auc contract per group), rest counts are totals − own, and each
    group's cumulative-rest window rides ONE (group, value) ordering.
    Tie variance uses the POOLED tie term (ties are a property of the
    value multiset, shared by every one-vs-rest split). Exact DECIMAL
    sums; one fixed chain + sqrt per group row."""
    base = df.where(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.floor(F.col(value_col).cast("double") * F.lit(quantum))
        .cast("bigint")
        .alias("_s"),
        F.col(group_col).alias("_g"),
    )
    cell = base.groupBy("_s", "_g").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_c")
    )
    tot = cell.groupBy("_s").agg(F.sum("_c").alias("_t"))
    groups = cell.select("_g").distinct()
    lattice = (
        tot.crossJoin(groups)
        .join(cell, ["_s", "_g"], "left")
        .select(
            "_s",
            "_g",
            F.coalesce("_c", F.lit(0).cast("decimal(38,0)")).alias("_c"),
            "_t",
        )
        .withColumn("_r", F.col("_t") - F.col("_c"))
    )
    w = Window.partitionBy("_g").orderBy("_s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    scored = lattice.withColumn(
        "_cumr", F.coalesce(F.sum("_r").over(w), F.lit(0).cast("decimal(38,0)"))
    )
    two_u = F.col("_c") * (F.lit(2) * F.col("_cumr") + F.col("_r"))
    per_g = scored.groupBy("_g").agg(
        F.sum("_c").alias("na"),
        F.sum("_r").alias("nb"),
        F.sum(two_u).alias("u2"),
    )
    ties = tot.agg(
        F.sum(F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t")).alias("t3")
    )
    j = per_g.crossJoin(F.broadcast(ties))
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    n = na + nb
    u = F.col("u2").cast("double") / F.lit(2.0)
    var = (
        na
        * nb
        / F.lit(12.0)
        * ((n + F.lit(1.0)) - F.col("t3").cast("double") / (n * (n - F.lit(1.0))))
    )
    ok = (F.col("na") > 0) & (F.col("nb") > 0) & (n > 1)
    z = F.when(ok & (var > 0), (u - na * nb / F.lit(2.0)) / F.sqrt(var))
    return j.select(
        F.col("_g").alias(group_col),
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round(u, round_to).alias("u"),
        F.round(z, round_to).alias("z"),
        F.coalesce(
            F.abs(z) * 1000 > F.lit(float(z_crit_milli)), F.lit(False)
        ).alias("significant"),
    )


# Zelen & Severo (Abramowitz & Stegun 26.2.17) normal-CDF polynomial
# constants — fixed double literals so BOTH engines evaluate the exact
# same IEEE chain (the repo's fixed-chain contract; |error| < 7.5e-8,
# far inside the 6dp rounding).
_NORM_T = 0.2316419
_NORM_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_INV_SQRT_2PI = 0.3989422804014327


def _p_two_sided(z):
    """Two-sided normal p-value from a z column via the A&S 26.2.17
    polynomial — exp + multiply/add only, so the double chain is
    bit-identical across engines. Clamped to 1 (z=0 overshoots by 9e-10)."""
    az = F.abs(z)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_NORM_T) * az)
    b1, b2, b3, b4, b5 = (F.lit(c) for c in _NORM_B)
    poly = t * (b1 + t * (b2 + t * (b3 + t * (b4 + t * b5))))
    pdf = F.exp(-(az * az) / F.lit(2.0)) * F.lit(_INV_SQRT_2PI)
    return F.least(F.lit(1.0), F.lit(2.0) * pdf * poly)


def _p_two_sided_sql(z: str) -> str:
    """The DuckDB rendering of :func:`_p_two_sided` — same literals,
    same nesting, same operator order."""
    b1, b2, b3, b4, b5 = _NORM_B
    az = f"abs({z})"
    t = f"(1.0 / (1.0 + {_NORM_T} * {az}))"
    poly = f"({t} * ({b1} + {t} * ({b2} + {t} * ({b3} + {t} * ({b4} + {t} * {b5})))))"
    pdf = f"(exp(-({az} * {az}) / 2.0) * {_INV_SQRT_2PI})"
    return f"least(1.0, 2.0 * {pdf} * {poly})"


def bh_fdr(
    df: DataFrame,
    id_col: str,
    z_col: str = "z",
    alpha_micro: int = 50_000,
    round_to: int = 6,
) -> DataFrame:
    """Benjamini–Hochberg step-up FDR correction (Benjamini & Hochberg
    1995) over a table of per-segment test results — the missing piece
    once the drill-downs fan out: ``mann_whitney_one_vs_rest`` /
    ``two_proportion_test`` fire one z per segment, and at 50 segments
    a 5% per-test gate pages ~2.5 times on pure noise. BH instead
    bounds the expected fraction of false alarms among the alarms:
    sort the m p-values ascending, find the largest rank i with
    p_i ≤ i·α/m, reject hypotheses 1..i.

    Input: one row per hypothesis with an ``id_col`` (segment name) and
    a ``z_col`` (a ROUNDED z from any upstream analyzer — rounding
    first is what makes the downstream p identical cross-engine).
    Output per row: ``(id, z, p_value, bh_rank, bh_crit, rejected)``.

    Scale shape: ONE global window sort over the HYPOTHESIS table —
    bounded by the number of segments under test (the upstream
    analyzers' G·S lattice contract), never corpus-sized. NULL z rows
    (degenerate segments) are carried through with NULL p and
    rejected=false, and do NOT count toward m. The step-up compare is
    cross-multiplied (p·m·10⁶ ≤ i·α_micro) so the threshold is an
    integer parameter that cannot drift between engines. Ties on p
    break by id for a total order.

    Reference scope note: eliassona/xmlschemavalidator has no
    dataset-level testing layer (core.clj:263-285 stops at per-record
    valid?); north-rule addition in the checks/stats.py analyzer style.
    """
    z = F.col(z_col).cast("double")
    p = F.when(z.isNotNull(), _p_two_sided(z))
    base = df.select(F.col(id_col), z.alias("_z"), p.alias("_p"))
    w_rank = Window.orderBy(F.asc_nulls_last("_p"), F.col(id_col))
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = base.select(
        F.col(id_col),
        "_z",
        "_p",
        F.when(F.col("_p").isNotNull(), F.row_number().over(w_rank))
        .cast("bigint")
        .alias("_i"),
        F.count("_p").over(w_all).cast("bigint").alias("_m"),
    )
    passes = (
        F.col("_p") * F.col("_m").cast("double") * F.lit(1_000_000.0)
        <= F.col("_i").cast("double") * F.lit(float(alpha_micro))
    )
    cut = ranked.withColumn(
        "_cut", F.max(F.when(passes, F.col("_i"))).over(w_all)
    )
    return cut.select(
        F.col(id_col),
        F.round("_z", round_to).alias("z"),
        F.round("_p", round_to).alias("p_value"),
        F.col("_i").alias("bh_rank"),
        F.round(
            F.col("_i").cast("double")
            * F.lit(float(alpha_micro))
            / (F.col("_m").cast("double") * F.lit(1_000_000.0)),
            round_to,
        ).alias("bh_crit"),
        F.coalesce(F.col("_i") <= F.col("_cut"), F.lit(False)).alias("rejected"),
    )


def ks_exact(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    quantum: int = 1_000_000,
    round_to: int = 6,
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic — the binned
    :func:`~xmlschemavalidator_spark.checks.drift.ks_drift` compares
    histogram CDFs (bucket-width-limited); this computes the true
    D = max_v |F_a(v) − F_b(v)| over the shared quantized value lattice
    (the MWU/roc_auc device), with the supremum reached AT a data value
    by right-continuity — no bucketing error at all.

    ONE row ``(n_a, n_b, d_stat, d_at_value, significant)``:
    ``d_at_value`` is the smallest lattice value attaining the supremum
    (the WHERE of the drift, not just its size), and ``significant``
    applies the large-sample two-sided 5% threshold
    D > 1.358·√((n_a+n_b)/(n_a·n_b)) with 1358 an integer-milli
    constant.

    Exactness: the ECDF difference is kept as the cross-multiplied
    integer |cumA·n_b − cumB·n_a| (DECIMAL) — D materializes as ONE
    double division of the max; the argmax value is rank-selected
    deterministically. Lattice-bounded like every rank analyzer; NULLs
    and foreign groups excluded."""
    base = df.where(
        F.col(value_col).isNotNull() & F.col(group_col).isin([group_a, group_b])
    ).select(
        F.floor(F.col(value_col).cast("double") * F.lit(quantum))
        .cast("bigint")
        .alias("_s"),
        (F.col(group_col) == group_a).alias("_ga"),
    )
    cell = base.groupBy("_s").agg(
        F.sum(F.col("_ga").cast("long")).cast("decimal(38,0)").alias("_ca"),
        F.sum((~F.col("_ga")).cast("long")).cast("decimal(38,0)").alias("_cb"),
    )
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = cell.select(
        "_s",
        F.sum("_ca").over(w).alias("_cuma"),
        F.sum("_cb").over(w).alias("_cumb"),
        F.sum("_ca").over(wa).alias("_na"),
        F.sum("_cb").over(wa).alias("_nb"),
    )
    diff = F.abs(F.col("_cuma") * F.col("_nb") - F.col("_cumb") * F.col("_na"))
    scored = cum.select("_s", "_na", "_nb", diff.alias("_d"))
    ranked = scored.select(
        "*",
        F.max("_d").over(wa).alias("_dmax"),
        F.row_number()
        .over(Window.orderBy(F.col("_d").desc(), F.col("_s"))).alias("_rn"),
    ).where(F.col("_rn") == 1)
    na, nb = F.col("_na").cast("double"), F.col("_nb").cast("double")
    d = F.col("_dmax").cast("double") / (na * nb)
    ok = (F.col("_na") > 0) & (F.col("_nb") > 0)
    crit = F.lit(1.358) * F.sqrt((na + nb) / (na * nb))
    return ranked.select(
        F.col("_na").cast("bigint").alias("n_a"),
        F.col("_nb").cast("bigint").alias("n_b"),
        F.round(F.when(ok, d), round_to).alias("d_stat"),
        F.col("_s").alias("d_at_value"),
        F.coalesce(F.when(ok, d > crit), F.lit(False)).alias("significant"),
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimate (Nelson 1972 / Aalen
    1978) — Kaplan–Meier's additive sibling: ``H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ``
    over the same right-censored risk sets. Preferred when hazard is
    the question (failure INTENSITY over time: crawl-error burn rate,
    churn pressure) and for small risk sets where the product-limit
    gets grainy; ``S ≈ exp(−H)`` recovers survival.

    One row per distinct duration with >= 1 event: ``(*group_cols, t,
    n_risk, n_events, n_censored, hazard_inc_micro,
    cum_hazard_micro)``.

    Exactness: STRICTLY stronger than :func:`kaplan_meier`'s — each
    increment dᵢ/nᵢ is an exact BIGINT rational floor-quantized to
    integer micros, and the cumulative sum is an ordered INTEGER sum:
    no ln, no libm contract at all, bias bounded by #event-times·1e−6.
    Same tie rule (censoring leaves the risk set after same-t events),
    same scale shape (one duration groupBy + expanding window over the
    bounded distinct-duration grid).
    """
    gc = list(group_cols)
    lab = F.col(observed_col).cast("boolean")
    base = df.where(
        F.col(duration_col).isNotNull() & lab.isNotNull()
    ).select(
        *[F.col(c) for c in gc],
        F.col(duration_col).cast("bigint").alias("t"),
        lab.cast("long").alias("_e"),
    )
    g = base.groupBy(*gc, "t").agg(
        F.sum("_e").cast("bigint").alias("n_events"),
        F.sum(F.lit(1) - F.col("_e")).cast("bigint").alias("n_censored"),
        F.count(F.lit(1)).cast("bigint").alias("_n"),
    )
    wtail = Window.partitionBy(*gc).orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    g2 = g.withColumn("n_risk", F.sum("_n").over(wtail).cast("bigint"))
    wcum = Window.partitionBy(*gc).orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        g2.where(F.col("n_events") > 0)
        .withColumn(
            "hazard_inc_micro",
            F.expr("n_events * 1000000 div n_risk").cast("bigint"),
        )
        .withColumn(
            "cum_hazard_micro",
            F.sum("hazard_inc_micro").over(wcum).cast("bigint"),
        )
        .select(
            *gc, "t", "n_risk", "n_events", "n_censored",
            "hazard_inc_micro", "cum_hazard_micro",
        )
    )


def brier_decomposition(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Brier score + Murphy (1973) decomposition over the same binning
    as :func:`calibration_report`: one row ``(n, brier, reliability,
    resolution, uncertainty, residual)`` —

    * brier       = (1/N) Σ (p_i − y_i)²          (raw, unbinned)
    * reliability = (1/N) Σ_b n_b (conf_b − acc_b)²   (miscalibration)
    * resolution  = (1/N) Σ_b n_b (acc_b − ȳ)²    (how much the bins
      separate outcomes — the term a sharper model grows)
    * uncertainty = ȳ(1 − ȳ)                      (the data's own)
    * residual    = brier − (rel − res + unc): the within-bin terms of
      continuous forecasts (variance − 2·covariance, Stephenson et
      al.'s generalized decomposition — sign-indefinite) — the
      three-term decomposition is exact only for bin-constant
      forecasts, so the residual is REPORTED rather than hidden.

    Exactness: probabilities quantize to integer micros; the raw Brier
    numerator Σ(p_micro − 1e6·y)² is an exact DECIMAL(38,0) sum. The
    per-bin reliability/resolution terms are fixed double chains on
    exact per-bin integer sums, FLOOR-quantized to integer picos and
    summed in DECIMAL — order-independent across partitions/engines
    (the float-sum reordering rule), at a 1e-12 quantization cost far
    below the 6 dp output rounding.

    Scale shape: ONE corpus scan into an n_bins-row aggregate; the
    global row joins back via a broadcast of one row. Nothing grows
    with corpus size.
    """
    if n_bins < 1:
        raise ValueError(f"brier_decomposition: n_bins={n_bins}")
    lab = F.col(label_col).cast("boolean")
    micro = F.floor(F.col(prob_col).cast("double") * F.lit(1_000_000)).cast("bigint")
    micro = F.least(F.greatest(micro, F.lit(0)), F.lit(1_000_000))
    y6 = F.col("_y") * F.lit(1_000_000)
    base = df.where(F.col(prob_col).isNotNull() & lab.isNotNull()).select(
        F.least(
            F.floor(micro * F.lit(n_bins) / F.lit(1_000_000)).cast("bigint"),
            F.lit(n_bins - 1).cast("bigint"),
        ).alias("bin"),
        micro.alias("_p"),
        lab.cast("long").alias("_y"),
    )
    bins = base.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(F.col("_p").cast("decimal(38,0)")).alias("_sp"),
        F.sum(F.col("_y").cast("decimal(38,0)")).alias("_sy"),
        F.sum(
            ((F.col("_p") - y6) * (F.col("_p") - y6)).cast("decimal(38,0)")
        ).alias("_sq"),
    )
    glob = bins.agg(
        F.sum("_n").cast("bigint").alias("_N"),
        F.sum("_sy").alias("_SY"),
        F.sum("_sq").alias("_SQ"),
    )
    b2 = bins.alias("b").crossJoin(F.broadcast(glob.alias("g")))
    nd = F.col("b._n").cast("double")
    gap = F.col("b._sp").cast("double") - F.col("b._sy").cast("double") * F.lit(1e6)
    rel_term = gap * gap / (nd * F.lit(1e12))
    accd = F.col("b._sy").cast("double") / nd
    ybar = F.col("g._SY").cast("double") / F.col("g._N").cast("double")
    res_term = nd * (accd - ybar) * (accd - ybar)
    agg = b2.select(
        F.col("g._N").alias("_N"),
        F.col("g._SY").alias("_SY"),
        F.col("g._SQ").alias("_SQ"),
        F.floor(rel_term * F.lit(1e12)).cast("decimal(38,0)").alias("_relp"),
        F.floor(res_term * F.lit(1e12)).cast("decimal(38,0)").alias("_resp"),
    ).groupBy("_N", "_SY", "_SQ").agg(
        F.sum("_relp").alias("_rel"), F.sum("_resp").alias("_res")
    )
    Nd = F.col("_N").cast("double")
    brier = F.col("_SQ").cast("double") / (Nd * F.lit(1e12))
    rel = F.col("_rel").cast("double") / F.lit(1e12) / Nd
    res = F.col("_res").cast("double") / F.lit(1e12) / Nd
    syd = F.col("_SY").cast("double")
    unc = syd * (Nd - syd) / (Nd * Nd)
    return agg.select(
        F.col("_N").alias("n"),
        F.round(brier, round_to).alias("brier"),
        F.round(rel, round_to).alias("reliability"),
        F.round(res, round_to).alias("resolution"),
        F.round(unc, round_to).alias("uncertainty"),
        F.round(brier - (rel - res + unc), round_to).alias("residual"),
    )


def brier_oracle_sql(
    from_sql: str,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`brier_decomposition` — same micro/pico
    quantization, same fixed double chains."""
    return f"""WITH src AS ({from_sql}),
base AS (SELECT least(CAST(floor(least(greatest(CAST(floor(
                  CAST({prob_col} AS DOUBLE) * 1000000) AS BIGINT), 0),
                  1000000) * {n_bins} / 1000000.0) AS BIGINT),
                  {n_bins - 1}) AS bin,
                least(greatest(CAST(floor(CAST({prob_col} AS DOUBLE)
                  * 1000000) AS BIGINT), 0), 1000000) AS p,
                CAST(CAST({label_col} AS BOOLEAN) AS BIGINT) AS y
         FROM src
         WHERE {prob_col} IS NOT NULL AND {label_col} IS NOT NULL),
bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(p) AS HUGEINT) AS sp,
                CAST(sum(y) AS HUGEINT) AS sy,
                CAST(sum(CAST(p - y * 1000000 AS HUGEINT)
                         * CAST(p - y * 1000000 AS HUGEINT)) AS HUGEINT) AS sq
         FROM base GROUP BY bin),
gtot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(sy) AS HUGEINT) AS gsy,
                CAST(sum(sq) AS HUGEINT) AS gsq
         FROM bins),
terms AS (SELECT b.n, b.sp, b.sy, g.nn, g.gsy, g.gsq,
       CAST(floor((CAST(b.sp AS DOUBLE) - CAST(b.sy AS DOUBLE) * 1e6)
            * (CAST(b.sp AS DOUBLE) - CAST(b.sy AS DOUBLE) * 1e6)
            / (CAST(b.n AS DOUBLE) * 1e12) * 1e12) AS HUGEINT) AS relp,
       CAST(floor(CAST(b.n AS DOUBLE)
            * (CAST(b.sy AS DOUBLE) / CAST(b.n AS DOUBLE)
               - CAST(g.gsy AS DOUBLE) / CAST(g.nn AS DOUBLE))
            * (CAST(b.sy AS DOUBLE) / CAST(b.n AS DOUBLE)
               - CAST(g.gsy AS DOUBLE) / CAST(g.nn AS DOUBLE))
            * 1e12) AS HUGEINT) AS resp
    FROM bins b CROSS JOIN gtot g),
agg AS (SELECT nn, gsy, gsq, CAST(sum(relp) AS HUGEINT) AS rel,
               CAST(sum(resp) AS HUGEINT) AS res
        FROM terms GROUP BY nn, gsy, gsq)
SELECT nn AS n,
  round(CAST(gsq AS DOUBLE) / (CAST(nn AS DOUBLE) * 1e12), {round_to})
      AS brier,
  round(CAST(rel AS DOUBLE) / 1e12 / CAST(nn AS DOUBLE), {round_to})
      AS reliability,
  round(CAST(res AS DOUBLE) / 1e12 / CAST(nn AS DOUBLE), {round_to})
      AS resolution,
  round(CAST(gsy AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(gsy AS DOUBLE))
        / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)), {round_to})
      AS uncertainty,
  round(CAST(gsq AS DOUBLE) / (CAST(nn AS DOUBLE) * 1e12)
        - (CAST(rel AS DOUBLE) / 1e12 / CAST(nn AS DOUBLE)
           - CAST(res AS DOUBLE) / 1e12 / CAST(nn AS DOUBLE)
           + CAST(gsy AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(gsy AS DOUBLE))
             / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))), {round_to})
      AS residual
FROM agg"""


def mcnemar_test(
    df: DataFrame,
    a_col: str,
    b_col: str,
    chi2_crit_milli: int = 3841,
    round_to: int = 6,
) -> DataFrame:
    """McNemar's paired test (McNemar 1947) between two boolean verdicts
    on the SAME rows — the question the two-proportion z-test gets wrong
    on paired data: "did swapping rule A for rule B significantly change
    the pass rate", answered from only the docs that FLIPPED. ONE row
    ``(n, n_both_pass, n_a_only, n_b_only, n_both_fail, rate_a, rate_b,
    chi2, p, significant)`` with the continuity-corrected statistic

        chi2 = (max(|n_a_only − n_b_only| − 1, 0))² / (n_a_only + n_b_only)

    (the Edwards correction, CLAMPED at 0 so a perfectly symmetric flip
    table reads 0 rather than the nonsensical 1/(b+c) the unclamped form
    gives), df = 1, p = two-sided normal tail of √chi2 via the shared
    A&S polynomial. The concordant cells carry NO information about the
    marginal change and are reported but never enter the statistic —
    which is exactly why a million agreeing docs can't drown out 40
    flips the way they do in an unpaired test.

    Exactness: four exact integer cell counts from one partial-agg pass;
    chi2 is one integer-ratio double, p a fixed exp/multiply chain —
    identical across engines. ``significant`` compares chi2·1000 against
    the integer ``chi2_crit_milli`` (3841 = the 5% point of chi²(1)).
    A flip-free table (n_a_only = n_b_only = 0) yields NULL chi2/p and
    significant=false, never a div/0.

    Scale shape: one scan, one partial+final aggregate of four sums —
    a single-row reduction; nothing grows with corpus size.
    """
    a = F.col(a_col).cast("boolean")
    b = F.col(b_col).cast("boolean")
    base = df.where(a.isNotNull() & b.isNotNull()).select(
        a.alias("_a"), b.alias("_b")
    )
    agg = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("_a") & F.col("_b")).cast("long"))
        .cast("bigint")
        .alias("n_both_pass"),
        F.sum((F.col("_a") & ~F.col("_b")).cast("long"))
        .cast("bigint")
        .alias("n_a_only"),
        F.sum((~F.col("_a") & F.col("_b")).cast("long"))
        .cast("bigint")
        .alias("n_b_only"),
        F.sum((~F.col("_a") & ~F.col("_b")).cast("long"))
        .cast("bigint")
        .alias("n_both_fail"),
    )
    nd = F.col("n").cast("double")
    disc = (F.col("n_a_only") + F.col("n_b_only")).cast("double")
    diff = F.greatest(
        F.abs(F.col("n_a_only") - F.col("n_b_only")).cast("double") - F.lit(1.0),
        F.lit(0.0),
    )
    chi2 = F.when(disc > 0, diff * diff / disc)
    return agg.select(
        "n",
        "n_both_pass",
        "n_a_only",
        "n_b_only",
        "n_both_fail",
        F.round(
            F.when(
                F.col("n") > 0,
                (F.col("n_both_pass") + F.col("n_a_only")).cast("double") / nd,
            ),
            round_to,
        ).alias("rate_a"),
        F.round(
            F.when(
                F.col("n") > 0,
                (F.col("n_both_pass") + F.col("n_b_only")).cast("double") / nd,
            ),
            round_to,
        ).alias("rate_b"),
        F.round(chi2, round_to).alias("chi2"),
        # explicit gate: least() SKIPS nulls in both engines, so an un-
        # gated _p_two_sided(NULL) would collapse to 1.0 instead of NULL
        F.round(
            F.when(disc > 0, _p_two_sided(F.sqrt(chi2))), round_to
        ).alias("p"),
        F.coalesce(
            chi2 * 1000 > F.lit(float(chi2_crit_milli)), F.lit(False)
        ).alias("significant"),
    )


def mcnemar_oracle_sql(
    from_sql: str,
    chi2_crit_milli: int = 3841,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`mcnemar_test`; ``from_sql`` must yield
    boolean columns ``a`` and ``b`` (nulls pre-filtered or filterable)."""
    chi2 = (
        "(CASE WHEN n_a_only + n_b_only > 0 THEN"
        " greatest(abs(CAST(n_a_only AS DOUBLE) - CAST(n_b_only AS DOUBLE))"
        " - 1.0, 0.0) * greatest(abs(CAST(n_a_only AS DOUBLE)"
        " - CAST(n_b_only AS DOUBLE)) - 1.0, 0.0)"
        " / CAST(n_a_only + n_b_only AS DOUBLE) END)"
    )
    p = (
        f"(CASE WHEN n_a_only + n_b_only > 0 THEN "
        f"{_p_two_sided_sql(f'sqrt({chi2})')} END)"
    )
    return f"""WITH src AS ({from_sql}),
cells AS (SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_both_pass,
    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_a_only,
    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_b_only,
    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
        AS n_both_fail
  FROM src WHERE a IS NOT NULL AND b IS NOT NULL)
SELECT n, n_both_pass, n_a_only, n_b_only, n_both_fail,
  round(CASE WHEN n > 0 THEN CAST(n_both_pass + n_a_only AS DOUBLE)
        / CAST(n AS DOUBLE) END, {round_to}) AS rate_a,
  round(CASE WHEN n > 0 THEN CAST(n_both_pass + n_b_only AS DOUBLE)
        / CAST(n AS DOUBLE) END, {round_to}) AS rate_b,
  round({chi2}, {round_to}) AS chi2,
  round({p}, {round_to}) AS p,
  coalesce({chi2} * 1000 > {chi2_crit_milli}, FALSE) AS significant
FROM cells"""


def logrank_test(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
    group_col: str,
    group_a,
    group_b,
    chi2_crit_milli: int = 3841,
    round_to: int = 6,
) -> DataFrame:
    """Log-rank test (Mantel 1966 / Peto & Peto 1972) between two
    right-censored survival cohorts — the significance verdict the
    kaplan_meier / nelson_aalen CURVES don't carry: "cohort B churns
    faster" needs more than two lines that look apart, it needs the
    hypergeometric null across the shared event-time grid. ONE row
    ``(n_a, n_b, n_events_a, n_events_b, o_minus_e, chi2, p,
    significant)`` where at each event time t (pooled):

        E_a(t) = d_t · n_at / n_t                  (expected A-events)
        V(t)   = d_t (n_at/n_t)(n_bt/n_t)(n_t−d_t)/(n_t−1)

    and chi2 = (Σ(d_at − E_a))² / ΣV, df = 1, p the shared A&S normal
    tail of √chi2. Censoring ties at t leave the risk set AFTER the
    events at t (the KM tie rule, same staging).

    Exactness: per-time terms are fixed double chains on exact BIGINT
    counts, rounded to 12 dp and summed in DECIMAL(20,12) — the
    kaplan_meier contract (order-free; the grid is distinct durations,
    so coarse-bucket continuous durations first). Single-event-time
    degenerate inputs with zero variance yield NULL chi2/p and
    significant=false, never a div/0; n_t = 1 time points carry zero
    variance and zero O−E by construction (d_at − E_a = 0 when only one
    subject remains and it's the event).

    Scale shape: one scan into a (group × distinct-duration) aggregate,
    one tail-window for risk sets, a 1-row reduction — the
    kaplan_meier plan with the two cohorts pivoted side by side.
    """
    lab = F.col(observed_col).cast("boolean")
    isa = F.col(group_col) == group_a
    base = df.where(
        F.col(duration_col).isNotNull()
        & lab.isNotNull()
        & F.col(group_col).isin([group_a, group_b])
    ).select(
        F.col(duration_col).cast("bigint").alias("t"),
        isa.alias("_ga"),
        lab.cast("long").alias("_e"),
    )
    g = base.groupBy("t").agg(
        F.sum(F.when(F.col("_ga"), F.col("_e")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("_da"),
        F.sum(F.when(~F.col("_ga"), F.col("_e")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("_db"),
        F.sum(F.col("_ga").cast("long")).cast("bigint").alias("_na"),
        F.sum((~F.col("_ga")).cast("long")).cast("bigint").alias("_nb"),
    )
    wtail = Window.orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    r = (
        g.withColumn("_ra", F.sum("_na").over(wtail).cast("bigint"))
        .withColumn("_rb", F.sum("_nb").over(wtail).cast("bigint"))
        .where(F.col("_da") + F.col("_db") > 0)
    )
    nt = (F.col("_ra") + F.col("_rb")).cast("double")
    dt = (F.col("_da") + F.col("_db")).cast("double")
    ea = dt * F.col("_ra").cast("double") / nt
    v = F.when(
        F.col("_ra") + F.col("_rb") > 1,
        dt
        * (F.col("_ra").cast("double") / nt)
        * (F.col("_rb").cast("double") / nt)
        * ((nt - dt) / (nt - F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    terms = r.select(
        "_da",
        "_db",
        F.round(F.col("_da").cast("double") - ea, 12)
        .cast("decimal(20,12)")
        .alias("_ome"),
        F.round(v, 12).cast("decimal(20,12)").alias("_v"),
    )
    tot = base.agg(
        F.sum(F.col("_ga").cast("long")).cast("bigint").alias("n_a"),
        F.sum((~F.col("_ga")).cast("long")).cast("bigint").alias("n_b"),
    )
    agg = terms.agg(
        F.coalesce(F.sum("_da"), F.lit(0)).cast("bigint").alias("n_events_a"),
        F.coalesce(F.sum("_db"), F.lit(0)).cast("bigint").alias("n_events_b"),
        F.coalesce(F.sum("_ome"), F.lit(0).cast("decimal(20,12)")).alias("_o"),
        F.coalesce(F.sum("_v"), F.lit(0).cast("decimal(20,12)")).alias("_vv"),
    )
    out = tot.crossJoin(F.broadcast(agg))
    od = F.col("_o").cast("double")
    vd = F.col("_vv").cast("double")
    chi2 = F.when(vd > 0, od * od / vd)
    return out.select(
        "n_a",
        "n_b",
        "n_events_a",
        "n_events_b",
        F.round(od, round_to).alias("o_minus_e"),
        F.round(chi2, round_to).alias("chi2"),
        F.round(F.when(vd > 0, _p_two_sided(F.sqrt(chi2))), round_to).alias("p"),
        F.coalesce(
            chi2 * 1000 > F.lit(float(chi2_crit_milli)), F.lit(False)
        ).alias("significant"),
    )


def logrank_oracle_sql(
    from_sql: str,
    chi2_crit_milli: int = 3841,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`logrank_test`; ``from_sql`` must yield
    ``(t BIGINT, ga BOOLEAN, e BIGINT)`` rows (duration, is-group-A,
    observed 0/1), nulls pre-filtered."""
    chi2 = "(CASE WHEN vv > 0 THEN CAST(o AS DOUBLE) * CAST(o AS DOUBLE) / CAST(vv AS DOUBLE) END)"
    p = f"(CASE WHEN vv > 0 THEN {_p_two_sided_sql(f'sqrt({chi2})')} END)"
    return f"""WITH src AS ({from_sql}),
g AS (SELECT t,
        CAST(sum(CASE WHEN ga THEN e ELSE 0 END) AS BIGINT) AS da,
        CAST(sum(CASE WHEN ga THEN 0 ELSE e END) AS BIGINT) AS db,
        CAST(sum(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS na,
        CAST(sum(CASE WHEN ga THEN 0 ELSE 1 END) AS BIGINT) AS nb
      FROM src GROUP BY t),
r AS (SELECT *,
        CAST(sum(na) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND
             UNBOUNDED FOLLOWING) AS BIGINT) AS ra,
        CAST(sum(nb) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND
             UNBOUNDED FOLLOWING) AS BIGINT) AS rb
      FROM g),
terms AS (SELECT da, db,
    CAST(round(CAST(da AS DOUBLE)
         - CAST(da + db AS DOUBLE) * CAST(ra AS DOUBLE)
           / CAST(ra + rb AS DOUBLE), 12) AS DECIMAL(20,12)) AS ome,
    CAST(round(CASE WHEN ra + rb > 1 THEN
         CAST(da + db AS DOUBLE)
         * (CAST(ra AS DOUBLE) / CAST(ra + rb AS DOUBLE))
         * (CAST(rb AS DOUBLE) / CAST(ra + rb AS DOUBLE))
         * ((CAST(ra + rb AS DOUBLE) - CAST(da + db AS DOUBLE))
            / (CAST(ra + rb AS DOUBLE) - 1.0))
       ELSE 0.0 END, 12) AS DECIMAL(20,12)) AS v
   FROM r WHERE da + db > 0),
tot AS (SELECT CAST(sum(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN ga THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        FROM src),
agg AS (SELECT CAST(coalesce(sum(da), 0) AS BIGINT) AS n_events_a,
               CAST(coalesce(sum(db), 0) AS BIGINT) AS n_events_b,
               coalesce(sum(ome), CAST(0 AS DECIMAL(20,12))) AS o,
               coalesce(sum(v), CAST(0 AS DECIMAL(20,12))) AS vv
        FROM terms)
SELECT n_a, n_b, n_events_a, n_events_b,
  round(CAST(o AS DOUBLE), {round_to}) AS o_minus_e,
  round({chi2}, {round_to}) AS chi2,
  round({p}, {round_to}) AS p,
  coalesce({chi2} * 1000 > {chi2_crit_milli}, FALSE) AS significant
FROM tot, agg"""


def cochran_armitage(
    df: DataFrame,
    score_col: str,
    success_col: str,
    z_crit_milli: int = 1960,
    round_to: int = 6,
) -> DataFrame:
    """Cochran–Armitage trend test (Cochran 1954; Armitage 1955) for a
    binary outcome across ORDERED groups — the dose-response question
    the k-group chi² wastes power on by ignoring order: "does the
    violation rate RISE across quality terciles" is one directed df,
    not k−1 undirected ones. ``score_col`` is the integer group score
    (0,1,2,… — equally-spaced unless the caller encodes otherwise),
    ``success_col`` the boolean outcome. ONE row ``(n, x, n_groups,
    t_scaled, z, p, significant)``:

        T = Σᵢ sᵢ(xᵢ − nᵢ·p̄)        Var T = p̄(1−p̄)(Σsᵢ²nᵢ − (Σsᵢnᵢ)²/N)

    z = T/√Var, two-sided p via the shared A&S polynomial. The whole
    statistic collapses to FIVE integer sums (N, X, Σs·n, Σs·x, Σs²·n):
    ``t_scaled = N·Σsx − X·Σsn`` is the exact-integer numerator (= T·N,
    the hash-grade value) and z one fixed double chain on the five
    integers — no per-group table even materializes, so the test is a
    single partial+final aggregate at any corpus size.

    Degenerate inputs (all-success / all-failure p̄(1−p̄)=0, or a single
    score value making the score spread zero) yield NULL z/p and
    significant=false, never a div/0.
    """
    s = F.col(score_col).cast("long")
    y = F.col(success_col).cast("boolean")
    base = df.where(s.isNotNull() & y.isNotNull()).select(
        s.alias("_s"), y.cast("long").alias("_y")
    )
    d38 = "decimal(38,0)"
    agg = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_y").cast("bigint").alias("x"),
        F.count_distinct("_s").cast("bigint").alias("n_groups"),
        F.sum(F.col("_s").cast(d38)).alias("_sn"),
        F.sum((F.col("_s") * F.col("_y")).cast(d38)).alias("_sx"),
        F.sum((F.col("_s") * F.col("_s")).cast(d38)).alias("_ssn"),
    )
    nd = F.col("n").cast("double")
    xd = F.col("x").cast("double")
    t_scaled = F.expr(
        f"CAST(CAST(n AS {d38}) * _sx - CAST(x AS {d38}) * _sn AS {d38})"
    )
    pbar = xd / nd
    spread = F.col("_ssn").cast("double") - (
        F.col("_sn").cast("double") * F.col("_sn").cast("double") / nd
    )
    var = pbar * (F.lit(1.0) - pbar) * spread
    z = F.when(var > 0, F.col("_t").cast("double") / nd / F.sqrt(var))
    return agg.withColumn("_t", t_scaled).select(
        "n",
        "x",
        "n_groups",
        F.col("_t").cast("string").alias("t_scaled"),
        F.round(z, round_to).alias("z"),
        F.round(F.when(var > 0, _p_two_sided(z)), round_to).alias("p"),
        F.coalesce(
            F.abs(z) * 1000 > F.lit(float(z_crit_milli)), F.lit(False)
        ).alias("significant"),
    )


def cochran_armitage_oracle_sql(
    from_sql: str,
    z_crit_milli: int = 1960,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`cochran_armitage`; ``from_sql`` yields
    ``(s BIGINT, y BIGINT)`` score/outcome rows, nulls pre-filtered."""
    var = (
        "((CAST(x AS DOUBLE) / CAST(n AS DOUBLE))"
        " * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))"
        " * (CAST(ssn AS DOUBLE) - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)"
        " / CAST(n AS DOUBLE)))"
    )
    z = (
        f"(CASE WHEN {var} > 0 THEN CAST(t AS DOUBLE) / CAST(n AS DOUBLE)"
        f" / sqrt({var}) END)"
    )
    return f"""WITH src AS ({from_sql}),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS x,
               CAST(count(DISTINCT s) AS BIGINT) AS n_groups,
               CAST(sum(CAST(s AS HUGEINT)) AS HUGEINT) AS sn,
               CAST(sum(CAST(s AS HUGEINT) * y) AS HUGEINT) AS sx,
               CAST(sum(CAST(s AS HUGEINT) * s) AS HUGEINT) AS ssn
        FROM src),
tt AS (SELECT *, CAST(n AS HUGEINT) * sx - CAST(x AS HUGEINT) * sn AS t
       FROM agg)
SELECT n, x, n_groups,
  CAST(t AS VARCHAR) AS t_scaled,
  round({z}, {round_to}) AS z,
  round(CASE WHEN {var} > 0 THEN {_p_two_sided_sql(z)} END, {round_to}) AS p,
  coalesce(abs({z}) * 1000 > {z_crit_milli}, FALSE) AS significant
FROM tt"""


def cohens_kappa(
    df: DataFrame,
    a_col: str,
    b_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Cohen's κ inter-rater agreement (Cohen 1960) between two
    categorical verdict columns on the same rows — raw agreement
    corrected for CHANCE agreement, which is the correction that makes
    "93% agree" honest on skewed label distributions (two raters who
    both answer 'en' 90% of the time agree 82% by luck alone): one row
    ``(n, n_categories, po, pe, kappa)`` with

        κ = (p_o − p_e) / (1 − p_e),   p_e = Σ_c (row_c/N)(col_c/N).

    The annotation-QA read beside :func:`mcnemar_test` (McNemar asks
    "did B systematically FLIP relative to A" on binary verdicts; κ
    asks "do A and B agree beyond chance" on any label set) — the gate
    a trained classifier must pass against the heuristic it replaces,
    and a pair of human audit passes must pass against each other.
    Landis–Koch reading: ≥0.8 almost perfect, ≤0.2 slight.

    NULL is a category on both sides (a rater abstaining IS a verdict
    disagreement). κ is NULL when p_e = 1 (both raters constant —
    agreement is all chance, the statistic is undefined), never div/0.

    Exactness: p_o is an exact integer ratio; p_e sums per-category
    products of exact integer marginals in a fixed double chain rounded
    to 12 dp per term and DECIMAL-summed (order-free; bounded by
    #categories, not rows). One (a, b) cell groupBy — the
    mutual_information plan shape.
    """
    ac = F.coalesce(F.col(a_col).cast("string"), F.lit(" null")).alias("_a")
    bc = F.coalesce(F.col(b_col).cast("string"), F.lit(" null")).alias("_b")
    # p_e needs Σ_c row_c·col_c over the LABEL set, so marginals are
    # built per label (not per observed (a,b) cell — the (c,c) cell may
    # be absent while both marginals are positive)
    rows_ = (
        df.select(ac).groupBy("_a").agg(F.count(F.lit(1)).alias("_ra"))
    )
    cols_ = (
        df.select(bc).groupBy("_b").agg(F.count(F.lit(1)).alias("_cb"))
    )
    pe_terms = rows_.join(
        cols_, rows_["_a"] == cols_["_b"], "inner"
    ).select(
        F.round(
            F.col("_ra").cast("double") * F.col("_cb").cast("double"), 12
        ).cast("decimal(38,12)").alias("_rc")
    )
    pe_agg = pe_terms.agg(
        F.coalesce(F.sum("_rc"), F.lit(0).cast("decimal(38,12)")).alias("_pes")
    )
    po_agg = df.select(ac, bc).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("_a") == F.col("_b")).cast("long"))
        .cast("bigint")
        .alias("_agree"),
    )
    ncat = (
        df.select(ac).unionByName(df.select(bc.alias("_a")))
        .agg(F.count_distinct("_a").cast("bigint").alias("n_categories"))
    )
    out = po_agg.crossJoin(F.broadcast(pe_agg)).crossJoin(F.broadcast(ncat))
    nd = F.col("n").cast("double")
    po = F.col("_agree").cast("double") / nd
    pe = F.col("_pes").cast("double") / (nd * nd)
    kappa = F.when((F.col("n") > 0) & (pe < 1.0), (po - pe) / (F.lit(1.0) - pe))
    return out.select(
        "n",
        "n_categories",
        F.round(F.when(F.col("n") > 0, po), round_to).alias("po"),
        F.round(F.when(F.col("n") > 0, pe), round_to).alias("pe"),
        F.round(kappa, round_to).alias("kappa"),
    )


def cohens_kappa_oracle_sql(
    from_sql: str, a_col: str, b_col: str, round_to: int = 6
) -> str:
    """DuckDB replay of :func:`cohens_kappa`; same label-marginal join,
    same 12-dp pre-sum rounding."""
    return f"""WITH src0 AS ({from_sql}),
src AS (SELECT coalesce(CAST({a_col} AS VARCHAR), ' null') AS a,
               coalesce(CAST({b_col} AS VARCHAR), ' null') AS b
        FROM src0),
rows_ AS (SELECT a, count(*) AS ra FROM src GROUP BY a),
cols_ AS (SELECT b, count(*) AS cb FROM src GROUP BY b),
pe_terms AS (SELECT CAST(round(CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE), 12)
                    AS DECIMAL(38,12)) AS rc
             FROM rows_ JOIN cols_ ON rows_.a = cols_.b),
pe_agg AS (SELECT coalesce(sum(rc), CAST(0 AS DECIMAL(38,12))) AS pes
           FROM pe_terms),
po_agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
                      AS agree
           FROM src),
ncat AS (SELECT CAST(count(DISTINCT v) AS BIGINT) AS n_categories
         FROM (SELECT a AS v FROM src UNION ALL SELECT b FROM src))
SELECT n, n_categories,
  round(CASE WHEN n > 0 THEN CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) END,
        {round_to}) AS po,
  round(CASE WHEN n > 0 THEN CAST(pes AS DOUBLE)
        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) END, {round_to}) AS pe,
  round(CASE WHEN n > 0 AND CAST(pes AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < 1.0 THEN
      (CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
       - CAST(pes AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
      / (1.0 - CAST(pes AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
    END, {round_to}) AS kappa
FROM po_agg, pe_agg, ncat"""


def wilcoxon_signed_rank(
    df: DataFrame,
    a_col: str,
    b_col: str,
    quantum: int = 1_000_000,
    z_crit_milli: int = 1960,
    round_to: int = 6,
) -> DataFrame:
    """Wilcoxon signed-rank test (Wilcoxon 1945) on paired values —
    :func:`mcnemar_test`'s continuous sibling: two SCORES per row (the
    same doc under model v1 and v2, the same user in two conditions),
    "did the paired difference shift" answered from the RANKS of |d|,
    so one fat-tailed pair can't buy the verdict the paired t-test
    would sell it. ONE row ``(n_pairs, n_zero_dropped, w_plus_doubled,
    z, p, significant)``.

    Mechanics (the mann_whitney_u rank discipline): d quantizes to
    integer micros, zero differences DROP (the classic Wilcoxon
    convention — they carry no sign information), |d| ranks with
    average ranks as exact integer HALVES over the bounded distinct-|d|
    lattice (``w_plus_doubled`` = 2·W⁺ stays integer — the hash-grade
    statistic), and the normal approximation carries the full tie
    correction:

        z = (W⁺ − n(n+1)/4) / √(n(n+1)(2n+1)/24 − Σ(t³−t)/48).

    All-zero or all-tied-at-one-|d| inputs yield NULL z/p (zero
    variance), never a div/0. No continuity correction (documented;
    at corpus n it is sub-ulp).

    Scale shape: one scan → distinct-|d| lattice groupBy → ONE ordered
    window over the lattice (bounded by distinct quantized |d| values,
    not rows — the ks_exact contract) → 1-row reduction.
    """
    va = F.col(a_col).cast("double")
    vb = F.col(b_col).cast("double")
    qa = F.floor(va * F.lit(quantum)).cast("bigint")
    qb = F.floor(vb * F.lit(quantum)).cast("bigint")
    base = df.where(va.isNotNull() & vb.isNotNull()).select(
        (qa - qb).alias("_d")
    )
    nz = base.agg(
        F.sum((F.col("_d") == 0).cast("long")).cast("bigint").alias("n_zero_dropped")
    )
    cells = (
        base.where(F.col("_d") != 0)
        .select(F.abs(F.col("_d")).alias("_ad"), (F.col("_d") > 0).alias("_pos"))
        .groupBy("_ad")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_t"),
            F.sum(F.col("_pos").cast("long")).cast("bigint").alias("_p"),
        )
    )
    w = Window.orderBy("_ad").rowsBetween(Window.unboundedPreceding, -1)
    ranked = cells.withColumn(
        "_cum", F.coalesce(F.sum("_t").over(w), F.lit(0)).cast("bigint")
    )
    # doubled average rank of the tie block: positions cum+1..cum+t
    dr = 2 * F.col("_cum") + F.col("_t") + 1
    agg = ranked.agg(
        F.coalesce(F.sum("_t"), F.lit(0)).cast("bigint").alias("n_pairs"),
        F.coalesce(F.sum(F.col("_p") * dr), F.lit(0))
        .cast("bigint")
        .alias("w_plus_doubled"),
        F.coalesce(
            F.sum(F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t")),
            F.lit(0),
        )
        .cast("bigint")
        .alias("_ts"),
    )
    out = agg.crossJoin(F.broadcast(nz))
    nd = F.col("n_pairs").cast("double")
    var = nd * (nd + 1) * (2 * nd + 1) / F.lit(24.0) - F.col("_ts").cast(
        "double"
    ) / F.lit(48.0)
    z = F.when(
        (F.col("n_pairs") > 0) & (var > 0),
        (
            F.col("w_plus_doubled").cast("double") / F.lit(2.0)
            - nd * (nd + 1) / F.lit(4.0)
        )
        / F.sqrt(var),
    )
    return out.select(
        "n_pairs",
        "n_zero_dropped",
        "w_plus_doubled",
        F.round(z, round_to).alias("z"),
        F.round(F.when(z.isNotNull(), _p_two_sided(z)), round_to).alias("p"),
        F.coalesce(
            F.abs(z) * 1000 > F.lit(float(z_crit_milli)), F.lit(False)
        ).alias("significant"),
    )


def wilcoxon_oracle_sql(
    from_sql: str,
    quantum: int = 1_000_000,
    z_crit_milli: int = 1960,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`wilcoxon_signed_rank`; ``from_sql``
    yields paired value columns ``a`` and ``b``."""
    var = (
        "(CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1)"
        " * (2 * CAST(n_pairs AS DOUBLE) + 1) / 24.0"
        " - CAST(ts AS DOUBLE) / 48.0)"
    )
    z = (
        f"(CASE WHEN n_pairs > 0 AND {var} > 0 THEN"
        " (CAST(w_plus_doubled AS DOUBLE) / 2.0"
        " - CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1) / 4.0)"
        f" / sqrt({var}) END)"
    )
    return f"""WITH src AS ({from_sql}),
d AS (SELECT CAST(floor(CAST(a AS DOUBLE) * {quantum}) AS BIGINT)
           - CAST(floor(CAST(b AS DOUBLE) * {quantum}) AS BIGINT) AS d
      FROM src WHERE a IS NOT NULL AND b IS NOT NULL),
nz AS (SELECT CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zero_dropped FROM d),
cells AS (SELECT abs(d) AS ad, CAST(count(*) AS BIGINT) AS t,
                 CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS p
          FROM d WHERE d <> 0 GROUP BY 1),
ranked AS (SELECT *, CAST(coalesce(sum(t) OVER (ORDER BY ad
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum
           FROM cells),
agg AS (SELECT CAST(coalesce(sum(t), 0) AS BIGINT) AS n_pairs,
               CAST(coalesce(sum(p * (2 * cum + t + 1)), 0) AS BIGINT)
                   AS w_plus_doubled,
               CAST(coalesce(sum(t * t * t - t), 0) AS BIGINT) AS ts
        FROM ranked)
SELECT n_pairs, n_zero_dropped, w_plus_doubled,
  round({z}, {round_to}) AS z,
  round(CASE WHEN {z} IS NOT NULL THEN {_p_two_sided_sql(z)} END,
        {round_to}) AS p,
  coalesce(abs({z}) * 1000 > {z_crit_milli}, FALSE) AS significant
FROM agg, nz"""


def cuped_test(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    group_col: str,
    group_a,
    group_b,
    quantum: int = 1_000_000,
    z_crit_milli: int = 1960,
    round_to: int = 6,
) -> DataFrame:
    """CUPED-adjusted two-sample comparison (Deng et al. WSDM 2013 —
    Controlled-experiment Using Pre-Experiment Data, the industry-
    standard variance-reduction for A/B metrics): regress the metric on
    a pre-period covariate POOLED across both arms (θ = cov(x,y)/var(x)
    — pooled, so the adjustment cannot introduce bias between arms),
    subtract θ(x − x̄) per unit, and test the difference of ADJUSTED
    means — same expectation as the raw test, variance shrunk by ρ²,
    which is exactly the speed-up a strongly predictive covariate
    (last week's behavior) buys. ONE row ``(n_a, n_b, theta,
    mean_diff_raw, mean_diff_adj, var_reduction, z, p, significant)``:

        mean_diff_adj = (ȳ_a − θx̄_a) − (ȳ_b − θx̄_b)
        z = diff_adj / √(v_a/n_a + v_b/n_b),
        v_g = var(y_g) − 2θ·cov_g(x,y) + θ²·var(x_g)

    ``var_reduction`` = 1 − pooled-ρ² complement form
    (1 − v_pooled_adj/var(y)) reported from the pooled moments — the
    "how much experiment time did the covariate buy" number.

    Degenerates NULL-gate: zero covariate variance → θ NULL and the
    whole test falls back to NULL z (use welch_t on the raw metric
    instead — the caller asked for an adjustment that doesn't exist);
    either arm < 2 rows → NULL z.

    Exactness: ten quantized DECIMAL(38,0) moment sums in ONE
    partial-agg pass (the welch_t lanes doubled for the covariate and
    the cross term); everything after is a fixed double chain on those
    integers. One scan, one aggregate — nothing grows with corpus size.
    """
    m = F.col(metric_col).cast("double")
    x = F.col(covariate_col).cast("double")
    qm = F.floor(m * F.lit(quantum)).cast("decimal(38,0)")
    qx = F.floor(x * F.lit(quantum)).cast("decimal(38,0)")
    base = df.where(
        m.isNotNull() & x.isNotNull() & F.col(group_col).isin([group_a, group_b])
    ).select(
        (F.col(group_col) == group_a).alias("_ga"),
        qm.alias("_y"),
        qx.alias("_x"),
    )

    def lane(cond, col, name):
        return F.coalesce(
            F.sum(F.when(cond, col)), F.lit(0).cast("decimal(38,0)")
        ).alias(name)

    ga = F.col("_ga")
    agg = base.agg(
        F.sum(ga.cast("long")).cast("bigint").alias("n_a"),
        F.sum((~ga).cast("long")).cast("bigint").alias("n_b"),
        lane(ga, F.col("_y"), "ya"),
        lane(~ga, F.col("_y"), "yb"),
        lane(ga, F.col("_x"), "xa"),
        lane(~ga, F.col("_x"), "xb"),
        lane(ga, F.col("_y") * F.col("_y"), "yya"),
        lane(~ga, F.col("_y") * F.col("_y"), "yyb"),
        lane(ga, F.col("_x") * F.col("_x"), "xxa"),
        lane(~ga, F.col("_x") * F.col("_x"), "xxb"),
        lane(ga, F.col("_x") * F.col("_y"), "xya"),
        lane(~ga, F.col("_x") * F.col("_y"), "xyb"),
    )
    qd = F.lit(float(quantum))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    nt = na + nb
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    # pooled (both arms) moments for theta
    sy, sx = d("ya") + d("yb"), d("xa") + d("xb")
    syy, sxx = d("yya") + d("yyb"), d("xxa") + d("xxb")
    sxy = d("xya") + d("xyb")
    varx_p = (sxx - sx * sx / nt) / nt / (qd * qd)
    vary_p = (syy - sy * sy / nt) / nt / (qd * qd)
    cov_p = (sxy - sx * sy / nt) / nt / (qd * qd)
    theta = F.when((nt > 0) & (varx_p > 0), cov_p / varx_p)
    # per-arm adjusted means and variances
    mya, myb = d("ya") / na / qd, d("yb") / nb / qd
    mxa, mxb = d("xa") / na / qd, d("xb") / nb / qd
    vya = (d("yya") - d("ya") * d("ya") / na) / (na - F.lit(1.0)) / (qd * qd)
    vyb = (d("yyb") - d("yb") * d("yb") / nb) / (nb - F.lit(1.0)) / (qd * qd)
    vxa = (d("xxa") - d("xa") * d("xa") / na) / (na - F.lit(1.0)) / (qd * qd)
    vxb = (d("xxb") - d("xb") * d("xb") / nb) / (nb - F.lit(1.0)) / (qd * qd)
    cva = (d("xya") - d("xa") * d("ya") / na) / (na - F.lit(1.0)) / (qd * qd)
    cvb = (d("xyb") - d("xb") * d("yb") / nb) / (nb - F.lit(1.0)) / (qd * qd)
    va = vya - 2 * theta * cva + theta * theta * vxa
    vb_ = vyb - 2 * theta * cvb + theta * theta * vxb
    ok = (F.col("n_a") > 1) & (F.col("n_b") > 1) & theta.isNotNull()
    diff_raw = mya - myb
    diff_adj = (mya - theta * mxa) - (myb - theta * mxb)
    se2 = va / na + vb_ / nb
    z = F.when(ok & (se2 > 0), diff_adj / F.sqrt(se2))
    vr = F.when(
        (vary_p > 0) & theta.isNotNull(),
        F.greatest(
            F.lit(0.0),
            F.lit(1.0) - (vary_p - cov_p * cov_p / varx_p) / vary_p,
        ),
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(theta, round_to).alias("theta"),
        F.round(F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), diff_raw), round_to)
        .alias("mean_diff_raw"),
        F.round(F.when(ok, diff_adj), round_to).alias("mean_diff_adj"),
        F.round(vr, round_to).alias("var_reduction"),
        F.round(z, round_to).alias("z"),
        F.round(F.when(z.isNotNull(), _p_two_sided(z)), round_to).alias("p"),
        F.coalesce(
            F.abs(z) * 1000 > F.lit(float(z_crit_milli)), F.lit(False)
        ).alias("significant"),
    )


def cuped_oracle_sql(
    from_sql: str,
    quantum: int = 1_000_000,
    z_crit_milli: int = 1960,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`cuped_test`; ``from_sql`` yields
    ``(ga BOOLEAN, y, x)`` rows (is-group-A, metric, covariate), nulls
    pre-filtered. Every double is computed once in a staged CTE so the
    operation order matches the Spark chain exactly."""
    q = float(quantum)
    return f"""WITH src AS ({from_sql}),
qrows AS (SELECT ga,
    CAST(floor(CAST(y AS DOUBLE) * {quantum}) AS HUGEINT) AS qy,
    CAST(floor(CAST(x AS DOUBLE) * {quantum}) AS HUGEINT) AS qx
  FROM src),
agg AS (SELECT
    CAST(sum(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN ga THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
    CAST(coalesce(sum(CASE WHEN ga THEN qy END), 0) AS HUGEINT) AS ya,
    CAST(coalesce(sum(CASE WHEN NOT ga THEN qy END), 0) AS HUGEINT) AS yb,
    CAST(coalesce(sum(CASE WHEN ga THEN qx END), 0) AS HUGEINT) AS xa,
    CAST(coalesce(sum(CASE WHEN NOT ga THEN qx END), 0) AS HUGEINT) AS xb,
    CAST(coalesce(sum(CASE WHEN ga THEN qy * qy END), 0) AS HUGEINT) AS yya,
    CAST(coalesce(sum(CASE WHEN NOT ga THEN qy * qy END), 0) AS HUGEINT) AS yyb,
    CAST(coalesce(sum(CASE WHEN ga THEN qx * qx END), 0) AS HUGEINT) AS xxa,
    CAST(coalesce(sum(CASE WHEN NOT ga THEN qx * qx END), 0) AS HUGEINT) AS xxb,
    CAST(coalesce(sum(CASE WHEN ga THEN qx * qy END), 0) AS HUGEINT) AS xya,
    CAST(coalesce(sum(CASE WHEN NOT ga THEN qx * qy END), 0) AS HUGEINT) AS xyb
  FROM qrows),
m1 AS (SELECT *,
    CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
    CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nt,
    CAST(ya AS DOUBLE) + CAST(yb AS DOUBLE) AS sy,
    CAST(xa AS DOUBLE) + CAST(xb AS DOUBLE) AS sx,
    CAST(yya AS DOUBLE) + CAST(yyb AS DOUBLE) AS syy,
    CAST(xxa AS DOUBLE) + CAST(xxb AS DOUBLE) AS sxx,
    CAST(xya AS DOUBLE) + CAST(xyb AS DOUBLE) AS sxy
  FROM agg),
m2 AS (SELECT *,
    (sxx - sx * sx / nt) / nt / ({q} * {q}) AS varx_p,
    (syy - sy * sy / nt) / nt / ({q} * {q}) AS vary_p,
    (sxy - sx * sy / nt) / nt / ({q} * {q}) AS cov_p
  FROM m1),
m3 AS (SELECT *,
    CASE WHEN nt > 0 AND varx_p > 0 THEN cov_p / varx_p END AS theta,
    CAST(ya AS DOUBLE) / na / {q} AS mya,
    CAST(yb AS DOUBLE) / nb / {q} AS myb,
    CAST(xa AS DOUBLE) / na / {q} AS mxa,
    CAST(xb AS DOUBLE) / nb / {q} AS mxb,
    (CAST(yya AS DOUBLE) - CAST(ya AS DOUBLE) * CAST(ya AS DOUBLE) / na)
      / (na - 1.0) / ({q} * {q}) AS vya,
    (CAST(yyb AS DOUBLE) - CAST(yb AS DOUBLE) * CAST(yb AS DOUBLE) / nb)
      / (nb - 1.0) / ({q} * {q}) AS vyb,
    (CAST(xxa AS DOUBLE) - CAST(xa AS DOUBLE) * CAST(xa AS DOUBLE) / na)
      / (na - 1.0) / ({q} * {q}) AS vxa,
    (CAST(xxb AS DOUBLE) - CAST(xb AS DOUBLE) * CAST(xb AS DOUBLE) / nb)
      / (nb - 1.0) / ({q} * {q}) AS vxb,
    (CAST(xya AS DOUBLE) - CAST(xa AS DOUBLE) * CAST(ya AS DOUBLE) / na)
      / (na - 1.0) / ({q} * {q}) AS cva,
    (CAST(xyb AS DOUBLE) - CAST(xb AS DOUBLE) * CAST(yb AS DOUBLE) / nb)
      / (nb - 1.0) / ({q} * {q}) AS cvb
  FROM m2),
m4 AS (SELECT *,
    vya - 2 * theta * cva + theta * theta * vxa AS va,
    vyb - 2 * theta * cvb + theta * theta * vxb AS vb,
    (mya - theta * mxa) - (myb - theta * mxb) AS diff_adj,
    n_a > 1 AND n_b > 1 AND theta IS NOT NULL AS ok
  FROM m3),
m5 AS (SELECT *,
    va / na + vb / nb AS se2
  FROM m4),
m6 AS (SELECT *,
    CASE WHEN ok AND se2 > 0 THEN diff_adj / sqrt(se2) END AS z
  FROM m5)
SELECT n_a, n_b,
  round(theta, {round_to}) AS theta,
  round(CASE WHEN n_a > 0 AND n_b > 0 THEN mya - myb END, {round_to})
      AS mean_diff_raw,
  round(CASE WHEN ok THEN diff_adj END, {round_to}) AS mean_diff_adj,
  round(CASE WHEN vary_p > 0 AND theta IS NOT NULL THEN
      greatest(0.0, 1.0 - (vary_p - cov_p * cov_p / varx_p) / vary_p) END,
      {round_to}) AS var_reduction,
  round(z, {round_to}) AS z,
  round(CASE WHEN z IS NOT NULL THEN {_p_two_sided_sql('z')} END,
      {round_to}) AS p,
  coalesce(abs(z) * 1000 > {z_crit_milli}, FALSE) AS significant
FROM m6"""


def required_sample_size(
    df: DataFrame,
    success_col: str,
    mde_ppm: int,
    z_alpha_milli: int = 1960,
    z_beta_milli: int = 842,
    round_to: int = 6,
) -> DataFrame:
    """Two-proportion power calculation against the MEASURED base rate
    (the standard normal-approximation design formula): "can this
    corpus even power the test" answered before anyone runs it. Given
    the observed success rate p₁ and a minimum detectable effect δ
    (``mde_ppm`` parts-per-million, absolute), the per-arm requirement

        n = ⌈(z_{α/2} + z_β)² · (p₁(1−p₁) + p₂(1−p₂)) / δ²⌉,  p₂ = p₁+δ

    — ONE row ``(n, base_rate, mde, n_per_arm, n_total, feasible)``
    where ``feasible`` says whether the corpus at hand could fill both
    arms (n ≥ 2·n_per_arm). Defaults: 5% two-sided α (1960 milli-z),
    80% power (842 milli-z ≈ Φ⁻¹(0.8)); both thresholds are integer
    parameters so the design itself can't drift between engines.

    The validation read: a violation-rate SLO change of δ needs this
    much audit data — running the monitor on less and reading "not
    significant" as "no regression" is the type-II error this number
    exists to prevent. p₂ clamps to [0,1]; a degenerate base rate
    (p₁ ∈ {0,1} with δ pushing outside [0,1]) yields NULL n_per_arm.

    Exactness: the only data-dependent inputs are two exact integers
    (n, successes); everything else is a fixed double chain on integer
    parameters, with ceil at the end. One partial-agg scan.
    """
    if mde_ppm <= 0:
        raise ValueError(f"required_sample_size: mde_ppm={mde_ppm}")
    y = F.col(success_col).cast("boolean")
    agg = df.where(y.isNotNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(y.cast("long")).cast("bigint").alias("_x"),
    )
    p1 = F.col("_x").cast("double") / F.col("n").cast("double")
    delta = F.lit(mde_ppm / 1e6)
    p2 = F.least(F.greatest(p1 + delta, F.lit(0.0)), F.lit(1.0))
    zsum = F.lit((z_alpha_milli + z_beta_milli) / 1000.0)
    varsum = p1 * (F.lit(1.0) - p1) + p2 * (F.lit(1.0) - p2)
    ok = (F.col("n") > 0) & (varsum > 0)
    n_arm = F.when(ok, F.ceil(zsum * zsum * varsum / (delta * delta))).cast(
        "bigint"
    )
    return agg.select(
        "n",
        F.round(F.when(F.col("n") > 0, p1), round_to).alias("base_rate"),
        F.round(delta, round_to).alias("mde"),
        n_arm.alias("n_per_arm"),
        (n_arm * 2).cast("bigint").alias("n_total"),
        F.coalesce(F.col("n") >= n_arm * 2, F.lit(False)).alias("feasible"),
    )


def required_sample_size_oracle_sql(
    from_sql: str,
    success_col: str,
    mde_ppm: int,
    z_alpha_milli: int = 1960,
    z_beta_milli: int = 842,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`required_sample_size`."""
    delta = mde_ppm / 1e6
    zsum = (z_alpha_milli + z_beta_milli) / 1000.0
    p1 = "(CAST(x AS DOUBLE) / CAST(n AS DOUBLE))"
    p2 = f"least(greatest({p1} + {delta!r}, 0.0), 1.0)"
    varsum = f"({p1} * (1.0 - {p1}) + {p2} * (1.0 - {p2}))"
    n_arm = (
        f"(CASE WHEN n > 0 AND {varsum} > 0 THEN CAST(ceil("
        f"{zsum!r} * {zsum!r} * {varsum} / ({delta!r} * {delta!r})) AS BIGINT)"
        " END)"
    )
    return f"""WITH src AS ({from_sql}),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN CAST({success_col} AS BOOLEAN)
                             THEN 1 ELSE 0 END) AS BIGINT) AS x
        FROM src WHERE {success_col} IS NOT NULL)
SELECT n,
  round(CASE WHEN n > 0 THEN {p1} END, {round_to}) AS base_rate,
  round(CAST({delta!r} AS DOUBLE), {round_to}) AS mde,
  {n_arm} AS n_per_arm,
  CAST({n_arm} * 2 AS BIGINT) AS n_total,
  coalesce(n >= {n_arm} * 2, FALSE) AS feasible
FROM agg"""


def equivalence_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    margin_ppm: int,
    quantum: int = 1_000_000,
    z_crit_milli: int = 1645,
    round_to: int = 6,
) -> DataFrame:
    """TOST equivalence test (Schuirmann 1987, two one-sided tests) on
    two group means — the REVERSE of every significance gate in the
    toolkit: a migration/refactor must prove the metric is THE SAME
    within ±δ, and "not significantly different" is not that proof
    (an under-powered test passes anything — the exact failure
    :func:`required_sample_size` exists to name). ONE row ``(n_a, n_b,
    mean_a, mean_b, mean_diff, margin, z_lower, z_upper, p_equiv,
    equivalent)``:

        z_lower = (diff + δ)/se,  z_upper = (δ − diff)/se,
        p_equiv = max of the two one-sided p's;
        equivalent ⇔ min(z_lower, z_upper) > z_crit

    with Welch (unequal-variance) standard error — the honest default
    on web data. δ = ``margin_ppm``/1e6 in the metric's own units
    (absolute), an integer parameter so the acceptance bar can't drift
    between engines; the default 1645 milli-z is the one-sided 5% level
    (TOST at α runs each side at α, not α/2).

    Degenerates: either arm < 2 rows or zero pooled spread → NULL z's,
    ``equivalent`` false — absence of evidence stays absence.

    Exactness: the welch_t moment lanes verbatim (six quantized DECIMAL
    sums, one pass); the one-sided p is the shared A&S polynomial
    halved. One scan, one aggregate.
    """
    if margin_ppm <= 0:
        raise ValueError(f"equivalence_test: margin_ppm={margin_ppm}")
    v = F.col(value_col).cast("double")
    q = F.floor(v * F.lit(quantum)).cast("decimal(38,0)")
    base = df.where(
        v.isNotNull() & F.col(group_col).isin([group_a, group_b])
    ).select((F.col(group_col) == group_a).alias("_ga"), q.alias("_q"))
    agg = base.agg(
        F.sum(F.col("_ga").cast("long")).cast("bigint").alias("n_a"),
        F.sum((~F.col("_ga")).cast("long")).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("_ga"), F.col("_q"))).alias("sa"),
        F.sum(F.when(~F.col("_ga"), F.col("_q"))).alias("sb"),
        F.sum(F.when(F.col("_ga"), F.col("_q") * F.col("_q"))).alias("saa"),
        F.sum(F.when(~F.col("_ga"), F.col("_q") * F.col("_q"))).alias("sbb"),
    )
    qd = F.lit(float(quantum))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    saa, sbb = F.col("saa").cast("double"), F.col("sbb").cast("double")
    ma, mb = sa / na / qd, sb / nb / qd
    va = (saa - sa * sa / na) / (na - F.lit(1.0)) / (qd * qd)
    vb = (sbb - sb * sb / nb) / (nb - F.lit(1.0)) / (qd * qd)
    se = F.sqrt(va / na + vb / nb)
    delta = F.lit(margin_ppm / 1e6)
    diff = ma - mb
    ok = (F.col("n_a") > 1) & (F.col("n_b") > 1) & (se > 0)
    zl = F.when(ok, (diff + delta) / se)
    zu = F.when(ok, (delta - diff) / se)
    # one-sided upper-tail p of z: half the two-sided p of |z| when
    # z >= 0, else 1 - half (the polynomial is symmetric)
    def one_sided(z):
        half = _p_two_sided(z) / F.lit(2.0)
        return F.when(z >= 0, half).otherwise(F.lit(1.0) - half)

    p_eq = F.greatest(one_sided(zl), one_sided(zu))
    zc = F.lit(z_crit_milli / 1000.0)
    return agg.select(
        "n_a",
        "n_b",
        F.round(F.when(F.col("n_a") > 0, ma), round_to).alias("mean_a"),
        F.round(F.when(F.col("n_b") > 0, mb), round_to).alias("mean_b"),
        F.round(F.when(ok, diff), round_to).alias("mean_diff"),
        F.round(delta, round_to).alias("margin"),
        F.round(zl, round_to).alias("z_lower"),
        F.round(zu, round_to).alias("z_upper"),
        F.round(F.when(ok, p_eq), round_to).alias("p_equiv"),
        F.coalesce(
            (F.least(zl, zu) > zc), F.lit(False)
        ).alias("equivalent"),
    )


def equivalence_oracle_sql(
    from_sql: str,
    margin_ppm: int,
    quantum: int = 1_000_000,
    z_crit_milli: int = 1645,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`equivalence_test`; ``from_sql`` yields
    ``(ga BOOLEAN, v)`` rows, nulls pre-filtered."""
    q = float(quantum)
    delta = margin_ppm / 1e6
    zc = z_crit_milli / 1000.0

    def one_sided(z):
        half = f"({_p_two_sided_sql(z)} / 2.0)"
        return f"(CASE WHEN {z} >= 0 THEN {half} ELSE 1.0 - {half} END)"

    return f"""WITH src AS ({from_sql}),
agg AS (SELECT
    CAST(sum(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN ga THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
    CAST(sum(CASE WHEN ga THEN q END) AS HUGEINT) AS sa,
    CAST(sum(CASE WHEN NOT ga THEN q END) AS HUGEINT) AS sb,
    CAST(sum(CASE WHEN ga THEN q * q END) AS HUGEINT) AS saa,
    CAST(sum(CASE WHEN NOT ga THEN q * q END) AS HUGEINT) AS sbb
  FROM (SELECT ga, CAST(floor(CAST(v AS DOUBLE) * {quantum}) AS HUGEINT) AS q
        FROM src)),
m AS (SELECT *,
    CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
    CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE) / {q!r} AS ma,
    CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) / {q!r} AS mb
  FROM agg),
m2 AS (SELECT *,
    (CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na)
      / (na - 1.0) / ({q!r} * {q!r}) AS va,
    (CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / nb)
      / (nb - 1.0) / ({q!r} * {q!r}) AS vb
  FROM m),
m3 AS (SELECT *, sqrt(va / na + vb / nb) AS se, ma - mb AS diff,
              n_a > 1 AND n_b > 1 AND sqrt(va / na + vb / nb) > 0 AS ok
  FROM m2),
m4 AS (SELECT *,
    CASE WHEN ok THEN (diff + {delta!r}) / se END AS zl,
    CASE WHEN ok THEN ({delta!r} - diff) / se END AS zu
  FROM m3)
SELECT n_a, n_b,
  round(CASE WHEN n_a > 0 THEN ma END, {round_to}) AS mean_a,
  round(CASE WHEN n_b > 0 THEN mb END, {round_to}) AS mean_b,
  round(CASE WHEN ok THEN diff END, {round_to}) AS mean_diff,
  round(CAST({delta!r} AS DOUBLE), {round_to}) AS margin,
  round(zl, {round_to}) AS z_lower,
  round(zu, {round_to}) AS z_upper,
  round(CASE WHEN ok THEN greatest({one_sided('zl')}, {one_sided('zu')}) END,
      {round_to}) AS p_equiv,
  coalesce(least(zl, zu) > {zc!r}, FALSE) AS equivalent
FROM m4"""


def spiegelhalter_z(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    z_crit_milli: int = 1960,
    round_to: int = 6,
) -> DataFrame:
    """Spiegelhalter's Z calibration test (Spiegelhalter, Stat. Med.
    1986) — the SIGNIFICANCE verdict beside the calibration MAGNITUDES
    (ECE/MCE say how big the gap is, Brier decomposes it; this says
    whether the miscalibration exceeds what the forecasts' own
    variance explains): ONE row ``(n, z, p, miscalibrated)`` with

        Z = Σ(yᵢ − pᵢ)(1 − 2pᵢ) / √(Σ(1 − 2pᵢ)²·pᵢ(1 − pᵢ))

    — binning-free (no n_bins knob to tune, the arbitrariness ECE
    inherits), mean-zero under perfect calibration by construction.
    A forecast set of all-½ probabilities has zero test variance (a
    coin can't be miscalibrated about itself): NULL z/p, never div/0.

    Exactness: probabilities quantize to integer micros; numerator and
    variance are exact integer sums in DECIMAL(38,0) (each term a
    product of micro integers — no float accumulation anywhere before
    the final quotient); one division + sqrt ends the chain. One scan,
    one partial+final aggregate.
    """
    lab = F.col(label_col).cast("boolean")
    pm = F.floor(F.col(prob_col).cast("double") * F.lit(1_000_000)).cast("bigint")
    pm = F.least(F.greatest(pm, F.lit(0)), F.lit(1_000_000))
    d38 = "decimal(38,0)"
    base = df.where(F.col(prob_col).isNotNull() & lab.isNotNull()).select(
        pm.alias("_p"), lab.cast("long").alias("_y")
    )
    # numerator term: (y*1e6 - p)(1e6 - 2p)  [micro^2 scale]
    # variance term: (1e6 - 2p)^2 * p * (1e6 - p)  [micro^4 scale]
    one = F.lit(1_000_000)
    num_t = (F.col("_y") * one - F.col("_p")).cast(d38) * (
        one - 2 * F.col("_p")
    ).cast(d38)
    var_t = (
        (one - 2 * F.col("_p")).cast(d38)
        * (one - 2 * F.col("_p")).cast(d38)
        * F.col("_p").cast(d38)
        * (one - F.col("_p")).cast(d38)
    )
    agg = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum(num_t), F.lit(0).cast(d38)).alias("_num"),
        F.coalesce(F.sum(var_t), F.lit(0).cast(d38)).alias("_var"),
    )
    # scales: num is micro^2 (1e12), sqrt(var) is micro^2 (1e12) — the
    # quanta cancel exactly in the quotient
    z = F.when(
        (F.col("n") > 0) & (F.col("_var") > 0),
        F.col("_num").cast("double") / F.sqrt(F.col("_var").cast("double")),
    )
    return agg.select(
        "n",
        F.round(z, round_to).alias("z"),
        F.round(F.when(z.isNotNull(), _p_two_sided(z)), round_to).alias("p"),
        F.coalesce(
            F.abs(z) * 1000 > F.lit(float(z_crit_milli)), F.lit(False)
        ).alias("miscalibrated"),
    )


def spiegelhalter_oracle_sql(
    from_sql: str,
    prob_col: str,
    label_col: str,
    z_crit_milli: int = 1960,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`spiegelhalter_z` — same micro integers,
    same single quotient."""
    z = (
        "(CASE WHEN n > 0 AND v > 0 THEN"
        " CAST(num AS DOUBLE) / sqrt(CAST(v AS DOUBLE)) END)"
    )
    return f"""WITH src AS ({from_sql}),
q AS (SELECT least(greatest(CAST(floor(CAST({prob_col} AS DOUBLE) * 1000000)
          AS BIGINT), 0), 1000000) AS p,
        CAST(CAST({label_col} AS BOOLEAN) AS BIGINT) AS y
      FROM src WHERE {prob_col} IS NOT NULL AND {label_col} IS NOT NULL),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(coalesce(sum(CAST(y * 1000000 - p AS HUGEINT)
                      * (1000000 - 2 * p)), 0) AS HUGEINT) AS num,
    CAST(coalesce(sum(CAST(1000000 - 2 * p AS HUGEINT)
                      * (1000000 - 2 * p) * p * (1000000 - p)), 0)
         AS HUGEINT) AS v
  FROM q)
SELECT n,
  round({z}, {round_to}) AS z,
  round(CASE WHEN {z} IS NOT NULL THEN {_p_two_sided_sql(z)} END,
      {round_to}) AS p,
  coalesce(abs({z}) * 1000 > {z_crit_milli}, FALSE) AS miscalibrated
FROM agg"""


def fisher_exact(
    df: DataFrame,
    a_col: str,
    b_col: str,
    max_n: int = 1_000_000,
    alpha_trillionths: int = 50_000_000_000,
    round_to: int = 6,
) -> DataFrame:
    """Fisher's exact test (Fisher 1935) on the 2×2 table of two boolean
    columns over the SAME rows — the small-cell companion to
    ``chi_squared_drift``/``mcnemar_test``: when any expected cell is
    tiny the chi² approximation is garbage, and the honest answer is the
    conditional hypergeometric tail. ONE row ``(n, n11, n10, n01, n00,
    odds_ratio, p, significant)`` with the two-sided p by the pmf rule
    (sum P(k) over every table at least as extreme, i.e. with
    pmf(k) <= pmf(observed), SciPy's convention) at fixed margins.

    Exactness across engines: ln pmf is carried as INTEGER micro-ln —
    ln pmf(k_lo) is a sum of floor-quantized ln terms (the shared
    libm/floor contract) over the four margin factorials, and each step
    k→k+1 adds the exact recurrence Δ = fl(r1−k) + fl(c1−k) − fl(k+1) −
    fl(r2−c1+k+1); BOTH engines walk the SAME recurrence (Spark: one
    ``aggregate`` over ``sequence(k_lo+1, k_hi)`` appending to an array
    accumulator — one lambda, no k× expression expansion; DuckDB: a
    recursive CTE over k), so the quantization drift is bit-identical.
    The tail test compares integers (``pm(k) <= pm(obs) + 1`` — one
    micro-ln of tolerance, the integer form of SciPy's 1+1e-7 relative
    gate), and p sums trillionth-quantized ``exp(pm/1e6)`` terms in
    BIGINT — order-free. ``significant`` is an INTEGER compare of that
    sum against ``alpha_trillionths`` (5e10 = 0.05).

    Scale shape: one scan collapses to four cells (partial-aggregatable
    sums); everything after is a single-row expression whose cost is
    O(n + k_range) thanks to the recurrence — but the array accumulator
    holds k_range entries, so ``max_n`` (default 1e6) gates the walk: a
    bigger table gets NULL p (use chi² there — at that n the
    approximation is exact for all practical purposes and Fisher is the
    wrong tool anyway). Degenerate margins (a constant column) pin
    k_lo = k_hi and read p = 1. n = 0 yields NULL p, never a div/0.

    Reference scope note: eliassona/xmlschemavalidator has no dataset
    layer (core.clj:263-285); north-rule analyzer completing the
    contingency battery (chi² drift / McNemar / CMH / Woolf).
    """
    a = F.col(a_col).cast("boolean")
    b = F.col(b_col).cast("boolean")
    base = df.where(a.isNotNull() & b.isNotNull()).select(
        a.alias("_a"), b.alias("_b")
    )
    cells = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("_a") & F.col("_b")).cast("long")).cast("bigint").alias("n11"),
        F.sum((F.col("_a") & ~F.col("_b")).cast("long")).cast("bigint").alias("n10"),
        F.sum((~F.col("_a") & F.col("_b")).cast("long")).cast("bigint").alias("n01"),
        F.sum((~F.col("_a") & ~F.col("_b")).cast("long")).cast("bigint").alias("n00"),
    )

    def fl(x):  # floor-quantized micro-ln of a positive integer column
        return F.floor(F.log(x.cast("double")) * F.lit(1_000_000)).cast("bigint")

    def lfact(m):  # Σ_{i=2..m} fl(i): integer micro-ln of m!
        return F.when(
            m >= 2,
            F.aggregate(
                F.sequence(F.lit(2).cast("bigint"), m.cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda acc, i: acc + fl(i),
            ),
        ).otherwise(F.lit(0).cast("bigint"))

    m = cells.select(
        "*",
        (F.col("n11") + F.col("n10")).alias("_r1"),
        (F.col("n01") + F.col("n00")).alias("_r2"),
        (F.col("n11") + F.col("n01")).alias("_c1"),
        (F.col("n10") + F.col("n00")).alias("_c2"),
    ).select(
        "*",
        F.greatest(F.lit(0).cast("bigint"), F.col("_c1") - F.col("_r2")).alias("_klo"),
        F.least(F.col("_r1"), F.col("_c1")).alias("_khi"),
    )
    klo, khi = F.col("_klo"), F.col("_khi")
    r1, r2, c1 = F.col("_r1"), F.col("_r2"), F.col("_c1")
    # LET-bind ln pmf(k_lo) as a named column: it feeds both walks below,
    # and each reference costs O(n) micro-ln factorial sums if re-inlined
    m = m.select(
        "*",
        (
            lfact(r1)
            + lfact(r2)
            + lfact(c1)
            + lfact(F.col("_c2"))
            - lfact(F.col("n"))
            - lfact(klo)
            - lfact(r1 - klo)
            - lfact(c1 - klo)
            - lfact(r2 - c1 + klo)
        ).alias("_pm_lo"),
    )
    pm_lo = F.col("_pm_lo")
    def step(pm, k):  # micro-ln pmf recurrence: k-1 → k
        return pm + fl(r1 - k + 1) + fl(c1 - k + 1) - fl(k) - fl(r2 - c1 + k)

    def term(pm):  # trillionth-quantized tail term for one table
        return F.round(
            F.exp(pm.cast("double") / F.lit(1_000_000.0))
            * F.lit(1_000_000_000_000.0)
        ).cast("bigint")

    # two scalar O(k)-state walks (an array accumulator would be O(k²)
    # in copies): first pin ln pmf at the OBSERVED k, then re-walk the
    # whole range summing tail terms — both one HOF lambda, no k×
    # expression expansion (the CLAUDE.md HOF-CSE rule).
    walk = m.select(
        "*",
        F.when(
            (F.col("n") > 0) & (F.col("n") <= max_n),
            F.when(
                F.col("n11") > klo,
                F.aggregate(
                    F.sequence(klo + 1, F.col("n11")),
                    pm_lo,
                    lambda acc, k: step(acc, k),
                ),
            ).otherwise(pm_lo),
        ).alias("_pm_obs"),
    )
    scored = walk.select(
        "*",
        F.when(
            F.col("_pm_obs").isNotNull(),
            F.when(
                khi > klo,
                F.aggregate(
                    F.sequence(klo + 1, khi),
                    F.struct(
                        pm_lo.alias("pm"),
                        F.when(pm_lo <= F.col("_pm_obs") + 1, term(pm_lo))
                        .otherwise(F.lit(0).cast("bigint"))
                        .alias("s"),
                    ),
                    lambda acc, k: F.struct(
                        step(acc["pm"], k).alias("pm"),
                        (
                            acc["s"]
                            + F.when(
                                step(acc["pm"], k) <= F.col("_pm_obs") + 1,
                                term(step(acc["pm"], k)),
                            ).otherwise(F.lit(0).cast("bigint"))
                        ).alias("s"),
                    ),
                    lambda acc: acc["s"],
                ),
            ).otherwise(
                F.when(pm_lo <= F.col("_pm_obs") + 1, term(pm_lo)).otherwise(
                    F.lit(0).cast("bigint")
                )
            ),
        ).alias("_ptr"),
    )
    orat = F.when(
        (F.col("n10") * F.col("n01")) > 0,
        (F.col("n11") * F.col("n00")).cast("double")
        / (F.col("n10") * F.col("n01")).cast("double"),
    )
    return scored.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(orat, round_to).alias("odds_ratio"),
        # explicit NULL gate: least() SKIPS nulls, so an ungated
        # least(NULL, 1.0) would read 1.0 instead of NULL
        F.round(
            F.when(
                F.col("_ptr").isNotNull(),
                F.least(F.col("_ptr").cast("double") / F.lit(1e12), F.lit(1.0)),
            ),
            round_to,
        ).alias("p"),
        F.coalesce(
            F.col("_ptr") < F.lit(alpha_trillionths), F.lit(False)
        ).alias("significant"),
    )


def fisher_oracle_sql(
    from_sql: str,
    max_n: int = 1_000_000,
    alpha_trillionths: int = 50_000_000_000,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`fisher_exact`; ``from_sql`` must yield
    boolean columns ``a`` and ``b``. Same micro-ln recurrence (here a
    recursive CTE over k), same trillionth-quantized tail sum."""

    def fl(x: str) -> str:
        return f"CAST(floor(ln(CAST({x} AS DOUBLE)) * 1000000) AS BIGINT)"

    def lfact(mm: str) -> str:
        return (
            f"CAST(coalesce(list_sum(list_transform(CASE WHEN {mm} >= 2 THEN"
            f" generate_series(CAST(2 AS BIGINT), CAST({mm} AS BIGINT))"
            f" ELSE [] END, i -> {fl('i')})), 0) AS BIGINT)"
        )

    pm_lo = (
        f"{lfact('r1')} + {lfact('r2')} + {lfact('c1')} + {lfact('c2')}"
        f" - {lfact('n')} - {lfact('klo')} - {lfact('r1 - klo')}"
        f" - {lfact('c1 - klo')} - {lfact('r2 - c1 + klo')}"
    )
    return f"""WITH RECURSIVE src AS ({from_sql}),
cells AS (SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(coalesce(sum(CASE WHEN a AND b THEN 1 ELSE 0 END), 0) AS BIGINT) AS n11,
    CAST(coalesce(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END), 0) AS BIGINT) AS n10,
    CAST(coalesce(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END), 0) AS BIGINT) AS n01,
    CAST(coalesce(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END), 0) AS BIGINT) AS n00
  FROM src WHERE a IS NOT NULL AND b IS NOT NULL),
m AS (SELECT *, n11 + n10 AS r1, n01 + n00 AS r2,
        n11 + n01 AS c1, n10 + n00 AS c2,
        greatest(CAST(0 AS BIGINT), (n11 + n01) - (n01 + n00)) AS klo,
        least(n11 + n10, n11 + n01) AS khi
      FROM cells),
walk AS (
  SELECT klo AS k, {pm_lo} AS pm FROM m
    WHERE n > 0 AND n <= {max_n}
  UNION ALL
  SELECT w.k + 1, w.pm + {fl('m.r1 - w.k')} + {fl('m.c1 - w.k')}
      - {fl('w.k + 1')} - {fl('m.r2 - m.c1 + w.k + 1')}
    FROM walk w, m WHERE w.k < m.khi),
obs AS (SELECT w.pm AS pm_obs FROM walk w, m WHERE w.k = m.n11),
tail AS (SELECT CAST(coalesce(sum(CASE WHEN w.pm <= o.pm_obs + 1 THEN
      CAST(round(exp(CAST(w.pm AS DOUBLE) / 1000000.0) * 1000000000000.0)
           AS BIGINT) ELSE 0 END), 0) AS BIGINT) AS ptr,
    CAST(count(*) AS BIGINT) AS n_walk
  FROM walk w, obs o)
SELECT n, n11, n10, n01, n00,
  round(CASE WHEN n10 * n01 > 0 THEN CAST(n11 * n00 AS DOUBLE)
        / CAST(n10 * n01 AS DOUBLE) END, {round_to}) AS odds_ratio,
  round(CASE WHEN n_walk > 0 THEN
        least(CAST(ptr AS DOUBLE) / 1e12, 1.0) END, {round_to}) AS p,
  coalesce(n_walk > 0 AND ptr < {alpha_trillionths}, FALSE) AS significant
FROM m, tail"""


def isotonic_calibration(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 64,
    round_to: int = 6,
) -> DataFrame:
    """Isotonic calibration map (PAVA — Ayer et al. 1955; the binned
    recalibration trainer of Zadrozny & Elkan KDD'02): fits the
    monotone step function closest (weighted squared loss) to the
    per-bin empirical accuracy of a probability score, which is what
    ``calibration_report``/``ece`` MEASURE but cannot FIX. Returns the
    ≤``n_bins``-row map ``(bin, n, pos, raw_rate, calibrated)`` —
    monotone in ``bin`` by construction; join rows to it on their bin
    to serve calibrated probabilities (:func:`isotonic_apply`).

    Machinery: instead of the sequential pool-adjacent-violators loop
    (stateful, engine-hostile), both engines evaluate the MINIMAX
    characterization of isotonic regression (Robertson, Wright &
    Dykstra 1988, §1.2):

        iso(i) = max_{j<=i} min_{k>=i} mean(pos over bins j..k)

    where each interval mean comes from integer prefix sums,
    ``(P_k − P_{j-1}) / (N_k − N_{j-1})`` — ONE IEEE division (exactly
    rounded, hence bit-identical across engines) rounded 12dp before
    the min/max lattice walk. The pair/triple lattice is O(n_bins³)
    rows — 262k at the default 64 bins, INDEPENDENT of corpus size.

    Scale shape: one partial-aggregatable groupBy on the bin id
    (corpus → ≤n_bins rows), then windows and self-joins over that
    bounded table only. Probabilities micro-quantize before binning
    (the calibration_report contract: ties and bin membership are
    integer facts shared by both engines); out-of-[0,1] clamps; NULL
    prob/label rows are excluded. Empty input → empty map.

    Reference scope note: eliassona/xmlschemavalidator has no dataset
    layer (core.clj:263-285); north-rule addition completing the
    calibration family (report → ECE/MCE verdict → THIS fix).
    """
    if n_bins < 1:
        raise ValueError(f"isotonic_calibration: n_bins must be >= 1, got {n_bins}")
    lab = F.col(label_col).cast("boolean")
    p_micro = F.least(
        F.greatest(
            F.floor(F.col(prob_col).cast("double") * F.lit(1_000_000)).cast(
                "bigint"
            ),
            F.lit(0).cast("bigint"),
        ),
        F.lit(1_000_000).cast("bigint"),
    )
    base = df.where(F.col(prob_col).isNotNull() & lab.isNotNull()).select(
        F.least(
            F.floor(p_micro * n_bins / F.lit(1_000_000)).cast("bigint"),
            F.lit(n_bins - 1).cast("bigint"),
        ).alias("bin"),
        lab.cast("long").alias("_y"),
    )
    g = base.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_y").cast("bigint").alias("pos"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pre = g.select(
        "bin",
        "n",
        "pos",
        F.sum("n").over(w).cast("bigint").alias("_cn"),
        F.sum("pos").over(w).cast("bigint").alias("_cp"),
    )
    jside = pre.select(
        F.col("bin").alias("_bj"),
        (F.col("_cp") - F.col("pos")).alias("_pj0"),  # P_{j-1}
        (F.col("_cn") - F.col("n")).alias("_nj0"),  # N_{j-1}
    )
    kside = pre.select(
        F.col("bin").alias("_bk"),
        F.col("_cp").alias("_pk"),
        F.col("_cn").alias("_nk"),
    )
    pairs = F.broadcast(jside).join(
        F.broadcast(kside), F.col("_bj") <= F.col("_bk")
    ).select(
        "_bj",
        "_bk",
        F.round(
            (F.col("_pk") - F.col("_pj0")).cast("double")
            / (F.col("_nk") - F.col("_nj0")).cast("double"),
            12,
        ).alias("_mean"),
    )
    bins_i = pre.select(F.col("bin").alias("_bi"))
    inner = (
        F.broadcast(bins_i)
        .join(
            F.broadcast(pairs),
            (F.col("_bj") <= F.col("_bi")) & (F.col("_bi") <= F.col("_bk")),
        )
        .groupBy("_bi", "_bj")
        .agg(F.min("_mean").alias("_mmin"))
        .groupBy("_bi")
        .agg(F.max("_mmin").alias("_iso"))
    )
    return (
        pre.join(F.broadcast(inner), pre["bin"] == inner["_bi"])
        .select(
            "bin",
            "n",
            "pos",
            F.round(
                F.col("pos").cast("double") / F.col("n").cast("double"), round_to
            ).alias("raw_rate"),
            F.round(F.col("_iso"), round_to).alias("calibrated"),
        )
        .orderBy("bin")
    )


def isotonic_apply(
    df: DataFrame,
    prob_col: str,
    calibration_map: DataFrame,
    n_bins: int = 64,
    out_col: str = "calibrated",
) -> DataFrame:
    """Serve an :func:`isotonic_calibration` map: adds ``out_col`` by
    broadcast-joining each row's bin to the ≤n_bins-row map (bins the
    map never saw — possible when serving a different split — read
    NULL; handle upstream). Narrow: one projection + one broadcast
    join, no shuffle of the corpus."""
    p_micro = F.least(
        F.greatest(
            F.floor(F.col(prob_col).cast("double") * F.lit(1_000_000)).cast(
                "bigint"
            ),
            F.lit(0).cast("bigint"),
        ),
        F.lit(1_000_000).cast("bigint"),
    )
    binned = df.withColumn(
        "_apply_bin",
        F.least(
            F.floor(p_micro * n_bins / F.lit(1_000_000)).cast("bigint"),
            F.lit(n_bins - 1).cast("bigint"),
        ),
    )
    cmap = calibration_map.select(
        F.col("bin").alias("_apply_bin"), F.col("calibrated").alias(out_col)
    )
    return binned.join(F.broadcast(cmap), "_apply_bin", "left").drop("_apply_bin")


def isotonic_oracle_sql(
    from_sql: str,
    n_bins: int = 64,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`isotonic_calibration`; ``from_sql`` must
    yield ``prob`` (double) and ``label`` (boolean-castable). Same
    micro-quantized binning, same 12dp interval means, same minimax
    lattice."""
    return f"""WITH src AS ({from_sql}),
b AS (SELECT least(CAST(floor(least(greatest(CAST(floor(
          CAST(prob AS DOUBLE) * 1000000) AS BIGINT), 0), 1000000)
          * {n_bins} / 1000000) AS BIGINT), {n_bins - 1}) AS bin,
        CAST(CAST(label AS BOOLEAN) AS BIGINT) AS y
      FROM src WHERE prob IS NOT NULL AND label IS NOT NULL),
g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        CAST(coalesce(sum(y), 0) AS BIGINT) AS pos
      FROM b GROUP BY bin),
pre AS (SELECT bin, n, pos,
        CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
        CAST(sum(pos) OVER (ORDER BY bin) AS BIGINT) AS cp
      FROM g),
pairs AS (SELECT j.bin AS bj, k.bin AS bk,
        round(CAST(k.cp - (j.cp - j.pos) AS DOUBLE)
              / CAST(k.cn - (j.cn - j.n) AS DOUBLE), 12) AS m
      FROM pre j, pre k WHERE j.bin <= k.bin),
inner_min AS (SELECT i.bin AS bi, p.bj, min(p.m) AS mmin
      FROM pre i, pairs p WHERE p.bj <= i.bin AND i.bin <= p.bk
      GROUP BY i.bin, p.bj),
iso AS (SELECT bi, max(mmin) AS v FROM inner_min GROUP BY bi)
SELECT pre.bin, pre.n, pre.pos,
  round(CAST(pre.pos AS DOUBLE) / CAST(pre.n AS DOUBLE), {round_to}) AS raw_rate,
  round(iso.v, {round_to}) AS calibrated
FROM pre JOIN iso ON pre.bin = iso.bi
ORDER BY pre.bin"""


def conformal_gate(
    df: DataFrame,
    score_col: str,
    id_col: str,
    alpha_milli: int = 100,
    calib_fraction: float = 0.5,
    salt: str = "conformal",
    quantum: int = 1_000_000,
    round_to: int = 6,
) -> DataFrame:
    """Split conformal prediction gate (Vovk et al. 2005; Papadopoulos
    et al. ECML'02; survey: Angelopoulos & Bates 2023) over a
    NONCONFORMITY score (higher = stranger): splits the corpus into a
    calibration and an evaluation half by the deterministic md5 key,
    sets the threshold at the ⌈(n_cal+1)(1−α)⌉-th smallest calibration
    score, and audits the distribution-free marginal guarantee
    P[score ≤ threshold] ≥ 1−α on the held-out half. ONE row
    ``(n_calib, n_eval, k_rank, threshold, coverage_eval, target,
    covered)`` — the acceptance gate for "flag every doc whose
    anomaly/perplexity/OOD score exceeds what 1−α of exchangeable data
    reaches", with a finite-sample guarantee no quantile-of-the-
    training-set heuristic carries.

    Exactness: scores quantize to integer ``quantum``-ths (the roc_auc
    distinct-grid contract), the rank selection is a cumulative count
    over the bounded quantized-score table (smallest q with
    cum ≥ k_rank — exact, tie-deterministic), and coverage is an exact
    integer rational. ``covered`` compares integer milli-units.
    ``target`` = 1 − α rounded; NULL threshold/coverage when the
    calibration half is empty.

    Scale shape: one narrow md5 filter per half (pushes into the scan),
    one partial-aggregatable groupBy on the quantized score, a window
    over the DISTINCT-score table only, and one broadcast of the
    single-row threshold into the eval-side aggregate. Nothing
    corpus-sized sits in one task.

    Reference scope note: eliassona/xmlschemavalidator has no dataset
    layer (core.clj:263-285); north-rule addition — the
    uncertainty-quantification sibling of the calibration family.
    """
    if not 0 < alpha_milli < 1000:
        raise ValueError(
            f"conformal_gate: alpha_milli must be in (0, 1000), got {alpha_milli}"
        )
    from xmlschemavalidator_spark.sampling import _sample_key, md5_threshold

    key = _sample_key(F.col(id_col), salt)
    thr = F.lit(md5_threshold(calib_fraction))
    base = df.where(
        F.col(score_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        (key < thr).alias("_cal"),
        F.floor(F.col(score_col).cast("double") * F.lit(quantum))
        .cast("bigint")
        .alias("_q"),
    )
    cal = base.where(F.col("_cal"))
    ev = base.where(~F.col("_cal"))
    g = cal.groupBy("_q").agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    w = Window.orderBy("_q").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        "_q", F.sum("_c").over(w).cast("bigint").alias("_cum")
    )
    # k = ceil((n+1)(1-alpha)) in exact integer milli-arithmetic,
    # clamped to n (alpha smaller than 1/(n+1) cannot be certified —
    # the classic finite-sample limit, surfaced by k_rank == n_calib)
    n_cal = cal.agg(F.count(F.lit(1)).cast("bigint").alias("n_calib"))
    k = F.least(
        F.ceil((F.col("n_calib") + 1) * (1000 - alpha_milli) / F.lit(1000.0))
        .cast("bigint"),
        F.col("n_calib"),
    )
    kn = F.broadcast(n_cal.select("n_calib", k.alias("k_rank")))
    thr_row = (
        cum.join(kn, F.col("_cum") >= F.col("k_rank"))
        .groupBy("n_calib", "k_rank")
        .agg(F.min("_q").alias("threshold_q"))
    )
    # count eval rows at-or-below the threshold with one broadcast join.
    # The eval aggregate always yields exactly ONE row (n_eval = 0 when
    # the eval half is empty — the crossJoin against the 1-row threshold
    # keeps that invariant); when the CALIBRATION half was empty,
    # thr_row is empty, this whole branch is empty, and the fallback
    # below emits the NULL-threshold row instead.
    evagg = (
        ev.crossJoin(
            F.broadcast(thr_row.select(F.col("threshold_q").alias("_tq")))
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            F.coalesce(
                F.sum((F.col("_q") <= F.col("_tq")).cast("long")),
                F.lit(0),
            )
            .cast("bigint")
            .alias("_n_cov"),
        )
    )
    cov = thr_row.crossJoin(F.broadcast(evagg))
    # empty calibration half: emit the row with NULLs (the crossJoin
    # above would drop everything), via a left anti fallback
    fallback = (
        n_cal.where(F.col("n_calib") == 0)
        .crossJoin(ev.agg(F.count(F.lit(1)).cast("bigint").alias("n_eval")))
        .select(
            "n_calib",
            F.lit(None).cast("bigint").alias("k_rank"),
            F.lit(None).cast("bigint").alias("threshold_q"),
            "n_eval",
            F.lit(None).cast("bigint").alias("_n_cov"),
        )
    )
    out = cov.unionByName(fallback)
    coverage = F.col("_n_cov").cast("double") / F.col("n_eval").cast("double")
    return out.select(
        "n_calib",
        "n_eval",
        "k_rank",
        F.round(
            F.col("threshold_q").cast("double") / F.lit(float(quantum)), round_to
        ).alias("threshold"),
        F.round(
            F.when(F.col("n_eval") > 0, coverage), round_to
        ).alias("coverage_eval"),
        F.round(F.lit((1000 - alpha_milli) / 1000.0), round_to).alias("target"),
        F.coalesce(
            F.when(
                F.col("n_eval") > 0,
                F.col("_n_cov") * 1000 >= F.col("n_eval") * (1000 - alpha_milli),
            ),
            F.lit(False),
        ).alias("covered"),
    )


def conformal_oracle_sql(
    from_sql: str,
    alpha_milli: int = 100,
    calib_fraction: float = 0.5,
    salt: str = "conformal",
    quantum: int = 1_000_000,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`conformal_gate`; ``from_sql`` must yield
    ``id`` and ``score``. Same md5 split, same quantized rank
    selection, same integer coverage compare."""
    from xmlschemavalidator_spark.sampling import md5_threshold, sample_key_sql

    key = sample_key_sql("id", salt)
    thr = md5_threshold(calib_fraction)
    return f"""WITH src AS ({from_sql}),
b AS (SELECT {key} < '{thr}' AS cal,
        CAST(floor(CAST(score AS DOUBLE) * {quantum}) AS BIGINT) AS q
      FROM src WHERE score IS NOT NULL AND id IS NOT NULL),
ncal AS (SELECT CAST(count(*) AS BIGINT) AS n_calib FROM b WHERE cal),
kr AS (SELECT n_calib,
        CASE WHEN n_calib > 0 THEN least(CAST(ceil(
            (n_calib + 1) * {1000 - alpha_milli} / 1000.0) AS BIGINT), n_calib)
        END AS k_rank FROM ncal),
cum AS (SELECT q, CAST(sum(count(*)) OVER (ORDER BY q) AS BIGINT) AS c
        FROM b WHERE cal GROUP BY q),
thr_row AS (SELECT min(q) AS threshold_q FROM cum, kr WHERE c >= kr.k_rank),
ev AS (SELECT CAST(count(*) AS BIGINT) AS n_eval,
        CAST(coalesce(sum(CASE WHEN q <= (SELECT threshold_q FROM thr_row)
            THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_cov
       FROM b WHERE NOT cal)
SELECT kr.n_calib, ev.n_eval, kr.k_rank,
  round(CAST((SELECT threshold_q FROM thr_row) AS DOUBLE) / {quantum},
      {round_to}) AS threshold,
  round(CASE WHEN ev.n_eval > 0 AND kr.n_calib > 0 THEN
      CAST(ev.n_cov AS DOUBLE) / CAST(ev.n_eval AS DOUBLE) END,
      {round_to}) AS coverage_eval,
  round({(1000 - alpha_milli)} / 1000.0, {round_to}) AS target,
  coalesce(ev.n_eval > 0 AND kr.n_calib > 0
      AND ev.n_cov * 1000 >= ev.n_eval * {1000 - alpha_milli}, FALSE)
      AS covered
FROM kr, ev"""


def did_test(
    df: DataFrame,
    treated_col: str,
    post_col: str,
    outcome_col: str,
    quantum: int = 1_000_000,
    z_crit_milli: int = 1960,
    round_to: int = 6,
) -> DataFrame:
    """Difference-in-differences (the canonical 2×2 design — Card &
    Krueger AER'94 popularized; textbook form Angrist & Pischke §5.2):
    the experiment analyzer for when treatment was NOT randomized but a
    pre-period exists — the estimate is

        DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre)

    which differences away both the fixed group gap and the common time
    trend (the parallel-trends assumption is the disclosed identifying
    bet). ONE row ``(n, mean_t_pre, mean_t_post, mean_c_pre,
    mean_c_post, did, se, z, p, significant)`` with the unpooled
    (Welch-style) standard error √(Σ_cells s²/n) over the four cells —
    the large-sample normal test.

    Exactness: outcomes quantize to integer micro units; per-cell
    (n, Σq, Σq²) in DECIMAL(38,0) from ONE partial-agg pass (the cell
    id is two booleans — four groups at any corpus size); means and the
    four-term variance chain are fixed IEEE sequences over exact
    integers; ``significant`` compares |z|·1000 to the integer
    critical value. Any empty cell (or a singleton cell, whose variance
    is undefined) → NULL did/se/z/p, significant = false, never div/0.

    Scale shape: one scan → four rows → one row. Companion to
    :func:`cuped_test` (randomized + covariate) — this is the
    non-randomized + pre-period member of the family.

    Reference scope note: eliassona/xmlschemavalidator has no dataset
    layer (core.clj:263-285); north-rule analyzer.
    """
    t = F.col(treated_col).cast("boolean")
    p = F.col(post_col).cast("boolean")
    v = F.col(outcome_col).cast("double")
    base = df.where(t.isNotNull() & p.isNotNull() & v.isNotNull()).select(
        t.alias("_t"),
        p.alias("_p"),
        F.floor(v * F.lit(quantum)).cast("decimal(38,0)").alias("_q"),
    )
    cells = base.groupBy("_t", "_p").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_q").alias("_s"),
        F.sum(F.col("_q") * F.col("_q")).alias("_ss"),
    )

    def lane(agg_col: str, tt: bool, pp: bool):
        return F.sum(
            F.when(
                (F.col("_t") == tt) & (F.col("_p") == pp), F.col(agg_col)
            )
        )

    wide = cells.agg(
        F.sum("_n").cast("bigint").alias("n"),
        *[
            lane("_n", tt, pp).cast("bigint").alias(f"_n{i}")
            for i, (tt, pp) in enumerate(
                [(True, False), (True, True), (False, False), (False, True)]
            )
        ],
        *[
            lane("_s", tt, pp).alias(f"_s{i}")
            for i, (tt, pp) in enumerate(
                [(True, False), (True, True), (False, False), (False, True)]
            )
        ],
        *[
            lane("_ss", tt, pp).alias(f"_ss{i}")
            for i, (tt, pp) in enumerate(
                [(True, False), (True, True), (False, False), (False, True)]
            )
        ],
    )

    def mean(i: int):
        return F.col(f"_s{i}").cast("double") / (
            F.col(f"_n{i}").cast("double") * F.lit(float(quantum))
        )

    def var_over_n(i: int):
        nn = F.col(f"_n{i}").cast("double")
        s = F.col(f"_s{i}").cast("double")
        ss = F.col(f"_ss{i}").cast("double")
        return (
            (ss - s * s / nn)
            / (nn - F.lit(1.0))
            / nn
            / F.lit(float(quantum) * float(quantum))
        )

    ok = (
        (F.col("_n0") > 1)
        & (F.col("_n1") > 1)
        & (F.col("_n2") > 1)
        & (F.col("_n3") > 1)
    )
    did = (mean(1) - mean(0)) - (mean(3) - mean(2))
    se = F.sqrt(var_over_n(0) + var_over_n(1) + var_over_n(2) + var_over_n(3))
    z = F.when(ok & (se > 0), did / se)
    return wide.select(
        "n",
        F.round(F.when(F.col("_n0") > 0, mean(0)), round_to).alias("mean_t_pre"),
        F.round(F.when(F.col("_n1") > 0, mean(1)), round_to).alias("mean_t_post"),
        F.round(F.when(F.col("_n2") > 0, mean(2)), round_to).alias("mean_c_pre"),
        F.round(F.when(F.col("_n3") > 0, mean(3)), round_to).alias("mean_c_post"),
        F.round(F.when(ok, did), round_to).alias("did"),
        F.round(F.when(ok, se), round_to).alias("se"),
        F.round(z, round_to).alias("z"),
        F.round(F.when(z.isNotNull(), _p_two_sided(F.abs(z))), round_to).alias("p"),
        F.coalesce(
            F.abs(z) * 1000 > F.lit(float(z_crit_milli)), F.lit(False)
        ).alias("significant"),
    )


def did_oracle_sql(
    from_sql: str,
    quantum: int = 1_000_000,
    z_crit_milli: int = 1960,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`did_test`; ``from_sql`` must yield
    boolean ``t``, ``p`` and double ``val``. Same micro cells, same
    fixed double chains."""

    def lane(col: str, tt: str, pp: str) -> str:
        return (
            f"CAST(sum(CASE WHEN t = {tt} AND p = {pp} THEN {col} END)"
            " AS DECIMAL(38,0))"
        )

    mean = [
        f"(CAST(s{i} AS DOUBLE) / (CAST(n{i} AS DOUBLE) * {float(quantum)}))"
        for i in range(4)
    ]
    von = [
        f"((CAST(ss{i} AS DOUBLE) - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE)"
        f" / CAST(n{i} AS DOUBLE)) / (CAST(n{i} AS DOUBLE) - 1.0)"
        f" / CAST(n{i} AS DOUBLE) / {float(quantum) * float(quantum)})"
        for i in range(4)
    ]
    ok = "n0 > 1 AND n1 > 1 AND n2 > 1 AND n3 > 1"
    did = f"(({mean[1]} - {mean[0]}) - ({mean[3]} - {mean[2]}))"
    se = f"sqrt({von[0]} + {von[1]} + {von[2]} + {von[3]})"
    z = f"(CASE WHEN {ok} AND {se} > 0 THEN {did} / {se} END)"
    lanes = []
    for i, (tt, pp) in enumerate(
        [("TRUE", "FALSE"), ("TRUE", "TRUE"), ("FALSE", "FALSE"), ("FALSE", "TRUE")]
    ):
        lanes.append(
            f"CAST(coalesce(sum(CASE WHEN t = {tt} AND p = {pp} THEN 1 END), 0)"
            f" AS BIGINT) AS n{i}"
        )
        lanes.append(f"{lane('q', tt, pp)} AS s{i}")
        lanes.append(f"{lane('q * q', tt, pp)} AS ss{i}")
    return f"""WITH src AS ({from_sql}),
b AS (SELECT CAST(t AS BOOLEAN) AS t, CAST(p AS BOOLEAN) AS p,
        CAST(floor(CAST(val AS DOUBLE) * {quantum}) AS DECIMAL(38,0)) AS q
      FROM src WHERE t IS NOT NULL AND p IS NOT NULL AND val IS NOT NULL),
wide AS (SELECT CAST(count(*) AS BIGINT) AS n, {", ".join(lanes)} FROM b)
SELECT n,
  round(CASE WHEN n0 > 0 THEN {mean[0]} END, {round_to}) AS mean_t_pre,
  round(CASE WHEN n1 > 0 THEN {mean[1]} END, {round_to}) AS mean_t_post,
  round(CASE WHEN n2 > 0 THEN {mean[2]} END, {round_to}) AS mean_c_pre,
  round(CASE WHEN n3 > 0 THEN {mean[3]} END, {round_to}) AS mean_c_post,
  round(CASE WHEN {ok} THEN {did} END, {round_to}) AS did,
  round(CASE WHEN {ok} THEN {se} END, {round_to}) AS se,
  round({z}, {round_to}) AS z,
  round(CASE WHEN {z} IS NOT NULL THEN {_p_two_sided_sql(f'abs({z})')} END,
      {round_to}) AS p,
  coalesce(abs({z}) * 1000 > {z_crit_milli}, FALSE) AS significant
FROM wide"""


def woe_iv(
    df: DataFrame,
    bin_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Weight-of-evidence / information-value feature audit (the
    credit-scoring standard — Siddiqi 2006): per bin of a feature,
    ``woe = ln((pos_b/P)/(neg_b/N))`` and ``iv_term = (pos_b/P −
    neg_b/N)·woe``; Σ iv_term is the feature's predictive strength
    (Siddiqi's ladder: <0.02 useless, 0.02–0.1 weak, 0.1–0.3 medium,
    >0.3 strong — see :func:`woe_iv_summary`). The monotone-risk view
    mutual_information doesn't give (WOE is SIGNED per bin — which
    bins push which way) and the input isotonic calibration pools.
    Returns ``(bin, n, pos, neg, woe, iv_term)`` per bin.

    Zero-cell convention (disclosed, the classic one): a bin with no
    positives or no negatives has undefined WOE — it reads NULL and is
    EXCLUDED from IV (no ±0.5 smoothing hiding in the number).
    Exactness: counts exact; the WOE argument is one exact rational
    ((pos_b·N)/(neg_b·P) — cross-multiplied integers, ONE IEEE
    division), ln on the shared libm contract, 12dp-rounded; iv_term
    multiplies an exact-difference rational by the rounded woe, rounded
    again. ONE partial-aggregatable groupBy on the bin — rows bounded
    by bins, not corpus.
    """
    lab = F.col(label_col).cast("boolean")
    base = df.where(F.col(bin_col).isNotNull() & lab.isNotNull()).select(
        F.col(bin_col).alias("bin"), lab.cast("long").alias("_y")
    )
    g = base.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_y").cast("bigint").alias("pos"),
    )
    g = g.withColumn("neg", (F.col("n") - F.col("pos")).cast("bigint"))
    tot = g.agg(
        F.sum("pos").cast("bigint").alias("_P"),
        F.sum("neg").cast("bigint").alias("_N"),
    )
    j = g.crossJoin(F.broadcast(tot))
    ok = (
        (F.col("pos") > 0)
        & (F.col("neg") > 0)
        & (F.col("_P") > 0)
        & (F.col("_N") > 0)
    )
    woe = F.round(
        F.log(
            (F.col("pos") * F.col("_N")).cast("double")
            / (F.col("neg") * F.col("_P")).cast("double")
        ),
        12,
    )
    diff = (
        F.col("pos").cast("double") / F.col("_P").cast("double")
        - F.col("neg").cast("double") / F.col("_N").cast("double")
    )
    return j.select(
        "bin",
        "n",
        "pos",
        "neg",
        F.round(F.when(ok, woe), round_to).alias("woe"),
        F.round(F.when(ok, diff * woe), round_to).alias("iv_term"),
    ).orderBy("bin")


def woe_iv_summary(
    df: DataFrame,
    bin_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """One-row IV verdict over :func:`woe_iv`'s bins: ``(n_bins,
    n_defined, iv, strength)`` with Siddiqi's ladder by integer-micro
    compare (useless/weak/medium/strong). IV terms are 12dp-rounded
    then DECIMAL-summed — order-free."""
    lab = F.col(label_col).cast("boolean")
    base = df.where(F.col(bin_col).isNotNull() & lab.isNotNull()).select(
        F.col(bin_col).alias("bin"), lab.cast("long").alias("_y")
    )
    g = base.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_y").cast("bigint").alias("pos"),
    )
    g = g.withColumn("neg", F.col("n") - F.col("pos"))
    tot = g.agg(
        F.sum("pos").cast("bigint").alias("_P"),
        F.sum("neg").cast("bigint").alias("_N"),
    )
    j = g.crossJoin(F.broadcast(tot))
    ok = (
        (F.col("pos") > 0)
        & (F.col("neg") > 0)
        & (F.col("_P") > 0)
        & (F.col("_N") > 0)
    )
    woe = F.round(
        F.log(
            (F.col("pos") * F.col("_N")).cast("double")
            / (F.col("neg") * F.col("_P")).cast("double")
        ),
        12,
    )
    diff = (
        F.col("pos").cast("double") / F.col("_P").cast("double")
        - F.col("neg").cast("double") / F.col("_N").cast("double")
    )
    term = F.round(diff * woe, 12).cast("decimal(38,12)")
    agg = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum(F.when(ok, 1).otherwise(0)).cast("bigint").alias("n_defined"),
        F.coalesce(
            F.sum(F.when(ok, term)), F.lit(0).cast("decimal(38,12)")
        ).alias("_iv"),
    )
    ivd = F.col("_iv").cast("double")

    def thr(x: str):  # exact DECIMAL compare — int casts round differently
        return F.col("_iv") < F.lit(x).cast("decimal(38,12)")

    return agg.select(
        "n_bins",
        "n_defined",
        F.round(F.when(F.col("n_defined") > 0, ivd), round_to).alias("iv"),
        F.when(F.col("n_defined") == 0, F.lit(None).cast("string"))
        .when(thr("0.02"), F.lit("useless"))
        .when(thr("0.1"), F.lit("weak"))
        .when(thr("0.3"), F.lit("medium"))
        .otherwise(F.lit("strong"))
        .alias("strength"),
    )


def woe_iv_oracle_sql(
    from_sql: str,
    summary: bool = False,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`woe_iv` / :func:`woe_iv_summary`;
    ``from_sql`` must yield ``bin`` and boolean ``label``."""
    # tp/tn, NOT P/N: g already holds a column n, and DuckDB resolves
    # identifiers case-insensitively (the CLAUDE.md N-vs-n trap)
    ok = "pos > 0 AND neg > 0 AND tp > 0 AND tn > 0"
    woe = (
        "round(ln(CAST(pos * tn AS DOUBLE) / CAST(neg * tp AS DOUBLE)), 12)"
    )
    diff = (
        "(CAST(pos AS DOUBLE) / CAST(tp AS DOUBLE)"
        " - CAST(neg AS DOUBLE) / CAST(tn AS DOUBLE))"
    )
    head = f"""WITH src AS ({from_sql}),
b AS (SELECT bin, CAST(CAST(label AS BOOLEAN) AS BIGINT) AS y FROM src
      WHERE bin IS NOT NULL AND label IS NOT NULL),
g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        CAST(coalesce(sum(y), 0) AS BIGINT) AS pos,
        CAST(count(*) - coalesce(sum(y), 0) AS BIGINT) AS neg
      FROM b GROUP BY bin),
tot AS (SELECT CAST(coalesce(sum(pos), 0) AS BIGINT) AS tp,
          CAST(coalesce(sum(neg), 0) AS BIGINT) AS tn FROM g),
j AS (SELECT g.*, tot.tp, tot.tn FROM g, tot)"""
    if not summary:
        return f"""{head}
SELECT bin, n, pos, neg,
  round(CASE WHEN {ok} THEN {woe} END, {round_to}) AS woe,
  round(CASE WHEN {ok} THEN {diff} * {woe} END, {round_to}) AS iv_term
FROM j ORDER BY bin"""
    return f"""{head},
agg AS (SELECT CAST(count(*) AS BIGINT) AS n_bins,
    CAST(coalesce(sum(CASE WHEN {ok} THEN 1 ELSE 0 END), 0) AS BIGINT)
        AS n_defined,
    coalesce(sum(CASE WHEN {ok} THEN
        CAST(round({diff} * {woe}, 12) AS DECIMAL(38,12)) END),
        CAST(0 AS DECIMAL(38,12))) AS iv_dec
  FROM j)
SELECT n_bins, n_defined,
  round(CASE WHEN n_defined > 0 THEN CAST(iv_dec AS DOUBLE) END,
      {round_to}) AS iv,
  CASE WHEN n_defined = 0 THEN NULL
       WHEN iv_dec < CAST(0.02 AS DECIMAL(38,12)) THEN 'useless'
       WHEN iv_dec < CAST(0.1 AS DECIMAL(38,12)) THEN 'weak'
       WHEN iv_dec < CAST(0.3 AS DECIMAL(38,12)) THEN 'medium'
       ELSE 'strong' END AS strength
FROM agg"""


def lift_chart(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    n_buckets: int = 10,
    quantum: int = 1_000_000,
    round_to: int = 6,
) -> DataFrame:
    """Cumulative gains / lift chart (the model-triage classic: sort by
    score descending, cut into ``n_buckets`` equal slices, ask how much
    of the positive class each slice captures): ``(bucket, n, pos,
    cum_pos, gain, lift)`` where gain = cumulative positive share at
    that depth and lift = (pos_b/n_b)/(P/N) — the top-decile lift is
    the number the ROC curve's AUC averages away ("the top 10% of
    scores holds 4.2× its share of positives").

    NO corpus-wide single-partition sort: the global rank is assembled
    from the quantized DISTINCT-score grid (the roc_auc contract) — a
    descending cumulative count per distinct score (bounded window) +
    a per-score row_number on the id tie-break (window PARTITIONED by
    the score) + one broadcast join; bucket = floor((rank−1)·B/N)+1 in
    pure integer math, identical in both engines (ntile's
    remainder-placement is reimplemented explicitly rather than
    trusted). Counts exact; gain/lift one IEEE division each. NULL
    score/label/id rows excluded.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    lab = F.col(label_col).cast("boolean")
    base = df.where(
        F.col(score_col).isNotNull() & lab.isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.floor(F.col(score_col).cast("double") * F.lit(quantum))
        .cast("bigint")
        .alias("_q"),
        F.col(id_col).alias("_id"),
        lab.cast("long").alias("_y"),
    )
    grid = base.groupBy("_q").agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    wg = Window.orderBy(F.col("_q").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = grid.select(
        "_q", (F.sum("_c").over(wg) - F.col("_c")).alias("_before")
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("_nt"),
        F.sum("_y").cast("bigint").alias("_pt"),
    )
    wq = Window.partitionBy("_q").orderBy(F.col("_id").asc())
    ranked = (
        base.withColumn("_intra", F.row_number().over(wq))
        .join(F.broadcast(cum), "_q")
        .crossJoin(F.broadcast(tot))
        .select(
            "_y",
            "_nt",
            "_pt",
            (
                F.floor(
                    (F.col("_before") + F.col("_intra") - 1)
                    * n_buckets
                    / F.col("_nt")
                )
                + 1
            )
            .cast("int")
            .alias("bucket"),
        )
    )
    per = ranked.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_y").cast("bigint").alias("pos"),
        F.max("_nt").alias("_nt"),
        F.max("_pt").alias("_pt"),
    )
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "bucket",
        "n",
        "pos",
        F.sum("pos").over(wb).cast("bigint").alias("cum_pos"),
        F.round(
            F.when(
                F.col("_pt") > 0,
                F.sum("pos").over(wb).cast("double") / F.col("_pt").cast("double"),
            ),
            round_to,
        ).alias("gain"),
        F.round(
            F.when(
                (F.col("_pt") > 0) & (F.col("n") > 0),
                (F.col("pos") * F.col("_nt")).cast("double")
                / (F.col("n") * F.col("_pt")).cast("double"),
            ),
            round_to,
        ).alias("lift"),
    ).orderBy("bucket")


def lift_chart_oracle_sql(
    from_sql: str,
    n_buckets: int = 10,
    quantum: int = 1_000_000,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`lift_chart`; ``from_sql`` must yield
    ``id``, ``score``, ``label``. Same grid-assembled rank, same
    integer bucket math."""
    return f"""WITH src AS ({from_sql}),
b AS (SELECT CAST(floor(CAST(score AS DOUBLE) * {quantum}) AS BIGINT) AS q,
        id, CAST(CAST(label AS BOOLEAN) AS BIGINT) AS y
      FROM src WHERE score IS NOT NULL AND label IS NOT NULL
        AND id IS NOT NULL),
grid AS (SELECT q, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY q),
cum AS (SELECT q, CAST(sum(c) OVER (ORDER BY q DESC) - c AS BIGINT)
          AS before FROM grid),
tot AS (SELECT CAST(count(*) AS BIGINT) AS nt,
          CAST(coalesce(sum(y), 0) AS BIGINT) AS pt FROM b),
ranked AS (SELECT b.y, tot.nt, tot.pt,
    CAST(floor((cum.before + row_number() OVER (PARTITION BY b.q
         ORDER BY b.id ASC) - 1) * {n_buckets} / tot.nt) + 1 AS INT)
      AS bucket
  FROM b JOIN cum USING (q), tot),
per AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
    CAST(coalesce(sum(y), 0) AS BIGINT) AS pos,
    max(nt) AS nt, max(pt) AS pt
  FROM ranked GROUP BY bucket)
SELECT bucket, n, pos,
  CAST(sum(pos) OVER (ORDER BY bucket) AS BIGINT) AS cum_pos,
  round(CASE WHEN pt > 0 THEN CAST(sum(pos) OVER (ORDER BY bucket)
        AS DOUBLE) / CAST(pt AS DOUBLE) END, {round_to}) AS gain,
  round(CASE WHEN pt > 0 AND n > 0 THEN CAST(pos * nt AS DOUBLE)
        / CAST(n * pt AS DOUBLE) END, {round_to}) AS lift
FROM per ORDER BY bucket"""


def holm_adjust(
    df: DataFrame,
    id_col: str,
    z_col: str = "z",
    alpha_micro: int = 50_000,
    round_to: int = 6,
) -> DataFrame:
    """Holm–Bonferroni step-down correction (Holm 1979) — the FWER
    member beside :func:`bh_fdr`'s FDR: BH bounds the false fraction
    AMONG the alarms (right for triage dashboards); Holm bounds the
    probability of ANY false alarm (right for ship/no-ship gates where
    one wrong rejection is the incident), uniformly more powerful than
    plain Bonferroni at the same guarantee. Sort the m p-values
    ascending; reject down the list until the FIRST i with
    p_i > α/(m−i+1), then stop — everything below the first failure
    stays retained regardless of its own p (the step-down property).

    Output per row: ``(id, z, p_value, holm_rank, p_adjusted,
    rejected)`` with the standard monotone adjusted p — the running max
    of (m−j+1)·p_j down the sorted prefix, clamped at 1 (12dp-rounded
    terms; compare ``p_adjusted ≤ α`` reproduces ``rejected``).

    Same contract as bh_fdr: input is a HYPOTHESIS table (one rounded z
    per segment — bounded by the segment lattice, never corpus-sized),
    ONE bounded window sort, NULL z rows carried with NULL p / not
    rejected and excluded from m, step compares cross-multiplied
    against the integer ``alpha_micro``, p-ties broken by id.
    """
    z = F.col(z_col).cast("double")
    p = F.when(z.isNotNull(), _p_two_sided(z))
    base = df.select(F.col(id_col), z.alias("_z"), p.alias("_p"))
    w_rank = Window.orderBy(F.asc_nulls_last("_p"), F.col(id_col))
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = base.select(
        F.col(id_col),
        "_z",
        "_p",
        F.when(F.col("_p").isNotNull(), F.row_number().over(w_rank))
        .cast("bigint")
        .alias("_i"),
        F.count("_p").over(w_all).cast("bigint").alias("_m"),
    )
    fails = (
        F.col("_p")
        * (F.col("_m") - F.col("_i") + 1).cast("double")
        * F.lit(1_000_000.0)
        > F.lit(float(alpha_micro))
    )
    w_pfx = Window.orderBy(F.asc_nulls_last("_p"), F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, 0
    )
    stepped = ranked.select(
        "*",
        F.min(F.when(fails, F.col("_i"))).over(w_all).alias("_first_fail"),
        F.max(
            F.when(
                F.col("_p").isNotNull(),
                F.round(
                    F.col("_p") * (F.col("_m") - F.col("_i") + 1).cast("double"),
                    12,
                ),
            )
        )
        .over(w_pfx)
        .alias("_padj_raw"),
    )
    return stepped.select(
        F.col(id_col),
        F.round("_z", round_to).alias("z"),
        F.round("_p", round_to).alias("p_value"),
        F.col("_i").alias("holm_rank"),
        F.round(
            F.when(
                F.col("_p").isNotNull(), F.least(F.col("_padj_raw"), F.lit(1.0))
            ),
            round_to,
        ).alias("p_adjusted"),
        F.coalesce(
            F.col("_p").isNotNull()
            & (
                F.col("_first_fail").isNull()
                | (F.col("_i") < F.col("_first_fail"))
            ),
            F.lit(False),
        ).alias("rejected"),
    )


def holm_oracle_sql(
    from_sql: str,
    id_sql: str,
    alpha_micro: int = 50_000,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`holm_adjust`; ``from_sql`` must yield
    ``{id_sql}`` and a rounded ``z``."""
    p = f"(CASE WHEN z IS NOT NULL THEN {_p_two_sided_sql('CAST(z AS DOUBLE)')} END)"
    return f"""WITH src AS ({from_sql}),
b AS (SELECT {id_sql} AS id, CAST(z AS DOUBLE) AS z, {p} AS p FROM src),
rk AS (SELECT *, CASE WHEN p IS NOT NULL THEN
         CAST(row_number() OVER (ORDER BY p ASC NULLS LAST, id) AS BIGINT)
       END AS i,
       CAST(count(p) OVER () AS BIGINT) AS m FROM b),
st AS (SELECT *,
    min(CASE WHEN p * CAST(m - i + 1 AS DOUBLE) * 1000000.0
             > {float(alpha_micro)} THEN i END) OVER () AS first_fail,
    max(CASE WHEN p IS NOT NULL THEN
        round(p * CAST(m - i + 1 AS DOUBLE), 12) END)
      OVER (ORDER BY p ASC NULLS LAST, id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS padj_raw
  FROM rk)
SELECT id AS {id_sql}, round(z, {round_to}) AS z, round(p, {round_to}) AS p_value,
  i AS holm_rank,
  round(CASE WHEN p IS NOT NULL THEN least(padj_raw, 1.0) END,
      {round_to}) AS p_adjusted,
  coalesce(p IS NOT NULL AND (first_fail IS NULL OR i < first_fail), FALSE)
      AS rejected
FROM st"""


def threshold_selection(
    df: DataFrame,
    score_col: str,
    label_col: str,
    quantum: int = 1_000_000,
    round_to: int = 6,
) -> DataFrame:
    """Operating-point selection over the full score grid — the step
    AFTER roc_auc says the ranking is good: pick the actual deployment
    threshold. One row per criterion ∈ {youden_j, f1, accuracy}:
    ``(criterion, threshold, tp, fp, fn, tn, tpr, fpr, precision,
    value)`` where value is the criterion's maximum (Youden's J =
    TPR − FPR, the informedness point; F1 via the 2TP/(2TP+FP+FN)
    single-division identity; raw accuracy) and threshold is the
    SMALLEST quantized score achieving it (ties deterministic,
    "predict positive when score ≥ threshold").

    Machinery: ONE groupBy on the quantized score (the roc_auc
    distinct-grid contract — bounded by quantum × range, not corpus),
    one descending cumulative window over that grid giving (tp, fp) at
    every candidate threshold simultaneously, then three bounded
    argmax reductions (TakeOrderedAndProject over the grid). Each
    criterion is an exact INTEGER rational (J's numerator the
    cross-multiplied tp·N_neg − fp·N_pos; F1 and accuracy plain count
    ratios); the argmax key is that rational through ONE
    exactly-rounded IEEE division, 12dp-rounded — engine-shared — with
    the smallest-threshold tie-break. Degenerate classes drop the
    undefined rows: J needs both classes, F1 needs positives; accuracy
    always emits.

    Reference scope note: eliassona/xmlschemavalidator has no dataset
    layer (core.clj:263-285); north-rule addition — the deployment
    bridge between roc_auc and the calibration/conformal family.
    """
    lab = F.col(label_col).cast("boolean")
    base = df.where(
        F.col(score_col).isNotNull() & lab.isNotNull()
    ).select(
        F.floor(F.col(score_col).cast("double") * F.lit(quantum))
        .cast("bigint")
        .alias("_q"),
        lab.cast("long").alias("_y"),
    )
    g = base.groupBy("_q").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_y").cast("bigint").alias("_p"),
    )
    wd = Window.orderBy(F.col("_q").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = g.agg(
        F.sum("_n").cast("bigint").alias("_N"),
        F.sum("_p").cast("bigint").alias("_P"),
    )
    cum = g.select(
        "_q",
        F.sum("_p").over(wd).cast("bigint").alias("_tp"),
        (F.sum("_n").over(wd) - F.sum("_p").over(wd))
        .cast("bigint")
        .alias("_fp"),
    ).crossJoin(F.broadcast(tot))
    neg = F.col("_N") - F.col("_P")
    fn = F.col("_P") - F.col("_tp")
    tn = neg - F.col("_fp")

    def argmax(metric_num, metric_den, criterion: str, guard):
        # max by exact rational (num/den): order by num·otherDen cross-
        # compare is unwieldy across rows with VARYING dens — here every
        # row of one criterion shares its denominator, so plain integer
        # num max suffices for J (den = P·Nneg) and accuracy (den = N);
        # F1's den varies per row -> compare via DECIMAL num/den product
        return (
            cum.where(guard)
            .select(
                "*",
                metric_num.cast("decimal(38,0)").alias("_mn"),
                metric_den.cast("decimal(38,0)").alias("_md"),
            )
            .select(
                "*",
                F.struct(
                    # rational compare key: num/den as a 12dp-rounded
                    # IEEE division (exact-rounded, engine-shared),
                    # then smallest threshold on ties
                    F.round(
                        F.col("_mn").cast("double") / F.col("_md").cast("double"),
                        12,
                    ).alias("v"),
                    (-F.col("_q")).alias("negq"),
                ).alias("_key"),
            )
            .orderBy(F.col("_key").desc())
            .limit(1)
            .select(
                F.lit(criterion).alias("criterion"),
                F.round(
                    F.col("_q").cast("double") / F.lit(float(quantum)), round_to
                ).alias("threshold"),
                F.col("_tp").alias("tp"),
                F.col("_fp").alias("fp"),
                fn.alias("fn"),
                tn.alias("tn"),
                F.round(
                    F.when(
                        F.col("_P") > 0,
                        F.col("_tp").cast("double") / F.col("_P").cast("double"),
                    ),
                    round_to,
                ).alias("tpr"),
                F.round(
                    F.when(
                        neg > 0,
                        F.col("_fp").cast("double") / neg.cast("double"),
                    ),
                    round_to,
                ).alias("fpr"),
                F.round(
                    F.when(
                        (F.col("_tp") + F.col("_fp")) > 0,
                        F.col("_tp").cast("double")
                        / (F.col("_tp") + F.col("_fp")).cast("double"),
                    ),
                    round_to,
                ).alias("precision"),
                F.round(
                    F.col("_mn").cast("double") / F.col("_md").cast("double"),
                    round_to,
                ).alias("value"),
            )
        )

    both = (F.col("_P") > 0) & (neg > 0)
    j = argmax(
        F.col("_tp") * neg - F.col("_fp") * F.col("_P"),
        F.col("_P") * neg,
        "youden_j",
        both,
    )
    f1 = argmax(
        2 * F.col("_tp"),
        2 * F.col("_tp") + F.col("_fp") + fn,
        "f1",
        (F.col("_P") > 0) & ((2 * F.col("_tp") + F.col("_fp") + fn) > 0),
    )
    acc = argmax(
        F.col("_tp") + tn,
        F.col("_N"),
        "accuracy",
        F.col("_N") > 0,
    )
    return j.unionByName(f1).unionByName(acc).orderBy("criterion")


def threshold_selection_oracle_sql(
    from_sql: str,
    quantum: int = 1_000_000,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`threshold_selection`; ``from_sql`` must
    yield ``score`` and ``label``. Same grid, same 12dp rational keys,
    same smallest-threshold ties."""
    head = f"""WITH src AS ({from_sql}),
b AS (SELECT CAST(floor(CAST(score AS DOUBLE) * {quantum}) AS BIGINT) AS q,
        CAST(CAST(label AS BOOLEAN) AS BIGINT) AS y
      FROM src WHERE score IS NOT NULL AND label IS NOT NULL),
g AS (SELECT q, CAST(count(*) AS BIGINT) AS n,
        CAST(coalesce(sum(y), 0) AS BIGINT) AS p FROM b GROUP BY q),
tot AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS nn,
          CAST(coalesce(sum(p), 0) AS BIGINT) AS pp FROM g),
cum AS (SELECT q,
        CAST(sum(p) OVER (ORDER BY q DESC) AS BIGINT) AS tp,
        CAST(sum(n) OVER (ORDER BY q DESC)
             - sum(p) OVER (ORDER BY q DESC) AS BIGINT) AS fp,
        tot.nn, tot.pp
      FROM g, tot)"""

    def pick(num: str, den: str, criterion: str, guard: str) -> str:
        return f"""(SELECT '{criterion}' AS criterion,
    round(CAST(q AS DOUBLE) / {float(quantum)}, {round_to}) AS threshold,
    tp, fp, pp - tp AS fn, (nn - pp) - fp AS tn,
    round(CASE WHEN pp > 0 THEN CAST(tp AS DOUBLE) / CAST(pp AS DOUBLE) END,
        {round_to}) AS tpr,
    round(CASE WHEN nn - pp > 0 THEN CAST(fp AS DOUBLE)
        / CAST(nn - pp AS DOUBLE) END, {round_to}) AS fpr,
    round(CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE)
        / CAST(tp + fp AS DOUBLE) END, {round_to}) AS precision,
    round(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE), {round_to}) AS value
  FROM cum WHERE {guard}
  ORDER BY round(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE), 12) DESC,
    q ASC LIMIT 1)"""

    j = pick(
        "tp * (nn - pp) - fp * pp", "pp * (nn - pp)", "youden_j",
        "pp > 0 AND nn - pp > 0",
    )
    f1 = pick(
        "2 * tp", "2 * tp + fp + (pp - tp)", "f1",
        "pp > 0 AND 2 * tp + fp + (pp - tp) > 0",
    )
    acc = pick("tp + ((nn - pp) - fp)", "nn", "accuracy", "nn > 0")
    return f"""{head}
SELECT * FROM ({j} UNION ALL {f1} UNION ALL {acc}) ORDER BY criterion"""


def fairness_audit(
    df: DataFrame,
    group_col: str,
    pred_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group fairness panel (the Hardt-Price-Srebro NeurIPS'16
    vocabulary): for each protected/segment group, ``(group, n,
    n_selected, selection_rate, base_rate, tpr, fpr, precision)`` of a
    boolean decision column against a boolean outcome column —
    selection_rate is the demographic-parity quantity, tpr/fpr the
    equalized-odds pair, precision the predictive-parity quantity (the
    three criteria that provably cannot all hold at once on unequal
    base rates — report all three, pick your policy). Counts exact from
    ONE partial-aggregatable groupBy; each rate one IEEE division;
    degenerate cells (no positives / no negatives in a group) read NULL
    rather than 0. NULL group/pred/label rows excluded.
    """
    g = F.col(group_col)
    pred = F.col(pred_col).cast("boolean")
    lab = F.col(label_col).cast("boolean")
    base = df.where(g.isNotNull() & pred.isNotNull() & lab.isNotNull()).select(
        g.alias("grp"), pred.alias("_s"), lab.alias("_y")
    )
    agg = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("_s").cast("long")).cast("bigint").alias("n_selected"),
        F.sum(F.col("_y").cast("long")).cast("bigint").alias("_np"),
        F.sum((F.col("_s") & F.col("_y")).cast("long")).cast("bigint").alias("_tp"),
        F.sum((F.col("_s") & ~F.col("_y")).cast("long")).cast("bigint").alias("_fp"),
    )
    neg = F.col("n") - F.col("_np")
    return agg.select(
        "grp",
        "n",
        "n_selected",
        F.round(
            F.col("n_selected").cast("double") / F.col("n").cast("double"),
            round_to,
        ).alias("selection_rate"),
        F.round(
            F.col("_np").cast("double") / F.col("n").cast("double"), round_to
        ).alias("base_rate"),
        F.round(
            F.when(
                F.col("_np") > 0,
                F.col("_tp").cast("double") / F.col("_np").cast("double"),
            ),
            round_to,
        ).alias("tpr"),
        F.round(
            F.when(neg > 0, F.col("_fp").cast("double") / neg.cast("double")),
            round_to,
        ).alias("fpr"),
        F.round(
            F.when(
                F.col("n_selected") > 0,
                F.col("_tp").cast("double") / F.col("n_selected").cast("double"),
            ),
            round_to,
        ).alias("precision"),
    ).orderBy("grp")


def fairness_summary(
    df: DataFrame,
    group_col: str,
    pred_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """One-row disparate-impact verdict over :func:`fairness_audit`'s
    groups: ``(n_groups, min_rate_group, max_rate_group,
    disparate_impact_ratio, passes_four_fifths, tpr_gap, fpr_gap)`` —
    the EEOC four-fifths rule (min selection rate / max selection rate
    ≥ 0.8) decided by the CROSS-MULTIPLIED exact-integer compare
    ``5·sel_min·n_max ≥ 4·sel_max·n_min`` (no float threshold), plus
    the equalized-odds gaps (max−min TPR/FPR over groups with defined
    values). Extremes are selected by 12dp-rounded rational keys with
    group-name tie-break — deterministic in both engines. Fewer than
    two groups (or an all-zero max rate) → NULL ratio, verdict false.
    """
    g = F.col(group_col)
    pred = F.col(pred_col).cast("boolean")
    lab = F.col(label_col).cast("boolean")
    base = df.where(g.isNotNull() & pred.isNotNull() & lab.isNotNull()).select(
        g.alias("grp"), pred.alias("_s"), lab.alias("_y")
    )
    agg = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("_s").cast("long")).cast("bigint").alias("sel"),
        F.sum(F.col("_y").cast("long")).cast("bigint").alias("np"),
        F.sum((F.col("_s") & F.col("_y")).cast("long")).cast("bigint").alias("tp"),
        F.sum((F.col("_s") & ~F.col("_y")).cast("long")).cast("bigint").alias("fp"),
    )
    rate_key = F.struct(
        F.round(F.col("sel").cast("double") / F.col("n").cast("double"), 12).alias(
            "v"
        ),
        F.col("grp").alias("g"),
    )
    lo = (
        agg.select("*", rate_key.alias("_k"))
        .orderBy(F.col("_k").asc())
        .limit(1)
        .select(
            F.col("grp").alias("min_rate_group"),
            F.col("sel").alias("_sel_min"),
            F.col("n").alias("_n_min"),
        )
    )
    hi = (
        agg.select("*", rate_key.alias("_k"))
        .orderBy(F.col("_k").desc())
        .limit(1)
        .select(
            F.col("grp").alias("max_rate_group"),
            F.col("sel").alias("_sel_max"),
            F.col("n").alias("_n_max"),
        )
    )
    tprs = agg.where(F.col("np") > 0).select(
        F.round(F.col("tp").cast("double") / F.col("np").cast("double"), 12).alias(
            "_t"
        )
    )
    fprs = agg.where((F.col("n") - F.col("np")) > 0).select(
        F.round(
            F.col("fp").cast("double") / (F.col("n") - F.col("np")).cast("double"),
            12,
        ).alias("_f")
    )
    gaps = (
        tprs.agg((F.max("_t") - F.min("_t")).alias("_tgap"))
        .crossJoin(fprs.agg((F.max("_f") - F.min("_f")).alias("_fgap")))
    )
    cnt = agg.agg(F.count(F.lit(1)).cast("bigint").alias("n_groups"))
    j = (
        cnt.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .crossJoin(F.broadcast(gaps))
    )
    ok = (F.col("n_groups") >= 2) & (F.col("_sel_max") > 0)
    return j.select(
        "n_groups",
        "min_rate_group",
        "max_rate_group",
        F.round(
            F.when(
                ok,
                (F.col("_sel_min") * F.col("_n_max")).cast("double")
                / (F.col("_sel_max") * F.col("_n_min")).cast("double"),
            ),
            round_to,
        ).alias("disparate_impact_ratio"),
        F.coalesce(
            F.when(
                ok,
                F.lit(5) * F.col("_sel_min") * F.col("_n_max")
                >= F.lit(4) * F.col("_sel_max") * F.col("_n_min"),
            ),
            F.lit(False),
        ).alias("passes_four_fifths"),
        F.round(F.col("_tgap"), round_to).alias("tpr_gap"),
        F.round(F.col("_fgap"), round_to).alias("fpr_gap"),
    )


def fairness_oracle_sql(
    from_sql: str,
    summary: bool = False,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`fairness_audit` / :func:`fairness_summary`;
    ``from_sql`` must yield ``grp``, boolean ``pred``, boolean
    ``label``."""
    head = f"""WITH src AS ({from_sql}),
b AS (SELECT grp, CAST(pred AS BOOLEAN) AS s, CAST(label AS BOOLEAN) AS y
      FROM src WHERE grp IS NOT NULL AND pred IS NOT NULL
        AND label IS NOT NULL),
agg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
    CAST(coalesce(sum(CASE WHEN s THEN 1 END), 0) AS BIGINT) AS sel,
    CAST(coalesce(sum(CASE WHEN y THEN 1 END), 0) AS BIGINT) AS np,
    CAST(coalesce(sum(CASE WHEN s AND y THEN 1 END), 0) AS BIGINT) AS tp,
    CAST(coalesce(sum(CASE WHEN s AND NOT y THEN 1 END), 0) AS BIGINT) AS fp
  FROM b GROUP BY grp)"""
    if not summary:
        return f"""{head}
SELECT grp, n, sel AS n_selected,
  round(CAST(sel AS DOUBLE) / CAST(n AS DOUBLE), {round_to}) AS selection_rate,
  round(CAST(np AS DOUBLE) / CAST(n AS DOUBLE), {round_to}) AS base_rate,
  round(CASE WHEN np > 0 THEN CAST(tp AS DOUBLE) / CAST(np AS DOUBLE) END,
      {round_to}) AS tpr,
  round(CASE WHEN n - np > 0 THEN CAST(fp AS DOUBLE)
      / CAST(n - np AS DOUBLE) END, {round_to}) AS fpr,
  round(CASE WHEN sel > 0 THEN CAST(tp AS DOUBLE) / CAST(sel AS DOUBLE) END,
      {round_to}) AS precision
FROM agg ORDER BY grp"""
    return f"""{head},
lo AS (SELECT grp AS min_rate_group, sel AS sel_min, n AS n_min FROM agg
       ORDER BY round(CAST(sel AS DOUBLE) / CAST(n AS DOUBLE), 12) ASC,
         grp ASC LIMIT 1),
hi AS (SELECT grp AS max_rate_group, sel AS sel_max, n AS n_max FROM agg
       ORDER BY round(CAST(sel AS DOUBLE) / CAST(n AS DOUBLE), 12) DESC,
         grp DESC LIMIT 1),
gaps AS (SELECT
    (SELECT max(round(CAST(tp AS DOUBLE) / CAST(np AS DOUBLE), 12))
       - min(round(CAST(tp AS DOUBLE) / CAST(np AS DOUBLE), 12))
     FROM agg WHERE np > 0) AS tgap,
    (SELECT max(round(CAST(fp AS DOUBLE) / CAST(n - np AS DOUBLE), 12))
       - min(round(CAST(fp AS DOUBLE) / CAST(n - np AS DOUBLE), 12))
     FROM agg WHERE n - np > 0) AS fgap),
cnt AS (SELECT CAST(count(*) AS BIGINT) AS n_groups FROM agg)
SELECT cnt.n_groups, lo.min_rate_group, hi.max_rate_group,
  round(CASE WHEN cnt.n_groups >= 2 AND hi.sel_max > 0 THEN
      CAST(lo.sel_min * hi.n_max AS DOUBLE)
      / CAST(hi.sel_max * lo.n_min AS DOUBLE) END, {round_to})
      AS disparate_impact_ratio,
  coalesce(CASE WHEN cnt.n_groups >= 2 AND hi.sel_max > 0 THEN
      5 * lo.sel_min * hi.n_max >= 4 * hi.sel_max * lo.n_min END, FALSE)
      AS passes_four_fifths,
  round(gaps.tgap, {round_to}) AS tpr_gap,
  round(gaps.fgap, {round_to}) AS fpr_gap
FROM cnt, lo, hi, gaps"""


def hosmer_lemeshow(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    id_col: str,
    n_buckets: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Hosmer–Lemeshow goodness-of-fit test (Hosmer & Lemeshow 1980) —
    the classic reported calibration STATISTIC completing the family:
    calibration_report/ECE describe, spiegelhalter_z tests per-row,
    HL tests the DECILE table everyone actually publishes:

        H = Σ_b (O_b − E_b)² / (n_b·p̄_b·(1−p̄_b)),   df = B − 2

    over equal-size score deciles (grid-assembled rank, the lift_chart
    machinery — no corpus-wide single-partition sort). ONE row
    ``(n, n_buckets_used, n_informative, h, dof, p, miscalibrated)``.

    Exactness: probabilities micro-quantize before everything; each
    bucket's O is an exact integer and E an exact integer in MICRO
    units, so the bucket term collapses to the all-integer rational

        (O·10⁶ − E)² · n_b / (E · (10⁶·n_b − E))

    — 12dp-rounded then DECIMAL-summed. Degenerate buckets (E = 0 or
    E = 10⁶·n_b: all-certain predictions) have an undefined term; they
    are EXCLUDED and counted in ``n_buckets_used − n_informative``
    (disclosed — the textbook prescription is merging, the honest
    engine behavior is surfacing). p from the chi²(df) upper tail via
    the Wilson–Hilferty cube-root normal (the Woolf/Kendall-W device);
    df = n_informative − 2, NULL p when df < 1.
    """
    if n_buckets < 3:
        raise ValueError(
            f"hosmer_lemeshow: n_buckets must be >= 3, got {n_buckets}"
        )
    lab = F.col(label_col).cast("boolean")
    base = df.where(
        F.col(prob_col).isNotNull() & lab.isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.least(
            F.greatest(
                F.floor(F.col(prob_col).cast("double") * F.lit(1_000_000)).cast(
                    "bigint"
                ),
                F.lit(0).cast("bigint"),
            ),
            F.lit(1_000_000).cast("bigint"),
        ).alias("_q"),
        F.col(id_col).alias("_id"),
        lab.cast("long").alias("_y"),
    )
    grid = base.groupBy("_q").agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    wg = Window.orderBy(F.col("_q").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = grid.select(
        "_q", (F.sum("_c").over(wg) - F.col("_c")).alias("_before")
    )
    tot = base.agg(F.count(F.lit(1)).cast("bigint").alias("_nt"))
    wq = Window.partitionBy("_q").orderBy(F.col("_id").asc())
    bucketed = (
        base.withColumn("_intra", F.row_number().over(wq))
        .join(F.broadcast(cum), "_q")
        .crossJoin(F.broadcast(tot))
        .select(
            "_q",
            "_y",
            "_nt",
            (
                F.floor(
                    (F.col("_before") + F.col("_intra") - 1)
                    * n_buckets
                    / F.col("_nt")
                )
                + 1
            )
            .cast("int")
            .alias("_b"),
        )
    )
    per = bucketed.groupBy("_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_y").cast("bigint").alias("_o"),
        F.sum("_q").cast("decimal(38,0)").alias("_e"),  # micro units
        F.max("_nt").alias("_nt"),
    )
    informative = (F.col("_e") > 0) & (
        F.col("_e") < F.lit(1_000_000).cast("decimal(38,0)") * F.col("_n")
    )
    diff = F.col("_o").cast("decimal(38,0)") * 1_000_000 - F.col("_e")
    term = F.round(
        (diff * diff * F.col("_n")).cast("double")
        / (
            F.col("_e")
            * (F.lit(1_000_000).cast("decimal(38,0)") * F.col("_n") - F.col("_e"))
        ).cast("double"),
        12,
    ).cast("decimal(38,12)")
    agg = per.agg(
        F.coalesce(F.sum("_n"), F.lit(0)).cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets_used"),
        F.coalesce(F.sum(F.when(informative, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n_informative"),
        F.coalesce(
            F.sum(F.when(informative, term)),
            F.lit(0).cast("decimal(38,12)"),
        )
        .cast("double")
        .alias("_h"),
    )
    dof = (F.col("n_informative") - 2).cast("bigint")
    dofd = dof.cast("double")
    ok = dof >= 1
    zwh = F.when(
        ok,
        (
            F.cbrt(F.col("_h") / dofd)
            - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * dofd))
        )
        / F.sqrt(F.lit(2.0) / (F.lit(9.0) * dofd)),
    )
    half_p = _p_two_sided(zwh) / F.lit(2.0)
    p = F.when(ok, F.when(zwh >= 0, half_p).otherwise(F.lit(1.0) - half_p))
    return agg.select(
        "n",
        "n_buckets_used",
        "n_informative",
        F.round(F.col("_h"), round_to).alias("h"),
        F.when(ok, dof).alias("dof"),
        F.round(p, round_to).alias("p"),
        F.coalesce(p < 0.05, F.lit(False)).alias("miscalibrated"),
    )


def hosmer_lemeshow_oracle_sql(
    from_sql: str,
    n_buckets: int = 10,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`hosmer_lemeshow`; ``from_sql`` must
    yield ``id``, ``prob``, ``label``. Same grid rank, same all-integer
    bucket rationals, same Wilson–Hilferty tail."""
    zwh = (
        "(CASE WHEN dof >= 1 THEN (cbrt(h / CAST(dof AS DOUBLE))"
        " - (1.0 - 2.0 / (9.0 * CAST(dof AS DOUBLE))))"
        " / sqrt(2.0 / (9.0 * CAST(dof AS DOUBLE))) END)"
    )
    half = f"({_p_two_sided_sql(zwh)} / 2.0)"
    p = (
        f"(CASE WHEN dof >= 1 THEN CASE WHEN {zwh} >= 0 THEN {half}"
        f" ELSE 1.0 - {half} END END)"
    )
    return f"""WITH src AS ({from_sql}),
b AS (SELECT least(greatest(CAST(floor(CAST(prob AS DOUBLE) * 1000000)
          AS BIGINT), 0), 1000000) AS q,
        id, CAST(CAST(label AS BOOLEAN) AS BIGINT) AS y
      FROM src WHERE prob IS NOT NULL AND label IS NOT NULL
        AND id IS NOT NULL),
grid AS (SELECT q, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY q),
cum AS (SELECT q, CAST(sum(c) OVER (ORDER BY q DESC) - c AS BIGINT)
          AS before FROM grid),
tot AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM b),
bk AS (SELECT b.q, b.y, tot.nt,
    CAST(floor((cum.before + row_number() OVER (PARTITION BY b.q
         ORDER BY b.id ASC) - 1) * {n_buckets} / tot.nt) + 1 AS INT) AS bkt
  FROM b JOIN cum USING (q), tot),
per AS (SELECT bkt, CAST(count(*) AS BIGINT) AS n,
    CAST(coalesce(sum(y), 0) AS BIGINT) AS o,
    CAST(coalesce(sum(q), 0) AS DECIMAL(38,0)) AS e,
    max(nt) AS nt
  FROM bk GROUP BY bkt),
agg AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n,
    CAST(count(*) AS BIGINT) AS n_buckets_used,
    CAST(coalesce(sum(CASE WHEN e > 0 AND e < CAST(1000000 AS DECIMAL(38,0)) * n
        THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_informative,
    CAST(coalesce(sum(CASE WHEN e > 0 AND e < CAST(1000000 AS DECIMAL(38,0)) * n
        THEN CAST(round(CAST((CAST(o AS DECIMAL(38,0)) * 1000000 - e)
            * (CAST(o AS DECIMAL(38,0)) * 1000000 - e) * n AS DOUBLE)
            / CAST(e * (CAST(1000000 AS DECIMAL(38,0)) * n - e) AS DOUBLE),
            12) AS DECIMAL(38,12)) END), 0) AS DOUBLE) AS h
  FROM per),
fin AS (SELECT *, CASE WHEN n_informative - 2 >= 1
          THEN CAST(n_informative - 2 AS BIGINT) END AS dof FROM agg)
SELECT n, n_buckets_used, n_informative,
  round(h, {round_to}) AS h, dof,
  round({p}, {round_to}) AS p,
  coalesce({p} < 0.05, FALSE) AS miscalibrated
FROM fin"""


def bayes_ab_test(
    df: DataFrame,
    variant_col: str,
    outcome_col: str,
    a_label,
    b_label,
    max_iterations: int = 1_000_000,
    decision_milli: int = 950,
    round_to: int = 6,
) -> DataFrame:
    """Exact Bayesian A/B test on conversion outcomes: the posterior
    probability that variant B's true rate beats variant A's under
    independent Beta(1,1)-prior posteriors — the number the frequentist
    family's p-values keep getting misread AS. Uses the closed form
    (Cook 2005's exact integral; the standard Beta-Binomial identity)

        P(p_B > p_A) = Σ_{i=0}^{α_B−1} B(α_A+i, β_A+β_B)
                        / ((β_B+i)·B(1+i, β_B)·B(α_A, β_A))

    with α = conversions+1, β = non-conversions+1. ONE row ``(n_a,
    conv_a, n_b, conv_b, rate_a, rate_b, prob_b_beats_a, decision)``
    with decision ∈ ship_b / ship_a / keep_testing by the integer
    ``decision_milli`` posterior threshold (default 95%).

    Exactness (the fisher_exact machinery): every Beta/Gamma argument
    is an INTEGER, so ln-terms are micro-ln factorial sums; the series
    walks the term recurrence Δln t = fl(α_A+i) + fl(β_B+i) −
    fl(β_B+i+1) − fl(1+i) + fl(1+i+β_B) − fl(α_A+β_A+β_B+i) — one
    scalar-accumulator HOF in Spark, a recursive CTE in DuckDB, the
    SAME quantization drift in both — and P sums trillionth-quantized
    exp terms in BIGINT, clamped to [0, 1]. The series length is α_B
    (B's conversions + 1): bounded experiment cohorts walk in
    microseconds; above ``max_iterations`` the exact path refuses
    (NULL probability, decision keep_testing) — at that scale the
    normal approximation (two_proportion_test) is exact for all
    practical purposes and THIS is the wrong tool. The decision
    compares the integer trillionths sum against the integer
    threshold.
    """
    v = F.col(variant_col)
    y = F.col(outcome_col).cast("boolean")
    base = df.where(v.isNotNull() & y.isNotNull()).select(
        v.alias("_v"), y.cast("long").alias("_y")
    )
    cells = base.agg(
        F.sum(F.when(F.col("_v") == a_label, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("_v") == a_label, F.col("_y")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("_v") == b_label, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("_v") == b_label, F.col("_y")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )

    def fl(x):
        return F.floor(F.log(x.cast("double")) * F.lit(1_000_000)).cast("bigint")

    def lfact(m):
        return F.when(
            m >= 2,
            F.aggregate(
                F.sequence(F.lit(2).cast("bigint"), m.cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda acc, i: acc + fl(i),
            ),
        ).otherwise(F.lit(0).cast("bigint"))

    m = cells.select(
        "*",
        (F.col("conv_a") + 1).alias("_aa"),
        (F.col("n_a") - F.col("conv_a") + 1).alias("_ba"),
        (F.col("conv_b") + 1).alias("_ab"),
        (F.col("n_b") - F.col("conv_b") + 1).alias("_bb"),
    )
    aa, ba, ab, bb = (F.col(c) for c in ("_aa", "_ba", "_ab", "_bb"))
    # ln t_0 = lnΓ(βA+βB) + lnΓ(αA+βA) − lnΓ(αA+βA+βB) − lnΓ(βA)
    m = m.select(
        "*",
        (
            lfact(ba + bb - 1)
            + lfact(aa + ba - 1)
            - lfact(aa + ba + bb - 1)
            - lfact(ba - 1)
        ).alias("_t0"),
    )

    def step(lnt, i):  # ln t_{i-1} -> ln t_i  (i >= 1)
        return (
            lnt
            + fl(aa + i - 1)
            + fl(bb + i - 1)
            - fl(bb + i)
            - fl(i)
            + fl(i + bb)
            - fl(aa + ba + bb + i - 1)
        )

    def term(lnt):
        return F.round(
            F.exp(lnt.cast("double") / F.lit(1_000_000.0))
            * F.lit(1_000_000_000_000.0)
        ).cast("bigint")

    ok = (
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (ab <= max_iterations)
    )
    walked = m.select(
        "*",
        F.when(
            ok,
            F.when(
                ab > 1,
                F.aggregate(
                    F.sequence(F.lit(1).cast("bigint"), ab - 1),
                    F.struct(
                        F.col("_t0").alias("lnt"),
                        term(F.col("_t0")).alias("s"),
                    ),
                    lambda acc, i: F.struct(
                        step(acc["lnt"], i).alias("lnt"),
                        (acc["s"] + term(step(acc["lnt"], i))).alias("s"),
                    ),
                    lambda acc: acc["s"],
                ),
            ).otherwise(term(F.col("_t0"))),
        ).alias("_ptr"),
    )
    rate = lambda c, n: F.round(
        F.when(F.col(n) > 0, F.col(c).cast("double") / F.col(n).cast("double")),
        round_to,
    )
    p_clamped = F.least(F.col("_ptr"), F.lit(1_000_000_000_000).cast("bigint"))
    return walked.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        rate("conv_a", "n_a").alias("rate_a"),
        rate("conv_b", "n_b").alias("rate_b"),
        F.round(
            F.when(
                F.col("_ptr").isNotNull(),
                p_clamped.cast("double") / F.lit(1e12),
            ),
            round_to,
        ).alias("prob_b_beats_a"),
        F.when(F.col("_ptr").isNull(), F.lit("keep_testing"))
        .when(
            p_clamped >= F.lit(decision_milli).cast("bigint") * 1_000_000_000,
            F.lit("ship_b"),
        )
        .when(
            p_clamped
            <= F.lit(1000 - decision_milli).cast("bigint") * 1_000_000_000,
            F.lit("ship_a"),
        )
        .otherwise(F.lit("keep_testing"))
        .alias("decision"),
    )


def bayes_ab_oracle_sql(
    from_sql: str,
    a_label: str,
    b_label: str,
    max_iterations: int = 1_000_000,
    decision_milli: int = 950,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`bayes_ab_test`; ``from_sql`` must yield
    ``variant`` and boolean ``outcome``. Same micro-ln recurrence as a
    recursive CTE, same trillionth sums, same integer decision."""

    def fl(x: str) -> str:
        return f"CAST(floor(ln(CAST({x} AS DOUBLE)) * 1000000) AS BIGINT)"

    def lfact(mm: str) -> str:
        return (
            f"CAST(coalesce(list_sum(list_transform(CASE WHEN {mm} >= 2 THEN"
            f" generate_series(CAST(2 AS BIGINT), CAST({mm} AS BIGINT))"
            f" ELSE [] END, i -> {fl('i')})), 0) AS BIGINT)"
        )

    t0 = (
        f"{lfact('ba + bb - 1')} + {lfact('aa + ba - 1')}"
        f" - {lfact('aa + ba + bb - 1')} - {lfact('ba - 1')}"
    )
    term = (
        "CAST(round(exp(CAST({lnt} AS DOUBLE) / 1000000.0)"
        " * 1000000000000.0) AS BIGINT)"
    )
    pcl = "least(ptr, CAST(1000000000000 AS BIGINT))"
    return f"""WITH RECURSIVE src AS ({from_sql}),
b0 AS (SELECT variant AS v, CAST(CAST(outcome AS BOOLEAN) AS BIGINT) AS y
       FROM src WHERE variant IS NOT NULL AND outcome IS NOT NULL),
cells AS (SELECT
    CAST(coalesce(sum(CASE WHEN v = '{a_label}' THEN 1 END), 0) AS BIGINT)
        AS n_a,
    CAST(coalesce(sum(CASE WHEN v = '{a_label}' THEN y END), 0) AS BIGINT)
        AS conv_a,
    CAST(coalesce(sum(CASE WHEN v = '{b_label}' THEN 1 END), 0) AS BIGINT)
        AS n_b,
    CAST(coalesce(sum(CASE WHEN v = '{b_label}' THEN y END), 0) AS BIGINT)
        AS conv_b
  FROM b0),
m AS (SELECT *, conv_a + 1 AS aa, n_a - conv_a + 1 AS ba,
        conv_b + 1 AS ab, n_b - conv_b + 1 AS bb FROM cells),
m2 AS (SELECT *, {t0} AS t0 FROM m),
walk AS (
  SELECT CAST(0 AS BIGINT) AS i, t0 AS lnt,
      {term.format(lnt="t0")} AS s
    FROM m2 WHERE n_a > 0 AND n_b > 0 AND ab <= {max_iterations}
  UNION ALL
  SELECT w.i + 1,
      w.lnt + {fl('m2.aa + w.i')} + {fl('m2.bb + w.i')}
        - {fl('m2.bb + w.i + 1')} - {fl('w.i + 1')}
        + {fl('w.i + 1 + m2.bb')} - {fl('m2.aa + m2.ba + m2.bb + w.i')},
      w.s + {term.format(lnt=(
          "w.lnt + " + fl('m2.aa + w.i') + " + " + fl('m2.bb + w.i')
          + " - " + fl('m2.bb + w.i + 1') + " - " + fl('w.i + 1')
          + " + " + fl('w.i + 1 + m2.bb')
          + " - " + fl('m2.aa + m2.ba + m2.bb + w.i')))}
    FROM walk w, m2 WHERE w.i < m2.ab - 1),
fin AS (SELECT s AS ptr FROM walk, m2 WHERE walk.i = m2.ab - 1)
SELECT m2.n_a, m2.conv_a, m2.n_b, m2.conv_b,
  round(CASE WHEN m2.n_a > 0 THEN CAST(m2.conv_a AS DOUBLE)
        / CAST(m2.n_a AS DOUBLE) END, {round_to}) AS rate_a,
  round(CASE WHEN m2.n_b > 0 THEN CAST(m2.conv_b AS DOUBLE)
        / CAST(m2.n_b AS DOUBLE) END, {round_to}) AS rate_b,
  round(CASE WHEN fin.ptr IS NOT NULL THEN
      CAST({pcl.replace('ptr', 'fin.ptr')} AS DOUBLE) / 1e12 END,
      {round_to}) AS prob_b_beats_a,
  CASE WHEN fin.ptr IS NULL THEN 'keep_testing'
       WHEN {pcl.replace('ptr', 'fin.ptr')}
         >= CAST({decision_milli} AS BIGINT) * 1000000000 THEN 'ship_b'
       WHEN {pcl.replace('ptr', 'fin.ptr')}
         <= CAST({1000 - decision_milli} AS BIGINT) * 1000000000
         THEN 'ship_a'
       ELSE 'keep_testing' END AS decision
FROM m2 LEFT JOIN fin ON TRUE"""


def exact_binomial_test(
    df: DataFrame,
    outcome_col: str,
    p0_milli: int,
    max_n: int = 1_000_000,
    alpha_trillionths: int = 50_000_000_000,
    round_to: int = 6,
) -> DataFrame:
    """Exact one-sample binomial test — the small-n companion to the
    normal-approximation rate checks (and :func:`fisher_exact`'s
    one-sample sibling): is the observed success count consistent with
    rate ``p0``? Two-sided p by the pmf rule (sum P(k) over every k at
    least as extreme — SciPy's binomtest convention), exact, no
    continuity fudge. ONE row ``(n, k, rate, p0, p, significant)``.

    Exactness (the fisher_exact machinery verbatim): ln pmf is INTEGER
    micro-ln — ln p0 and ln(1−p0) are Python-computed micro literals
    consumed by both engines, the base term ln pmf(0) = n·fl(1−p0),
    and each step k→k+1 adds fl(n−k) − fl(k+1) + (fl_p0 − fl_q0); the
    tail test is the integer compare pm(k) ≤ pm(obs)+1 and p sums
    trillionth-quantized exp terms in BIGINT, clamped to 1. One
    partial-agg cell pass, then an O(n) single-row recurrence walk
    (Spark scalar HOF / DuckDB recursive CTE) gated by ``max_n`` —
    beyond it the normal approximation is the right tool, disclosed.
    n = 0 → NULL p.
    """
    import math

    if not 0 < p0_milli < 1000:
        raise ValueError(
            f"exact_binomial_test: p0_milli must be in (0, 1000), got {p0_milli}"
        )
    p0 = p0_milli / 1000.0
    fl_p0 = round(math.log(p0) * 1_000_000)
    fl_q0 = round(math.log(1.0 - p0) * 1_000_000)
    y = F.col(outcome_col).cast("boolean")
    cells = df.where(y.isNotNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum(y.cast("long")), F.lit(0)).cast("bigint").alias("k"),
    )

    def fl(x):
        return F.floor(F.log(x.cast("double")) * F.lit(1_000_000)).cast("bigint")

    def step(pm, i):  # ln pmf at i-1 -> i
        return pm + fl(F.col("n") - i + 1) - fl(i) + F.lit(fl_p0 - fl_q0)

    def term(pm):
        return F.round(
            F.exp(pm.cast("double") / F.lit(1_000_000.0))
            * F.lit(1_000_000_000_000.0)
        ).cast("bigint")

    m = cells.select(
        "*", (F.col("n") * F.lit(fl_q0)).cast("bigint").alias("_pm0")
    )
    walked = m.select(
        "*",
        F.when(
            (F.col("n") > 0) & (F.col("n") <= max_n),
            F.when(
                F.col("k") > 0,
                F.aggregate(
                    F.sequence(F.lit(1).cast("bigint"), F.col("k")),
                    F.col("_pm0"),
                    lambda acc, i: step(acc, i),
                ),
            ).otherwise(F.col("_pm0")),
        ).alias("_pm_obs"),
    )
    scored = walked.select(
        "*",
        F.when(
            F.col("_pm_obs").isNotNull(),
            F.when(
                F.col("n") > 0,
                F.aggregate(
                    F.sequence(F.lit(1).cast("bigint"), F.col("n")),
                    F.struct(
                        F.col("_pm0").alias("pm"),
                        F.when(
                            F.col("_pm0") <= F.col("_pm_obs") + 1,
                            term(F.col("_pm0")),
                        )
                        .otherwise(F.lit(0).cast("bigint"))
                        .alias("s"),
                    ),
                    lambda acc, i: F.struct(
                        step(acc["pm"], i).alias("pm"),
                        (
                            acc["s"]
                            + F.when(
                                step(acc["pm"], i) <= F.col("_pm_obs") + 1,
                                term(step(acc["pm"], i)),
                            ).otherwise(F.lit(0).cast("bigint"))
                        ).alias("s"),
                    ),
                    lambda acc: acc["s"],
                ),
            ),
        ).alias("_ptr"),
    )
    return scored.select(
        "n",
        "k",
        F.round(
            F.when(
                F.col("n") > 0,
                F.col("k").cast("double") / F.col("n").cast("double"),
            ),
            round_to,
        ).alias("rate"),
        F.round(F.lit(p0), round_to).alias("p0"),
        F.round(
            F.when(
                F.col("_ptr").isNotNull(),
                F.least(F.col("_ptr").cast("double") / F.lit(1e12), F.lit(1.0)),
            ),
            round_to,
        ).alias("p"),
        F.coalesce(
            F.col("_ptr") < F.lit(alpha_trillionths), F.lit(False)
        ).alias("significant"),
    )


def exact_binomial_oracle_sql(
    from_sql: str,
    p0_milli: int,
    max_n: int = 1_000_000,
    alpha_trillionths: int = 50_000_000_000,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`exact_binomial_test`; ``from_sql`` must
    yield boolean ``y``. Same literals, same recursive walk."""
    import math

    p0 = p0_milli / 1000.0
    fl_p0 = round(math.log(p0) * 1_000_000)
    fl_q0 = round(math.log(1.0 - p0) * 1_000_000)

    def fl(x: str) -> str:
        return f"CAST(floor(ln(CAST({x} AS DOUBLE)) * 1000000) AS BIGINT)"

    return f"""WITH RECURSIVE src AS ({from_sql}),
cells AS (SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(coalesce(sum(CASE WHEN CAST(y AS BOOLEAN) THEN 1 END), 0)
         AS BIGINT) AS k
  FROM src WHERE y IS NOT NULL),
m AS (SELECT *, CAST(n * {fl_q0} AS BIGINT) AS pm0 FROM cells),
walk AS (
  SELECT CAST(0 AS BIGINT) AS i, pm0 AS pm FROM m
    WHERE n > 0 AND n <= {max_n}
  UNION ALL
  SELECT w.i + 1, w.pm + {fl('m.n - w.i')} - {fl('w.i + 1')}
      + CAST({fl_p0 - fl_q0} AS BIGINT)
    FROM walk w, m WHERE w.i < m.n),
obs AS (SELECT w.pm AS pm_obs FROM walk w, m WHERE w.i = m.k),
tail AS (SELECT CAST(coalesce(sum(CASE WHEN w.pm <= o.pm_obs + 1 THEN
      CAST(round(exp(CAST(w.pm AS DOUBLE) / 1000000.0) * 1000000000000.0)
           AS BIGINT) ELSE 0 END), 0) AS BIGINT) AS ptr,
    CAST(count(*) AS BIGINT) AS n_walk
  FROM walk w, obs o)
SELECT m.n, m.k,
  round(CASE WHEN m.n > 0 THEN CAST(m.k AS DOUBLE) / CAST(m.n AS DOUBLE)
      END, {round_to}) AS rate,
  round(CAST({p0} AS DOUBLE), {round_to}) AS p0,
  round(CASE WHEN n_walk > 0 THEN least(CAST(ptr AS DOUBLE) / 1e12, 1.0)
      END, {round_to}) AS p,
  coalesce(n_walk > 0 AND ptr < {alpha_trillionths}, FALSE) AS significant
FROM m, tail"""


def cochrans_q(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    outcome_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Cochran's Q test (Cochran 1950) — k binary treatments on the
    same n blocks: McNemar's k-extension and Friedman's binary
    sibling, the do-these-k-RULES-differ verdict over per-doc pass/
    fail verdicts (the engine's natural shape: k rule versions × one
    corpus). ONE row ``(n_blocks, n_treatments, q, dof, p,
    significant)`` with

        Q = k(k−1)·Σ_j (C_j − S/k)² / (k·S − Σ_i R_i²)

    where C_j are treatment success totals, R_i block success totals,
    S = ΣR_i; df = k−1, p via the Wilson–Hilferty chi² tail. Blocks
    with all-equal outcomes carry no information and drop out of Q
    algebraically; blocks NOT holding every treatment exactly once are
    EXCLUDED (complete-design contract, surfaced via n_blocks).

    Exactness: everything up to the final ratio is exact INTEGER in
    DECIMAL(38,0) — the numerator as k(k−1)·(k·ΣC_j² − S²) over the
    common k denominator folded in: Q = (k−1)·(k·ΣC² − S²)/(k·S − ΣR²)
    — one division. A zero denominator (every block constant) → NULL.
    Same two-partial-agg shape as friedman_test.
    """
    b, t = F.col(block_col), F.col(treatment_col)
    y = F.col(outcome_col).cast("boolean")
    base = df.where(b.isNotNull() & t.isNotNull() & y.isNotNull()).select(
        b.alias("_b"), t.alias("_t"), y.cast("long").alias("_y")
    )
    k_tot = base.select("_t").distinct().count()
    ok_blocks = (
        base.groupBy("_b", "_t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("_b")
        .agg(F.sum("_c").alias("_n"), F.count(F.lit(1)).alias("_kd"))
        .where((F.col("_n") == k_tot) & (F.col("_kd") == k_tot))
        .select("_b")
    )
    kept = base.join(F.broadcast(ok_blocks), "_b")
    zero = F.lit(0).cast("decimal(38,0)")
    per_t = kept.groupBy("_t").agg(
        F.sum("_y").cast("decimal(38,0)").alias("_C")
    )
    per_b = kept.groupBy("_b").agg(
        F.sum("_y").cast("decimal(38,0)").alias("_R")
    )
    ct = per_t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_treatments"),
        F.coalesce(F.sum("_C"), zero).alias("_S"),
        F.coalesce(F.sum(F.col("_C") * F.col("_C")), zero).alias("_C2"),
    )
    rt = per_b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.coalesce(F.sum(F.col("_R") * F.col("_R")), zero).alias("_R2"),
    )
    agg = rt.crossJoin(F.broadcast(ct))
    k = F.col("n_treatments").cast("decimal(38,0)")
    num = (k - 1) * (k * F.col("_C2") - F.col("_S") * F.col("_S"))
    den = k * F.col("_S") - F.col("_R2")
    ok = (F.col("n_blocks") > 0) & (F.col("n_treatments") >= 2) & (den > 0)
    q = F.when(ok, num.cast("double") / den.cast("double"))
    dof = (F.col("n_treatments") - 1).cast("bigint")
    dofd = dof.cast("double")
    zwh = F.when(
        ok,
        (
            F.cbrt(F.greatest(q, F.lit(0.0)) / dofd)
            - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * dofd))
        )
        / F.sqrt(F.lit(2.0) / (F.lit(9.0) * dofd)),
    )
    half_p = _p_two_sided(zwh) / F.lit(2.0)
    p = F.when(ok, F.when(zwh >= 0, half_p).otherwise(F.lit(1.0) - half_p))
    return agg.select(
        "n_blocks",
        "n_treatments",
        F.round(q, round_to).alias("q"),
        F.when(ok, dof).alias("dof"),
        F.round(p, round_to).alias("p"),
        F.coalesce(F.round(p, round_to) < 0.05, F.lit(False)).alias(
            "significant"
        ),
    )


def cochrans_q_oracle_sql(from_sql: str, round_to: int = 6) -> str:
    """DuckDB replay of :func:`cochrans_q`; ``from_sql`` must yield
    ``blk``, ``trt``, boolean ``y``."""
    q = (
        "(CASE WHEN n_blocks > 0 AND n_treatments >= 2 AND den > 0"
        " THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END)"
    )
    zwh = (
        f"(CASE WHEN {q} IS NOT NULL THEN"
        f" (cbrt(greatest({q}, 0.0) / CAST(n_treatments - 1 AS DOUBLE))"
        " - (1.0 - 2.0 / (9.0 * CAST(n_treatments - 1 AS DOUBLE))))"
        " / sqrt(2.0 / (9.0 * CAST(n_treatments - 1 AS DOUBLE))) END)"
    )
    half = f"({_p_two_sided_sql(zwh)} / 2.0)"
    p = (
        f"(CASE WHEN {zwh} IS NOT NULL THEN CASE WHEN {zwh} >= 0"
        f" THEN {half} ELSE 1.0 - {half} END END)"
    )
    return f"""WITH src AS ({from_sql}),
b AS (SELECT blk, trt, CAST(CAST(y AS BOOLEAN) AS BIGINT) AS y FROM src
      WHERE blk IS NOT NULL AND trt IS NOT NULL AND y IS NOT NULL),
ktot AS (SELECT CAST(count(DISTINCT trt) AS BIGINT) AS k FROM b),
okb AS (SELECT blk FROM b, ktot GROUP BY blk, ktot.k
        HAVING count(*) = ktot.k AND count(DISTINCT trt) = ktot.k),
kept AS (SELECT b.* FROM b JOIN okb USING (blk)),
ct AS (SELECT CAST(count(*) AS BIGINT) AS n_treatments,
    CAST(coalesce(sum(C), 0) AS DECIMAL(38,0)) AS S,
    CAST(coalesce(sum(C * C), 0) AS DECIMAL(38,0)) AS C2
  FROM (SELECT trt, CAST(sum(y) AS DECIMAL(38,0)) AS C FROM kept
        GROUP BY trt)),
rt AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
    CAST(coalesce(sum(R * R), 0) AS DECIMAL(38,0)) AS R2
  FROM (SELECT blk, CAST(sum(y) AS DECIMAL(38,0)) AS R FROM kept
        GROUP BY blk)),
agg AS (SELECT rt.n_blocks, ct.n_treatments,
    (CAST(ct.n_treatments AS DECIMAL(38,0)) - 1)
      * (CAST(ct.n_treatments AS DECIMAL(38,0)) * ct.C2 - ct.S * ct.S)
      AS num,
    CAST(ct.n_treatments AS DECIMAL(38,0)) * ct.S - rt.R2 AS den
  FROM rt, ct)
SELECT n_blocks, n_treatments,
  round({q}, {round_to}) AS q,
  CASE WHEN {q} IS NOT NULL THEN CAST(n_treatments - 1 AS BIGINT) END AS dof,
  round({p}, {round_to}) AS p,
  coalesce(round({p}, {round_to}) < 0.05, FALSE) AS significant
FROM agg"""


def bowker_test(
    df: DataFrame,
    a_col: str,
    b_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Bowker's test of symmetry (Bowker JASA 1948) — McNemar's k×k
    categorical generalization: two CATEGORICAL labelings of the same
    rows (classifier v1 vs v2, yesterday's lang vs today's), and the
    question is whether label FLOW is symmetric (en→de as often as
    de→en) or systematically drifting one way. ONE row ``(n,
    n_categories, n_offdiag_pairs, n_informative_pairs, chi2, dof, p,
    significant)`` with

        χ² = Σ_{i<j} (n_ij − n_ji)² / (n_ij + n_ji),   df = #{i<j pairs}

    over informative pairs (n_ij + n_ji > 0; empty pairs carry no
    information and are excluded from both the sum and df — the
    standard convention, surfaced). Exactness: cell counts exact; each
    pair term is an exact integer rational 12dp-rounded then
    DECIMAL-summed; p via the Wilson–Hilferty chi²(df) tail. Diagonal
    (unchanged labels) never enters — a million stable docs can't
    drown a directional drift, exactly the McNemar property at k
    categories. Scale shape: one (a, b) groupBy — cells bounded by
    k², never rows; the pair join is over the bounded cell table.
    """
    a, b = F.col(a_col), F.col(b_col)
    base = df.where(a.isNotNull() & b.isNotNull()).select(
        a.cast("string").alias("_a"), b.cast("string").alias("_b")
    )
    cells = base.groupBy("_a", "_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    up = cells.where(F.col("_a") < F.col("_b")).select(
        F.col("_a").alias("_i"), F.col("_b").alias("_j"),
        F.col("_n").alias("_nij"),
    )
    down = cells.where(F.col("_a") > F.col("_b")).select(
        F.col("_b").alias("_i"), F.col("_a").alias("_j"),
        F.col("_n").alias("_nji"),
    )
    pairs = up.join(down, ["_i", "_j"], "full").select(
        F.coalesce(F.col("_nij"), F.lit(0)).cast("bigint").alias("_x"),
        F.coalesce(F.col("_nji"), F.lit(0)).cast("bigint").alias("_y"),
    )
    term = F.round(
        ((F.col("_x") - F.col("_y")) * (F.col("_x") - F.col("_y"))).cast(
            "double"
        )
        / (F.col("_x") + F.col("_y")).cast("double"),
        12,
    ).cast("decimal(38,12)")
    ncat = base.select(F.col("_a").alias("_c")).unionByName(
        base.select(F.col("_b").alias("_c"))
    ).distinct().agg(F.count(F.lit(1)).cast("bigint").alias("n_categories"))
    tot = base.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    pagg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_offdiag_pairs"),
        F.sum(F.when((F.col("_x") + F.col("_y")) > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("_ninf"),
        F.coalesce(
            F.sum(F.when((F.col("_x") + F.col("_y")) > 0, term)),
            F.lit(0).cast("decimal(38,12)"),
        )
        .cast("double")
        .alias("_chi2"),
    )
    agg = tot.crossJoin(F.broadcast(ncat)).crossJoin(F.broadcast(pagg))
    ok = F.col("_ninf") >= 1
    dof = F.col("_ninf").cast("bigint")
    dofd = dof.cast("double")
    zwh = F.when(
        ok,
        (
            F.cbrt(F.col("_chi2") / dofd)
            - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * dofd))
        )
        / F.sqrt(F.lit(2.0) / (F.lit(9.0) * dofd)),
    )
    half_p = _p_two_sided(zwh) / F.lit(2.0)
    p = F.when(ok, F.when(zwh >= 0, half_p).otherwise(F.lit(1.0) - half_p))
    return agg.select(
        "n",
        "n_categories",
        F.coalesce(F.col("n_offdiag_pairs"), F.lit(0)).alias(
            "n_offdiag_pairs"
        ),
        F.coalesce(F.col("_ninf"), F.lit(0)).alias("n_informative_pairs"),
        F.round(F.when(ok, F.col("_chi2")), round_to).alias("chi2"),
        F.when(ok, dof).alias("dof"),
        F.round(p, round_to).alias("p"),
        F.coalesce(F.round(p, round_to) < 0.05, F.lit(False)).alias(
            "significant"
        ),
    )


def bowker_oracle_sql(from_sql: str, round_to: int = 6) -> str:
    """DuckDB replay of :func:`bowker_test`; ``from_sql`` must yield
    ``a`` and ``b``."""
    zwh = (
        "(CASE WHEN ninf >= 1 THEN (cbrt(chi2 / CAST(ninf AS DOUBLE))"
        " - (1.0 - 2.0 / (9.0 * CAST(ninf AS DOUBLE))))"
        " / sqrt(2.0 / (9.0 * CAST(ninf AS DOUBLE))) END)"
    )
    half = f"({_p_two_sided_sql(zwh)} / 2.0)"
    p = (
        f"(CASE WHEN ninf >= 1 THEN CASE WHEN {zwh} >= 0 THEN {half}"
        f" ELSE 1.0 - {half} END END)"
    )
    return f"""WITH src AS ({from_sql}),
b0 AS (SELECT CAST(a AS VARCHAR) AS a, CAST(b AS VARCHAR) AS b FROM src
       WHERE a IS NOT NULL AND b IS NOT NULL),
cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM b0 GROUP BY a, b),
up AS (SELECT a AS i, b AS j, n AS nij FROM cells WHERE a < b),
down AS (SELECT b AS i, a AS j, n AS nji FROM cells WHERE a > b),
pairs AS (SELECT coalesce(up.nij, 0) AS x, coalesce(down.nji, 0) AS y
          FROM up FULL JOIN down USING (i, j)),
ncat AS (SELECT CAST(count(*) AS BIGINT) AS n_categories FROM
         (SELECT DISTINCT c FROM (SELECT a AS c FROM b0
          UNION ALL SELECT b FROM b0))),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b0),
pagg AS (SELECT CAST(count(*) AS BIGINT) AS n_offdiag_pairs,
    CAST(coalesce(sum(CASE WHEN x + y > 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
        AS ninf,
    CAST(coalesce(sum(CASE WHEN x + y > 0 THEN
        CAST(round(CAST((x - y) * (x - y) AS DOUBLE)
            / CAST(x + y AS DOUBLE), 12) AS DECIMAL(38,12)) END), 0)
        AS DOUBLE) AS chi2
  FROM pairs)
SELECT tot.n, ncat.n_categories, pagg.n_offdiag_pairs,
  pagg.ninf AS n_informative_pairs,
  round(CASE WHEN ninf >= 1 THEN chi2 END, {round_to}) AS chi2,
  CASE WHEN ninf >= 1 THEN CAST(ninf AS BIGINT) END AS dof,
  round({p}, {round_to}) AS p,
  coalesce(round({p}, {round_to}) < 0.05, FALSE) AS significant
FROM tot, ncat, pagg"""


def mcnemar_exact_test(
    df: DataFrame,
    a_col: str,
    b_col: str,
    max_n: int = 1_000_000,
    alpha_trillionths: int = 50_000_000_000,
    round_to: int = 6,
) -> DataFrame:
    """EXACT McNemar (the binomial form — Edwards' continuity-corrected
    chi² in :func:`mcnemar_test` is an approximation that goes soft
    exactly where McNemar matters most, at FEW flips): under H0 the
    b = n_a_only discordant outcomes among the m = b + c flips are
    Binomial(m, ½), so the exact two-sided p is the binomial pmf-rule
    tail — :func:`exact_binomial_test` applied to the flip cells. ONE
    row ``(n, n_flips, n_a_only, n_b_only, p, significant)``; zero
    flips → NULL p (no information), the approximate test's clamp case
    handled by construction. Composition: one cell pass builds the
    flip frame; the micro-ln walk runs over m (the FLIP count — tiny
    by the statistic's own nature), not n.
    """
    a = F.col(a_col).cast("boolean")
    b = F.col(b_col).cast("boolean")
    base = df.where(a.isNotNull() & b.isNotNull()).select(
        a.alias("_a"), b.alias("_b")
    )
    n_row = base.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    flips = base.where(F.col("_a") != F.col("_b")).select(
        F.col("_a").alias("y")
    )
    inner = exact_binomial_test(
        flips,
        "y",
        p0_milli=500,
        max_n=max_n,
        alpha_trillionths=alpha_trillionths,
        round_to=round_to,
    )
    inner2 = inner.select(
        F.col("n").alias("n_flips"),
        F.col("k").alias("n_a_only"),
        F.col("p").alias("_p"),
        F.col("significant").alias("_sig"),
    )
    return n_row.crossJoin(F.broadcast(inner2)).select(
        "n",
        "n_flips",
        "n_a_only",
        (F.col("n_flips") - F.col("n_a_only")).cast("bigint").alias("n_b_only"),
        F.when(F.col("n_flips") > 0, F.col("_p")).alias("p"),
        F.coalesce(
            F.when(F.col("n_flips") > 0, F.col("_sig")), F.lit(False)
        ).alias("significant"),
    )


def mcnemar_exact_oracle_sql(
    from_sql: str,
    max_n: int = 1_000_000,
    alpha_trillionths: int = 50_000_000_000,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`mcnemar_exact_test`; ``from_sql`` must
    yield boolean ``a``/``b``."""
    inner = exact_binomial_oracle_sql(
        f"SELECT a AS y FROM ({from_sql}) WHERE a IS NOT NULL"
        " AND b IS NOT NULL AND a <> b",
        p0_milli=500,
        max_n=max_n,
        alpha_trillionths=alpha_trillionths,
        round_to=round_to,
    )
    return f"""WITH outer_n AS (SELECT CAST(count(*) AS BIGINT) AS n
    FROM ({from_sql}) WHERE a IS NOT NULL AND b IS NOT NULL),
inner_t AS ({inner})
SELECT outer_n.n, inner_t.n AS n_flips, inner_t.k AS n_a_only,
  CAST(inner_t.n - inner_t.k AS BIGINT) AS n_b_only,
  CASE WHEN inner_t.n > 0 THEN inner_t.p END AS p,
  coalesce(CASE WHEN inner_t.n > 0 THEN inner_t.significant END, FALSE)
      AS significant
FROM outer_n, inner_t"""
