"""checks/evaluation.py — exact ROC AUC and TREC-style retrieval metrics.

Hand-computed fixtures: every expected value below is derivable on paper
(AUC from the 3x3 pair table including the tie; DCG/IDCG from the
Järvelin-Kekäläinen formula at k=3).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from xmlschemavalidator_spark.checks.evaluation import retrieval_metrics, roc_auc


def _scored(spark, rows):
    return spark.createDataFrame(rows, "id long, score double, label boolean")


def test_roc_auc_with_ties(spark):
    # pos scores: .9 .8 .5 | neg scores: .5 .3 .1 -> 9 pairs:
    # 8 strict wins + 1 tie (.5 vs .5) counted half -> 8.5/9
    df = _scored(
        spark,
        [
            (1, 0.9, True),
            (2, 0.8, True),
            (3, 0.5, True),
            (4, 0.5, False),
            (5, 0.3, False),
            (6, 0.1, False),
        ],
    )
    [r] = roc_auc(df, "score", "label").collect()
    assert (r["n_pos"], r["n_neg"], r["n_scores"]) == (3, 3, 5)
    assert r["auc"] == round(8.5 / 9, 6)


def test_roc_auc_perfect_and_reversed(spark):
    df = _scored(
        spark, [(1, 0.9, True), (2, 0.8, True), (3, 0.2, False), (4, 0.1, False)]
    )
    assert roc_auc(df, "score", "label").collect()[0]["auc"] == 1.0
    rev = df.withColumn("score", F.lit(1.0) - F.col("score"))
    assert roc_auc(rev, "score", "label").collect()[0]["auc"] == 0.0


def test_roc_auc_single_class_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 0.9, True), (2, 0.8, True), (3, None, False), (4, 0.1, None)],
        "id long, score double, label boolean",
    )
    # the NULL-score neg and NULL-label rows drop -> single class
    [r] = roc_auc(df, "score", "label").collect()
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (2, 0, None)


def test_roc_auc_all_tied_is_half(spark):
    df = _scored(spark, [(1, 0.5, True), (2, 0.5, False), (3, 0.5, True)])
    assert roc_auc(df, "score", "label").collect()[0]["auc"] == 0.5


def _run_qrels(spark):
    run = spark.createDataFrame(
        [
            ("q1", 20, 1),
            ("q1", 50, 2),  # unjudged -> rel 0
            ("q1", 10, 3),
            ("q1", 99, 4),  # beyond k=3: ignored
            ("q2", 10, 1),
            ("q2", 20, 2),
        ],
        "query string, doc long, rank long",
    )
    qrels = spark.createDataFrame(
        [("q1", 10, 3), ("q1", 20, 1), ("q1", 30, 2)],
        "query string, doc long, rel long",
    )
    return run, qrels


def test_retrieval_metrics_hand_computed(spark):
    run, qrels = _run_qrels(spark)
    got = {r["query"]: r for r in retrieval_metrics(run, qrels, k=3).collect()}
    r = got["q1"]
    assert (r["n_ret"], r["n_rel"], r["n_rel_ret"]) == (3, 3, 2)
    assert r["precision_k"] == round(2 / 3, 6)
    assert r["recall_k"] == round(2 / 3, 6)
    assert r["rr"] == 1.0  # rank-1 doc 20 is relevant
    # DCG = (2^1-1)/log2(2) + 0 + (2^3-1)/log2(4) = 1 + 3.5
    dcg = round(1.0, 12) + round(7.0 / 2.0, 12)
    assert r["dcg_k"] == round(dcg, 6)
    # ideal: rel 3,2,1 -> 7/log2(2) + 3/log2(3) + 1/log2(4)
    idcg = (
        round(7.0, 12) + round(3.0 / math.log2(3.0), 12) + round(0.5, 12)
    )
    assert r["ndcg_k"] == round(dcg / idcg, 6)
    # q2 has no judgments at all: recall/ndcg undefined, rr 0
    r2 = got["q2"]
    assert (r2["n_ret"], r2["n_rel"], r2["n_rel_ret"]) == (2, 0, 0)
    assert (r2["recall_k"], r2["ndcg_k"]) == (None, None)
    assert (r2["rr"], r2["precision_k"], r2["dcg_k"]) == (0.0, 0.0, 0.0)


def test_retrieval_metrics_perfect_run(spark):
    qrels = spark.createDataFrame(
        [("q", 1, 2), ("q", 2, 1)], "query string, doc long, rel long"
    )
    run = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)], "query string, doc long, rank long"
    )
    [r] = retrieval_metrics(run, qrels, k=5).collect()
    assert r["ndcg_k"] == 1.0
    assert r["recall_k"] == 1.0
    assert r["rr"] == 1.0


def test_roc_auc_single_aggregate_plan(spark):
    df = _scored(spark, [(1, 0.9, True), (2, 0.1, False)])
    plan = (
        roc_auc(df, "score", "label")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one scan; the window runs over the distinct-score table, never rows
    assert plan.count("Scan ExistingRDD") == 1


# --------------------------------------------------------------------------
# calibration: reliability bins + ECE/MCE
# --------------------------------------------------------------------------

from xmlschemavalidator_spark.checks.evaluation import calibration_report, ece  # noqa: E402


def test_calibration_report_bins_exact(spark):
    # 2 bins over [0,1]: bin 0 = [0,.5), bin 1 = [.5,1]
    # bin 0: probs .1 .2 (conf .15), labels F F -> acc 0, gap -.15
    # bin 1: probs .8 .9 1.0 (conf .9), labels T T F -> acc 2/3
    df = _scored(
        spark,
        [
            (1, 0.1, False),
            (2, 0.2, False),
            (3, 0.8, True),
            (4, 0.9, True),
            (5, 1.0, False),
        ],
    )
    got = {
        r["bin"]: (r["n"], r["conf"], r["acc"], r["gap"])
        for r in calibration_report(df, "score", "label", n_bins=2).collect()
    }
    assert got[0] == (2, 0.15, 0.0, -0.15)
    assert got[1] == (3, 0.9, round(2 / 3, 6), round(2 / 3 - 0.9, 6))


def test_calibration_p1_joins_top_bin_and_clamping(spark):
    df = _scored(spark, [(1, 1.0, True), (2, 1.7, True), (3, -0.3, False)])
    got = {r["bin"]: (r["n"], r["conf"]) for r in
           calibration_report(df, "score", "label", n_bins=10).collect()}
    # 1.0 and the clamped 1.7 both land in bin 9 at conf 1.0; -0.3 clamps to bin 0
    assert got[9] == (2, 1.0)
    assert got[0] == (1, 0.0)


def test_ece_perfectly_calibrated_and_worst_case(spark):
    # bin conf .25 with acc 1/4 -> gap 0 (4 rows, 1 positive)
    df = _scored(
        spark,
        [(1, 0.25, True), (2, 0.25, False), (3, 0.25, False), (4, 0.25, False)],
    )
    [r] = ece(df, "score", "label", n_bins=4).collect()
    assert (r["n"], r["n_bins_used"], r["ece"], r["mce"]) == (4, 1, 0.0, 0.0)
    # confident-and-wrong: p=.9 label F, p=.1 label T -> each bin gap .9
    worst = _scored(spark, [(1, 0.9, False), (2, 0.1, True)])
    [w] = ece(worst, "score", "label", n_bins=10).collect()
    assert (w["ece"], w["mce"]) == (0.9, 0.9)


def test_ece_weights_bins_by_count(spark):
    # bin A: 3 rows gap 1/3-0.2=.133333; bin B: 1 row gap |0-.6|=.6
    # ECE = (3*.133333 + 1*.6)/4 = .25 ; MCE = .6
    df = _scored(
        spark,
        [(1, 0.2, True), (2, 0.2, False), (3, 0.2, False), (4, 0.6, False)],
    )
    [r] = ece(df, "score", "label", n_bins=5).collect()
    assert r["mce"] == 0.6
    assert r["ece"] == 0.25


# --------------------------------------------------------------------------
# Kaplan-Meier survival
# --------------------------------------------------------------------------

import math as _math  # noqa: E402

from xmlschemavalidator_spark.checks.evaluation import kaplan_meier  # noqa: E402


def test_kaplan_meier_textbook_example(spark):
    # durations: events at t=2 (1 of 5 at risk), t=4 (1 of 3); censored
    # at t=3 and t=5; one more survives past the last event (t=6 censored)
    rows = [(1, 2, True), (2, 3, False), (3, 4, True), (4, 5, False), (5, 6, False)]
    df = spark.createDataFrame(rows, "id long, dur long, observed boolean")
    got = {r["t"]: r for r in kaplan_meier(df, "dur", "observed").collect()}
    assert sorted(got) == [2, 4]  # event times only
    assert (got[2]["n_risk"], got[2]["n_events"], got[2]["n_censored"]) == (5, 1, 0)
    assert (got[4]["n_risk"], got[4]["n_events"]) == (3, 1)
    # S(2) = 4/5 ; S(4) = 4/5 * 2/3 — via floor-quantized ln sums
    l2 = _math.floor(_math.log(4.0 / 5.0) * 1e6)
    l4 = l2 + _math.floor(_math.log(2.0 / 3.0) * 1e6)
    assert got[2]["logsurv_micro"] == l2
    assert got[4]["logsurv_micro"] == l4
    assert got[2]["survival"] == round(_math.exp(l2 / 1e6), 6)


def test_kaplan_meier_censoring_changes_curve(spark):
    # same event times; censored rows removed from later risk sets but
    # never counted as deaths — naive "fraction dead" would differ
    rows = [(i, 10, True) for i in range(4)] + [(9, 5, False)]
    df = spark.createDataFrame(rows, "id long, dur long, observed boolean")
    [r] = kaplan_meier(df, "dur", "observed").collect()
    # at t=10 the censored-at-5 user is gone: 4 at risk, 4 events -> S=0
    assert (r["t"], r["n_risk"], r["n_events"]) == (10, 4, 4)
    # ln(0) guard: all-events row yields -inf? floor(ln(0)) is undefined —
    # document: S hits exact 0, logsurv_micro is NULL in that terminal row
    assert r["logsurv_micro"] is None or r["survival"] == 0.0


def test_kaplan_meier_grouped_curves_independent(spark):
    rows = [("a", 1, 2, True), ("a", 2, 4, False), ("b", 3, 2, True), ("b", 4, 2, True)]
    df = spark.createDataFrame(rows, "g string, id long, dur long, obs boolean")
    got = {(r["g"], r["t"]): r for r in
           kaplan_meier(df, "dur", "obs", group_cols=("g",)).collect()}
    # group a: 1 event of 2 at risk -> S=1/2 ; group b: 2 of 2 -> S hits 0
    assert got[("a", 2)]["n_risk"] == 2 and got[("a", 2)]["survival"] == 0.5
    assert got[("b", 2)]["survival"] == 0.0 and got[("b", 2)]["logsurv_micro"] is None


# --------------------------------------------------------------------------
# two-proportion z-test
# --------------------------------------------------------------------------

from xmlschemavalidator_spark.checks.evaluation import two_proportion_test  # noqa: E402


def test_two_proportion_test_hand_computed(spark):
    import math as _m

    # a: 30/100, b: 20/100 -> pooled .25, z = .1 / sqrt(.25*.75*(.02))
    rows = [("a", 1 if i < 30 else 0) for i in range(100)] + [
        ("b", 1 if i < 20 else 0) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, ok int")
    [r] = two_proportion_test(df, "g", "ok", "a", "b").collect()
    z = 0.1 / _m.sqrt(0.25 * 0.75 * 0.02)
    assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (100, 30, 100, 20)
    assert r["z"] == round(z, 6)
    assert r["significant"] == (abs(z) > 1.96)
    # equal rates: z ~ 0, not significant
    eq = spark.createDataFrame(
        [("a", i % 2) for i in range(50)] + [("b", i % 2) for i in range(50)],
        "g string, ok int",
    )
    [e] = two_proportion_test(eq, "g", "ok", "a", "b").collect()
    assert e["z"] == 0.0 and e["significant"] is False
    # degenerate: all successes -> zero pooled variance -> NULL z
    dg = spark.createDataFrame([("a", 1), ("b", 1)], "g string, ok int")
    [d] = two_proportion_test(dg, "g", "ok", "a", "b").collect()
    assert d["z"] is None and d["significant"] is False


def test_mann_whitney_u_hand_computed_and_scipy_free(spark):
    import math as _m

    from xmlschemavalidator_spark.checks.evaluation import mann_whitney_u

    # a: {1,2,3}, b: {4,5,6}: U_a = 0 (every a below every b)
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)],
        "g string, v double",
    )
    [r] = mann_whitney_u(df, "v", "g", "a", "b").collect()
    assert (r["n_a"], r["n_b"], r["u"]) == (3, 3, 0.0)
    var = 3 * 3 / 12 * (7 - 0 / (6 * 5))
    assert r["z"] == round((0 - 4.5) / _m.sqrt(var), 6)

    # ties: a {1,1}, b {1,2}: 2U = for s=1: na=2*(0 + nb_at=1*? ...) ->
    # U = 2*(0 + 1/2) = 1 ; tie group t=3 corrects the variance
    dt = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 2.0)], "g string, v double"
    )
    [s] = mann_whitney_u(dt, "v", "g", "a", "b").collect()
    assert s["u"] == 1.0
    n = 4.0
    var_t = 2 * 2 / 12 * ((n + 1) - (27 - 3) / (n * (n - 1)))
    assert s["z"] == round((1.0 - 2.0) / _m.sqrt(var_t), 6)

    # all tied: zero variance -> NULL
    at = spark.createDataFrame([("a", 5.0), ("b", 5.0)], "g string, v double")
    [q] = mann_whitney_u(at, "v", "g", "a", "b").collect()
    assert q["z"] is None and q["significant"] is False


def test_kruskal_wallis_against_scipy_formula(spark):
    # hand-replicated KW with ties on a small fixture
    data = {"a": [1.0, 2.0, 2.0], "b": [2.0, 3.0], "c": [4.0, 5.0, 6.0]}
    rows = [(g, v) for g, vs in data.items() for v in vs]
    from xmlschemavalidator_spark.checks.evaluation import kruskal_wallis

    df = spark.createDataFrame(rows, "g string, v double")
    [r] = kruskal_wallis(df, "v", "g").collect()
    # pure-python replay with average ranks
    import itertools

    vals = sorted(v for vs in data.values() for v in vs)
    ranks = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        ranks[vals[i]] = (i + 1 + j) / 2
        i = j
    n = len(vals)
    sr2 = sum(
        (sum(ranks[v] for v in vs)) ** 2 / len(vs) for vs in data.values()
    )
    h = 12.0 / (n * (n + 1)) * sr2 - 3 * (n + 1)
    t3 = sum(
        t ** 3 - t
        for t in [sum(1 for v in vals if v == u) for u in set(vals)]
    )
    hc = h / (1 - t3 / (n ** 3 - n))
    assert r["n"] == n and r["n_groups"] == 3 and r["df"] == 2
    assert abs(r["h"] - h) < 1e-6
    assert abs(r["h_corrected"] - hc) < 1e-6
    # single group: undefined
    one = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    [o] = kruskal_wallis(one, "v", "g").collect()
    assert o["h"] is None


def test_mann_whitney_one_vs_rest_matches_pairwise(spark):
    from xmlschemavalidator_spark.checks.evaluation import (
        mann_whitney_one_vs_rest,
        mann_whitney_u,
    )

    rows = (
        [("lo", float(v)) for v in (1, 2, 2, 3)]
        + [("mid", float(v)) for v in (3, 4, 5)]
        + [("hi", float(v)) for v in (6, 7, 8, 9)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    ovr = {r["g"]: r for r in mann_whitney_one_vs_rest(df, "v", "g").collect()}
    # each row must equal the explicit two-sample test vs the complement
    for g in ("lo", "mid", "hi"):
        two = df.withColumn(
            "gg", F.when(F.col("g") == g, F.lit("a")).otherwise(F.lit("b"))
        )
        [want] = mann_whitney_u(two, "v", "gg", "a", "b").collect()
        got = ovr[g]
        assert (got["n_a"], got["n_b"], got["u"], got["z"]) == (
            want["n_a"], want["n_b"], want["u"], want["z"]
        ), g
    # directionality: hi ranks above its complement
    assert ovr["hi"]["z"] > 0 > ovr["lo"]["z"]


def test_bh_fdr_classic_stepup(spark):
    """BH on a hand-checkable table: z's chosen so the sorted p's
    bracket the i*alpha/m ladder, including the step-up quirk where a
    later rank rescues an earlier-failing one."""
    import math

    from xmlschemavalidator_spark.checks.evaluation import bh_fdr

    # two-sided p via scipy-free closed form for the check
    def p2(z):
        t = 1.0 / (1.0 + 0.2316419 * abs(z))
        poly = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937
                    + t * (-1.821255978 + t * 1.330274429))))
        pdf = math.exp(-(abs(z) * abs(z)) / 2.0) * 0.3989422804014327
        return min(1.0, 2.0 * pdf * poly)

    rows = [("a", 3.5), ("b", 3.1), ("c", 2.9), ("d", 2.0), ("e", 0.3)]
    df = spark.createDataFrame(rows, "seg string, z double")
    out = {r["seg"]: r for r in bh_fdr(df, "seg", alpha_micro=50_000).collect()}
    ps = sorted((p2(z), s) for s, z in rows)
    m = 5
    cut = max((i + 1 for i in range(m) if ps[i][0] <= (i + 1) * 0.05 / m),
              default=0)
    expect_rejected = {s for i, (_, s) in enumerate(ps) if i + 1 <= cut}
    got_rejected = {s for s, r in out.items() if r["rejected"]}
    assert got_rejected == expect_rejected and len(expect_rejected) >= 1
    # p values match the closed form at 6dp, rank order follows p
    for s, z in rows:
        assert out[s]["p_value"] == round(p2(z), 6)
    assert out["a"]["bh_rank"] == 1 and out["e"]["bh_rank"] == 5
    assert out["e"]["rejected"] is False


def test_bh_fdr_null_z_excluded_from_m(spark):
    from xmlschemavalidator_spark.checks.evaluation import bh_fdr

    df = spark.createDataFrame(
        [("a", 4.0), ("b", None), ("c", 0.1)], "seg string, z double"
    )
    out = {r["seg"]: r for r in bh_fdr(df, "seg").collect()}
    assert out["b"]["p_value"] is None and out["b"]["rejected"] is False
    assert out["b"]["bh_rank"] is None
    # m=2 (not 3): rank-1 crit is alpha/2
    assert out["a"]["bh_crit"] == 0.025 and out["a"]["rejected"] is True


def test_ks_exact_hand_computed_and_shift(spark):
    from xmlschemavalidator_spark.checks.evaluation import ks_exact

    rows = [("a", float(v)) for v in (1, 2, 3, 4)] + [
        ("b", float(v)) for v in (3, 4, 5, 6)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    [r] = ks_exact(df, "v", "g", "a", "b").collect()
    # D = 0.5, first attained at v=2 (ECDF right-continuity)
    assert (r["n_a"], r["n_b"], r["d_stat"]) == (4, 4, 0.5)
    assert r["d_at_value"] == 2_000_000
    assert r["significant"] is False  # crit at n=4+4 is 0.96

    # large shifted samples: same D, now significant
    big = spark.createDataFrame(
        [("a", float(v)) for v in range(100)]
        + [("b", float(v + 50)) for v in range(100)],
        "g string, v double",
    )
    [s] = ks_exact(big, "v", "g", "a", "b").collect()
    assert s["d_stat"] == 0.5 and s["significant"] is True

    # identical distributions: D exactly 0
    same = spark.createDataFrame(
        [("a", float(v % 7)) for v in range(50)]
        + [("b", float(v % 7)) for v in range(50)],
        "g string, v double",
    )
    [z] = ks_exact(same, "v", "g", "a", "b").collect()
    assert z["d_stat"] == 0.0 and z["significant"] is False

    # one side empty: NULL verdict, never a div/0
    [e] = ks_exact(df.where("g = 'a'"), "v", "g", "a", "b").collect()
    assert e["d_stat"] is None and e["significant"] is False


def test_nelson_aalen_hand_computed(spark):
    """Textbook risk sets: durations 1,2,2,3 with censoring at 2.
    t=1: n=4,d=1 -> 250000; t=2: n=3,d=1 (one censored same-t stays in
    risk set) -> +333333; t=3: n=1,d=1 -> +1000000."""
    from xmlschemavalidator_spark.checks.evaluation import nelson_aalen

    rows = [(1, True), (2, True), (2, False), (3, True)]
    df = spark.createDataFrame(rows, "dur long, obs boolean")
    out = {r["t"]: r for r in nelson_aalen(df, "dur", "obs").collect()}
    assert out[1]["n_risk"] == 4 and out[1]["hazard_inc_micro"] == 250_000
    assert out[2]["n_risk"] == 3 and out[2]["hazard_inc_micro"] == 333_333
    assert out[2]["n_censored"] == 1
    assert out[3]["n_risk"] == 1 and out[3]["hazard_inc_micro"] == 1_000_000
    assert out[3]["cum_hazard_micro"] == 250_000 + 333_333 + 1_000_000


def test_brier_decomposition_python_replay(spark):
    import math

    from xmlschemavalidator_spark.checks.evaluation import brier_decomposition

    rows = [
        (0.05, 0), (0.08, 0), (0.12, 0), (0.15, 1),
        (0.35, 0), (0.38, 1), (0.62, 1), (0.65, 0),
        (0.85, 1), (0.88, 1), (0.92, 1), (0.95, 1), (1.0, 1),
    ]
    df = spark.createDataFrame(rows, "p double, y int")
    [r] = brier_decomposition(df, "p", "y", n_bins=5).collect()

    # exact replay of the quantized chains
    n_bins = 5
    bins = {}
    for p, y in rows:
        micro = min(max(math.floor(p * 1_000_000), 0), 1_000_000)
        b = min(math.floor(micro * n_bins / 1_000_000), n_bins - 1)
        n, sp, sy, sq = bins.get(b, (0, 0, 0, 0))
        bins[b] = (n + 1, sp + micro, sy + y, sq + (micro - y * 1_000_000) ** 2)
    N = sum(v[0] for v in bins.values())
    SY = sum(v[2] for v in bins.values())
    SQ = sum(v[3] for v in bins.values())
    rel = sum(
        math.floor((sp - sy * 1e6) ** 2 / (n * 1e12) * 1e12)
        for n, sp, sy, _ in bins.values()
    ) / 1e12 / N
    ybar = SY / N
    res = sum(
        math.floor(n * (sy / n - ybar) ** 2 * 1e12)
        for n, sp, sy, _ in bins.values()
    ) / 1e12 / N
    brier = SQ / (N * 1e12)
    unc = SY * (N - SY) / (N * N)
    assert r["n"] == N == 13
    assert r["brier"] == round(brier, 6)
    assert r["reliability"] == round(rel, 6)
    assert r["resolution"] == round(res, 6)
    assert r["uncertainty"] == round(unc, 6)
    assert r["residual"] == round(brier - (rel - res + unc), 6)
    # decomposition magnitudes are all probabilities-squared scale
    assert 0 <= r["brier"] <= 1 and 0 <= r["uncertainty"] <= 0.25

    # bin-constant forecasts -> residual exactly 0 (decomposition exact)
    rows2 = [(0.1, 0)] * 9 + [(0.1, 1)] + [(0.9, 1)] * 9 + [(0.9, 0)]
    df2 = spark.createDataFrame(rows2, "p double, y int")
    [r2] = brier_decomposition(df2, "p", "y", n_bins=10).collect()
    assert abs(r2["residual"]) < 1e-5
    # and a perfectly calibrated bin-constant forecast: reliability = 0
    assert r2["reliability"] == 0.0


def test_mcnemar_hand_computed(spark):
    from xmlschemavalidator_spark.checks.evaluation import mcnemar_test

    # cells: both-pass 4, a-only 6, b-only 1, both-fail 2
    rows = (
        [(True, True)] * 4 + [(True, False)] * 6
        + [(False, True)] * 1 + [(False, False)] * 2
    )
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    [r] = mcnemar_test(df, "a", "b").collect()
    assert (r["n"], r["n_both_pass"], r["n_a_only"], r["n_b_only"],
            r["n_both_fail"]) == (13, 4, 6, 1, 2)
    assert r["rate_a"] == round(10 / 13, 6)
    assert r["rate_b"] == round(5 / 13, 6)
    # chi2 = (|6-1|-1)^2 / 7 = 16/7
    assert r["chi2"] == round(16 / 7, 6)
    assert 0 < r["p"] < 1 and r["significant"] is False

    # strongly one-directional flips -> significant
    rows2 = [(True, False)] * 30 + [(False, True)] * 2 + [(True, True)] * 100
    df2 = spark.createDataFrame(rows2, "a boolean, b boolean")
    [r2] = mcnemar_test(df2, "a", "b").collect()
    assert r2["significant"] is True and r2["p"] < 0.001

    # no flips at all: NULL statistic, not significant — and the
    # symmetric-flip clamp: |b-c|=0 -> chi2 exactly 0, not 1/(b+c)
    df3 = spark.createDataFrame([(True, True)] * 5, "a boolean, b boolean")
    [r3] = mcnemar_test(df3, "a", "b").collect()
    assert r3["chi2"] is None and r3["p"] is None and r3["significant"] is False
    df4 = spark.createDataFrame(
        [(True, False)] * 3 + [(False, True)] * 3, "a boolean, b boolean"
    )
    [r4] = mcnemar_test(df4, "a", "b").collect()
    assert r4["chi2"] == 0.0 and r4["p"] == 1.0


def test_mcnemar_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.checks.evaluation import (
        mcnemar_oracle_sql,
        mcnemar_test,
    )

    rows = [(i % 3 != 0, i % 5 != 0) for i in range(97)] + [(None, True)]
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    [got] = mcnemar_test(df, "a", "b").collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE verd (a BOOLEAN, b BOOLEAN)")
    con.executemany("INSERT INTO verd VALUES (?, ?)", rows)
    [want] = con.execute(
        mcnemar_oracle_sql("SELECT a, b FROM verd")
    ).fetchall()
    assert tuple(got) == tuple(want)


def test_logrank_hand_computed(spark):
    from xmlschemavalidator_spark.checks.evaluation import logrank_test

    # classic toy: A events at t=1,2 (n=3, one censored at 3);
    # B events at t=3,4 (n=3, one censored at 4)
    rows = [
        ("A", 1, 1), ("A", 2, 1), ("A", 3, 0),
        ("B", 3, 1), ("B", 4, 1), ("B", 4, 0),
    ]
    df = spark.createDataFrame(rows, "g string, t long, e int")
    [r] = logrank_test(df, "t", "e", "g", "A", "B").collect()
    assert (r["n_a"], r["n_b"], r["n_events_a"], r["n_events_b"]) == (3, 3, 2, 2)
    # python replay of the per-time chain
    data = [(t, g == "A", e) for g, t, e in rows]
    times = sorted({t for t, _, e in data if e})
    o = v = 0.0
    for t in times:
        ra = sum(1 for tt, a, _ in data if tt >= t and a)
        rb = sum(1 for tt, a, _ in data if tt >= t and not a)
        da = sum(e for tt, a, e in data if tt == t and a)
        dbb = sum(e for tt, a, e in data if tt == t and not a)
        nt, dt = ra + rb, da + dbb
        o += round(da - dt * ra / nt, 12)
        if nt > 1:
            v += round(dt * (ra / nt) * (rb / nt) * ((nt - dt) / (nt - 1)), 12)
    assert r["o_minus_e"] == round(o, 6)
    assert r["chi2"] == round(o * o / v, 6)
    assert 0 < r["p"] < 1  # exact value pinned by the parity test

    # identical cohorts -> chi2 ~ 0, not significant
    same = [("A", t, 1) for t in (1, 2, 3, 4)] + [("B", t, 1) for t in (1, 2, 3, 4)]
    [ri] = logrank_test(
        spark.createDataFrame(same, "g string, t long, e int"), "t", "e", "g", "A", "B"
    ).collect()
    assert abs(ri["o_minus_e"]) < 1e-9 and ri["significant"] is False

    # strongly separated cohorts -> significant
    sep = [("A", t % 3 + 1, 1) for t in range(40)] + [
        ("B", t % 3 + 20, 1) for t in range(40)
    ]
    [rs] = logrank_test(
        spark.createDataFrame(sep, "g string, t long, e int"), "t", "e", "g", "A", "B"
    ).collect()
    assert rs["significant"] is True and rs["p"] < 0.001

    # all-censored: zero variance -> NULL chi2/p, never div/0
    cen = [("A", 1, 0), ("B", 2, 0)]
    [rc] = logrank_test(
        spark.createDataFrame(cen, "g string, t long, e int"), "t", "e", "g", "A", "B"
    ).collect()
    assert rc["chi2"] is None and rc["p"] is None and rc["significant"] is False


def test_logrank_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.checks.evaluation import (
        logrank_oracle_sql,
        logrank_test,
    )

    rows = [
        ("A" if i % 2 == 0 else "B", (i * i) % 13 + 1, 1 if i % 3 else 0)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "g string, t long, e int")
    [got] = logrank_test(df, "t", "e", "g", "A", "B").collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE surv (g VARCHAR, t BIGINT, e BIGINT)")
    con.executemany("INSERT INTO surv VALUES (?, ?, ?)", rows)
    [want] = con.execute(
        logrank_oracle_sql("SELECT t, g = 'A' AS ga, e FROM surv")
    ).fetchall()
    assert tuple(got) == tuple(want)


def test_cochran_armitage_hand_computed(spark):
    import math

    from xmlschemavalidator_spark.checks.evaluation import cochran_armitage

    # rates rising with score: s=0 1/10, s=1 4/10, s=2 8/10
    rows = (
        [(0, 1)] * 1 + [(0, 0)] * 9
        + [(1, 1)] * 4 + [(1, 0)] * 6
        + [(2, 1)] * 8 + [(2, 0)] * 2
    )
    df = spark.createDataFrame(rows, "s long, y int")
    [r] = cochran_armitage(df, "s", "y").collect()
    n, x = 30, 13
    sn = 10 * 1 + 10 * 2
    sx = 4 * 1 + 8 * 2
    ssn = 10 * 1 + 10 * 4
    t = n * sx - x * sn  # exact integer numerator
    assert (r["n"], r["x"], r["n_groups"]) == (n, x, 3)
    assert r["t_scaled"] == str(t)
    pbar = x / n
    var = pbar * (1 - pbar) * (ssn - sn * sn / n)
    z = t / n / math.sqrt(var)
    assert r["z"] == round(z, 6)
    assert r["significant"] is True and r["p"] < 0.01

    # flat rates -> z ~ 0, not significant
    flat = [(s, i % 2) for s in (0, 1, 2) for i in range(10)]
    [rf] = cochran_armitage(
        spark.createDataFrame(flat, "s long, y int"), "s", "y"
    ).collect()
    assert abs(rf["z"]) < 1e-9 and rf["significant"] is False

    # all-success: pbar(1-pbar) = 0 -> NULL z/p
    allw = [(s, 1) for s in (0, 1, 2) for _ in range(5)]
    [ra] = cochran_armitage(
        spark.createDataFrame(allw, "s long, y int"), "s", "y"
    ).collect()
    assert ra["z"] is None and ra["p"] is None and ra["significant"] is False

    # single score value: zero spread -> NULL z
    one = [(1, i % 2) for i in range(10)]
    [ro] = cochran_armitage(
        spark.createDataFrame(one, "s long, y int"), "s", "y"
    ).collect()
    assert ro["z"] is None and ro["significant"] is False

    # decreasing trend -> negative z, same |z| as the mirrored rise
    dec = (
        [(2, 1)] * 1 + [(2, 0)] * 9
        + [(1, 1)] * 4 + [(1, 0)] * 6
        + [(0, 1)] * 8 + [(0, 0)] * 2
    )
    [rd] = cochran_armitage(
        spark.createDataFrame(dec, "s long, y int"), "s", "y"
    ).collect()
    assert rd["z"] == -r["z"]


def test_cochran_armitage_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.checks.evaluation import (
        cochran_armitage,
        cochran_armitage_oracle_sql,
    )

    rows = [(i % 4, 1 if (i * i) % 7 < i % 4 + 2 else 0) for i in range(300)]
    df = spark.createDataFrame(rows, "s long, y int")
    [got] = cochran_armitage(df, "s", "y").collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE dose (s BIGINT, y BIGINT)")
    con.executemany("INSERT INTO dose VALUES (?, ?)", rows)
    [want] = con.execute(
        cochran_armitage_oracle_sql("SELECT s, y FROM dose")
    ).fetchall()
    assert tuple(got) == tuple(want)


def test_cohens_kappa_hand_computed(spark):
    from xmlschemavalidator_spark.checks.evaluation import cohens_kappa

    # classic 2x2: a/a 20, a/b 5, b/a 10, b/b 15 -> po=.7
    rows = [("a", "a")] * 20 + [("a", "b")] * 5 + [("b", "a")] * 10 + [("b", "b")] * 15
    df = spark.createDataFrame(rows, "x string, y string")
    [r] = cohens_kappa(df, "x", "y").collect()
    assert (r["n"], r["n_categories"]) == (50, 2)
    assert r["po"] == 0.7
    # pe = (25*30 + 25*20)/2500 = .5 -> kappa = .2/.5 = .4
    assert r["pe"] == 0.5 and r["kappa"] == 0.4

    # perfect agreement -> kappa 1; label-swapped -> negative
    same = [("x", "x")] * 5 + [("y", "y")] * 5
    [rp] = cohens_kappa(
        spark.createDataFrame(same, "a string, b string"), "a", "b"
    ).collect()
    assert rp["kappa"] == 1.0
    swap = [("x", "y")] * 5 + [("y", "x")] * 5
    [rs] = cohens_kappa(
        spark.createDataFrame(swap, "a string, b string"), "a", "b"
    ).collect()
    assert rs["kappa"] == -1.0

    # both raters constant: pe = 1 -> NULL kappa (undefined), po intact
    const = [("x", "x")] * 7
    [rc] = cohens_kappa(
        spark.createDataFrame(const, "a string, b string"), "a", "b"
    ).collect()
    assert rc["po"] == 1.0 and rc["kappa"] is None

    # NULL is a category: abstention disagrees with a verdict
    nul = [("x", None)] * 3 + [("x", "x")] * 3
    [rn] = cohens_kappa(
        spark.createDataFrame(nul, "a string, b string"), "a", "b"
    ).collect()
    assert rn["po"] == 0.5 and rn["n_categories"] == 2

    # skew illustration: high po, modest kappa (the honesty correction)
    skew = [("en", "en")] * 90 + [("de", "en")] * 5 + [("de", "de")] * 5
    [rk] = cohens_kappa(
        spark.createDataFrame(skew, "a string, b string"), "a", "b"
    ).collect()
    assert rk["po"] == 0.95 and rk["kappa"] < 0.7


def test_cohens_kappa_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.checks.evaluation import (
        cohens_kappa,
        cohens_kappa_oracle_sql,
    )

    rows = [
        (f"l{i % 3}", f"l{(i * i) % 4}" if i % 13 else None) for i in range(250)
    ]
    df = spark.createDataFrame(rows, "x string, y string")
    [got] = cohens_kappa(df, "x", "y").collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE raters (x VARCHAR, y VARCHAR)")
    con.executemany("INSERT INTO raters VALUES (?, ?)", rows)
    [want] = con.execute(
        cohens_kappa_oracle_sql("SELECT x, y FROM raters", "x", "y")
    ).fetchall()
    assert tuple(got) == tuple(want)


def test_wilcoxon_hand_computed(spark):
    import math

    from xmlschemavalidator_spark.checks.evaluation import wilcoxon_signed_rank

    # pairs with diffs: +1, +2, +2, -3, 0 (dropped)
    rows = [(2.0, 1.0), (3.0, 1.0), (5.0, 3.0), (1.0, 4.0), (7.0, 7.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    [r] = wilcoxon_signed_rank(df, "a", "b").collect()
    assert (r["n_pairs"], r["n_zero_dropped"]) == (4, 1)
    # |d| lattice (micros): 1e6 (t=1, pos), 2e6 (t=2, both pos), 3e6 (neg)
    # doubled ranks: 1e6 -> 2; 2e6 block -> 2*1+2+1=5 each; 3e6 -> 2*3+1+1=8
    # W2 = 1*2 + 2*5 = 12 -> W+ = 6
    assert r["w_plus_doubled"] == 12
    n = 4
    ts = (2 ** 3 - 2)  # one tie block of 2
    var = n * (n + 1) * (2 * n + 1) / 24 - ts / 48
    z = (6 - n * (n + 1) / 4) / math.sqrt(var)
    assert r["z"] == round(z, 6)
    assert r["significant"] is False

    # strongly one-sided: all diffs positive -> significant
    big = [(float(i + 10), float(i)) for i in range(40)]
    [rb] = wilcoxon_signed_rank(
        spark.createDataFrame(big, "a double, b double"), "a", "b"
    ).collect()
    assert rb["significant"] is True and rb["p"] < 1e-6
    # with every diff positive, W+ is the full rank sum: W2 = n(n+1)
    assert rb["w_plus_doubled"] == 40 * 41

    # symmetric diffs -> z ~ 0
    sym = [(1.0, 2.0), (2.0, 1.0), (3.0, 5.0), (5.0, 3.0)]
    [rs] = wilcoxon_signed_rank(
        spark.createDataFrame(sym, "a double, b double"), "a", "b"
    ).collect()
    assert abs(rs["z"]) < 1e-9

    # all pairs identical -> zero pairs, NULL z
    zz = [(1.0, 1.0)] * 5
    [rz] = wilcoxon_signed_rank(
        spark.createDataFrame(zz, "a double, b double"), "a", "b"
    ).collect()
    assert rz["n_pairs"] == 0 and rz["z"] is None and rz["significant"] is False


def test_wilcoxon_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.checks.evaluation import (
        wilcoxon_oracle_sql,
        wilcoxon_signed_rank,
    )

    rows = [
        (((i * 7) % 23) / 3.0, ((i * 5) % 19) / 2.0) for i in range(150)
    ] + [(None, 1.0), (2.0, None)]
    df = spark.createDataFrame(rows, "a double, b double")
    [got] = wilcoxon_signed_rank(df, "a", "b").collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE pairs (a DOUBLE, b DOUBLE)")
    con.executemany("INSERT INTO pairs VALUES (?, ?)", rows)
    [want] = con.execute(
        wilcoxon_oracle_sql("SELECT a, b FROM pairs")
    ).fetchall()
    assert tuple(got) == tuple(want)


def test_cuped_variance_reduction(spark):
    from xmlschemavalidator_spark.checks.evaluation import cuped_test

    # metric = covariate + small group effect + deterministic noise:
    # the covariate explains most variance, CUPED must shrink it
    rows = []
    for i in range(400):
        g = "A" if i % 2 == 0 else "B"
        x = float((i * 7) % 50)            # pre-period covariate
        noise = float((i * i) % 5)
        y = x * 2.0 + noise + (3.0 if g == "A" else 0.0)
        rows.append((g, y, x))
    df = spark.createDataFrame(rows, "g string, y double, x double")
    [r] = cuped_test(df, "y", "x", "g", "A", "B").collect()
    assert r["n_a"] == 200 and r["n_b"] == 200
    assert abs(r["theta"] - 2.0) < 0.1          # recovers the true slope
    assert r["var_reduction"] > 0.95            # covariate explains ~all
    assert abs(r["mean_diff_adj"] - 3.0) < 0.5  # the true effect
    assert r["significant"] is True

    # useless covariate (constant): theta NULL, adjusted test NULL
    flat = [(g, y, 1.0) for g, y, _ in rows]
    [rf] = cuped_test(
        spark.createDataFrame(flat, "g string, y double, x double"),
        "y", "x", "g", "A", "B",
    ).collect()
    assert rf["theta"] is None and rf["z"] is None and rf["significant"] is False
    assert rf["mean_diff_raw"] is not None      # the raw diff still reports


def test_cuped_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.checks.evaluation import (
        cuped_oracle_sql,
        cuped_test,
    )

    rows = [
        ("A" if i % 3 == 0 else "B", ((i * 11) % 31) / 2.0, ((i * 5) % 17) / 3.0)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, y double, x double")
    [got] = cuped_test(df, "y", "x", "g", "A", "B").collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE ab (g VARCHAR, y DOUBLE, x DOUBLE)")
    con.executemany("INSERT INTO ab VALUES (?, ?, ?)", rows)
    [want] = con.execute(
        cuped_oracle_sql("SELECT g = 'A' AS ga, y, x FROM ab")
    ).fetchall()
    assert tuple(got) == tuple(want)


def test_required_sample_size_hand_computed(spark):
    import math

    from xmlschemavalidator_spark.checks.evaluation import required_sample_size

    # base rate 0.2 from 100 rows, MDE 5pp
    rows = [(True,)] * 20 + [(False,)] * 80
    df = spark.createDataFrame(rows, "y boolean")
    [r] = required_sample_size(df, "y", mde_ppm=50_000).collect()
    assert (r["n"], r["base_rate"], r["mde"]) == (100, 0.2, 0.05)
    p1, p2, d, z = 0.2, 0.25, 0.05, (1960 + 842) / 1000
    want = math.ceil(z * z * (p1 * 0.8 + p2 * 0.75) / (d * d))
    assert r["n_per_arm"] == want and r["n_total"] == 2 * want
    assert r["feasible"] is False  # 100 rows can't fill ~2700

    # smaller MDE needs more data (monotonicity)
    [r2] = required_sample_size(df, "y", mde_ppm=10_000).collect()
    assert r2["n_per_arm"] > r["n_per_arm"]

    # degenerate base rate 1.0 with delta clamped -> varsum 0 -> NULL
    ones = spark.createDataFrame([(True,)] * 10, "y boolean")
    [rd] = required_sample_size(ones, "y", mde_ppm=50_000).collect()
    assert rd["n_per_arm"] is None and rd["feasible"] is False

    import pytest as _pt

    with _pt.raises(ValueError):
        required_sample_size(df, "y", mde_ppm=0)


def test_required_sample_size_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.checks.evaluation import (
        required_sample_size,
        required_sample_size_oracle_sql,
    )

    rows = [((i * i) % 7 < 2,) for i in range(333)]
    df = spark.createDataFrame(rows, "y boolean")
    [got] = required_sample_size(df, "y", mde_ppm=12_345).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE outc (y BOOLEAN)")
    con.executemany("INSERT INTO outc VALUES (?)", rows)
    [want] = con.execute(
        required_sample_size_oracle_sql("SELECT y FROM outc", "y", 12_345)
    ).fetchall()
    assert tuple(got) == tuple(want)


def test_equivalence_tost(spark):
    from xmlschemavalidator_spark.checks.evaluation import equivalence_test

    # two arms drawing the same deterministic values, margin comfortably
    # wide -> equivalent
    rows = [("A", float(i % 10)) for i in range(200)] + [
        ("B", float((i + 1) % 10)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    [r] = equivalence_test(df, "v", "g", "A", "B", margin_ppm=1_000_000).collect()
    assert r["equivalent"] is True and r["p_equiv"] < 0.05
    assert r["margin"] == 1.0

    # genuinely different means with a tight margin -> NOT equivalent
    far = [("A", 1.0 + (i % 3) * 0.01) for i in range(100)] + [
        ("B", 2.0 + (i % 3) * 0.01) for i in range(100)
    ]
    [rf] = equivalence_test(
        spark.createDataFrame(far, "g string, v double"),
        "v", "g", "A", "B", margin_ppm=100_000,
    ).collect()
    assert rf["equivalent"] is False and rf["p_equiv"] > 0.5

    # the under-powered trap, demonstrated: tiny n, same means -> a
    # difference test finds nothing, but TOST also refuses to certify
    tiny = [("A", 1.0), ("A", 5.0), ("B", 2.0), ("B", 4.0)]
    [rt] = equivalence_test(
        spark.createDataFrame(tiny, "g string, v double"),
        "v", "g", "A", "B", margin_ppm=100_000,
    ).collect()
    assert rt["equivalent"] is False  # absence of evidence stays absence

    # degenerate: single-row arm -> NULL z's, not equivalent
    deg = [("A", 1.0), ("B", 1.0), ("B", 2.0)]
    [rd] = equivalence_test(
        spark.createDataFrame(deg, "g string, v double"),
        "v", "g", "A", "B", margin_ppm=500_000,
    ).collect()
    assert rd["z_lower"] is None and rd["equivalent"] is False

    import pytest as _pt

    with _pt.raises(ValueError):
        equivalence_test(df, "v", "g", "A", "B", margin_ppm=0)


def test_equivalence_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.checks.evaluation import (
        equivalence_oracle_sql,
        equivalence_test,
    )

    rows = [
        ("A" if i % 2 == 0 else "B", ((i * 13) % 41) / 4.0) for i in range(240)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    [got] = equivalence_test(df, "v", "g", "A", "B", margin_ppm=250_000).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE eq (g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO eq VALUES (?, ?)", rows)
    [want] = con.execute(
        equivalence_oracle_sql("SELECT g = 'A' AS ga, v FROM eq", 250_000)
    ).fetchall()
    assert tuple(got) == tuple(want)


def test_spiegelhalter_z(spark):
    import math

    from xmlschemavalidator_spark.checks.evaluation import spiegelhalter_z

    # well calibrated by construction: p=.25 with 1/4 positives, p=.75
    # with 3/4 positives -> Z ~ 0
    rows = (
        [(0.25, 1)] + [(0.25, 0)] * 3 + [(0.75, 1)] * 3 + [(0.75, 0)]
    ) * 10
    df = spark.createDataFrame(rows, "p double, y int")
    [r] = spiegelhalter_z(df, "p", "y").collect()
    assert r["n"] == 80 and abs(r["z"]) < 1e-9
    assert r["miscalibrated"] is False

    # confidently wrong: p=.9 but labels all false -> large negative...
    # sign: (y-p)(1-2p) with y=0, p=.9: (-.9)(-0.8) = +.72 -> positive Z
    bad = [(0.9, 0)] * 50
    [rb] = spiegelhalter_z(spark.createDataFrame(bad, "p double, y int"), "p", "y").collect()
    assert rb["miscalibrated"] is True and rb["p"] < 1e-6

    # python replay on a mixed case
    mix = [(0.1, 0), (0.3, 1), (0.6, 0), (0.8, 1), (0.8, 0), (0.45, 1)]
    [rm] = spiegelhalter_z(spark.createDataFrame(mix, "p double, y int"), "p", "y").collect()
    num = v = 0
    for p_, y in mix:
        pm = min(max(math.floor(p_ * 1e6), 0), 1_000_000)
        num += (y * 1_000_000 - pm) * (1_000_000 - 2 * pm)
        v += (1_000_000 - 2 * pm) ** 2 * pm * (1_000_000 - pm)
    assert rm["z"] == round(num / math.sqrt(v), 6)

    # all-half forecasts: zero test variance -> NULL, never div/0
    half = [(0.5, i % 2) for i in range(20)]
    [rh] = spiegelhalter_z(spark.createDataFrame(half, "p double, y int"), "p", "y").collect()
    assert rh["z"] is None and rh["miscalibrated"] is False


def test_spiegelhalter_duckdb_parity(spark):
    import duckdb

    from xmlschemavalidator_spark.checks.evaluation import (
        spiegelhalter_oracle_sql,
        spiegelhalter_z,
    )

    rows = [(((i * 7) % 100) / 100.0, 1 if (i * i) % 3 == 0 else 0) for i in range(300)]
    df = spark.createDataFrame(rows, "p double, y int")
    [got] = spiegelhalter_z(df, "p", "y").collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE cal (p DOUBLE, y BIGINT)")
    con.executemany("INSERT INTO cal VALUES (?, ?)", rows)
    [want] = con.execute(
        spiegelhalter_oracle_sql("SELECT p, y FROM cal", "p", "y")
    ).fetchall()
    assert tuple(got) == tuple(want)


# ---------------------------------------------------------------------------
# fisher_exact
# ---------------------------------------------------------------------------


def _paired_bools(spark, n11, n10, n01, n00):
    rows = (
        [(True, True)] * n11
        + [(True, False)] * n10
        + [(False, True)] * n01
        + [(False, False)] * n00
    )
    return spark.createDataFrame(rows, "a boolean, b boolean")


def test_fisher_exact_tea_tasting(spark):
    # Fisher's lady-tasting-tea table: exact two-sided p = 2 * 17/70
    from xmlschemavalidator_spark.checks.evaluation import fisher_exact

    [r] = fisher_exact(_paired_bools(spark, 3, 1, 1, 3), "a", "b").collect()
    assert (r["n11"], r["n10"], r["n01"], r["n00"]) == (3, 1, 1, 3)
    assert abs(r["p"] - 34 / 70) < 2e-6  # micro-ln quantization: ±1e-6
    assert r["odds_ratio"] == 9.0
    assert r["significant"] is False


def test_fisher_exact_matches_exact_hypergeometric(spark):
    from math import comb

    from xmlschemavalidator_spark.checks.evaluation import fisher_exact

    def exact_p(n11, n10, n01, n00):
        r1, r2, c1 = n11 + n10, n01 + n00, n11 + n01
        n = r1 + r2
        tot = comb(n, c1)
        pmf = {
            k: comb(r1, k) * comb(r2, c1 - k) / tot
            for k in range(max(0, c1 - r2), min(r1, c1) + 1)
        }
        return sum(v for v in pmf.values() if v <= pmf[n11] * (1 + 1e-7))

    for cells in [(1, 9, 11, 3), (0, 5, 5, 0), (7, 0, 0, 9), (12, 5, 3, 14)]:
        [r] = fisher_exact(_paired_bools(spark, *cells), "a", "b").collect()
        assert abs(r["p"] - exact_p(*cells)) < 1e-4, (cells, r["p"])
        # significance is the integer-compared 5% verdict
        assert r["significant"] == (exact_p(*cells) < 0.05)


def test_fisher_exact_degenerate_and_empty(spark):
    from xmlschemavalidator_spark.checks.evaluation import fisher_exact

    # constant column: k_lo = k_hi, the only table has pmf 1 -> p = 1
    [r] = fisher_exact(_paired_bools(spark, 0, 0, 3, 5), "a", "b").collect()
    assert r["p"] == 1.0 and r["significant"] is False
    assert r["odds_ratio"] is None
    # empty input: NULL p, never a div/0
    empty = _paired_bools(spark, 0, 0, 0, 0)
    [r] = fisher_exact(empty, "a", "b").collect()
    assert r["n"] == 0 and r["p"] is None and r["significant"] is False


def test_fisher_exact_max_n_gate_and_nulls(spark):
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.checks.evaluation import fisher_exact

    df = _paired_bools(spark, 3, 1, 1, 3).union(
        _paired_bools(spark, 0, 0, 0, 1).select(
            F.lit(None).cast("boolean").alias("a"), F.col("b")
        )
    )
    [r] = fisher_exact(df, "a", "b").collect()
    assert r["n"] == 8  # NULL row excluded
    [r] = fisher_exact(df, "a", "b", max_n=5).collect()
    assert r["p"] is None and r["significant"] is False


# ---------------------------------------------------------------------------
# isotonic_calibration
# ---------------------------------------------------------------------------


def test_isotonic_pools_violating_bins(spark):
    # rates per bin: .1 .3 .2 .6 with equal weight 10 -> PAVA pools the
    # middle violation to (3+2)/20 = .25; ends untouched
    from xmlschemavalidator_spark.checks.evaluation import isotonic_calibration

    rows = []
    for b, pos in [(0, 1), (1, 3), (2, 2), (3, 6)]:
        p = (b + 0.5) / 4
        rows += [(p, True)] * pos + [(p, False)] * (10 - pos)
    df = spark.createDataFrame(rows, "prob double, label boolean")
    out = isotonic_calibration(df, "prob", "label", n_bins=4).collect()
    assert [r["raw_rate"] for r in out] == [0.1, 0.3, 0.2, 0.6]
    assert [r["calibrated"] for r in out] == [0.1, 0.25, 0.25, 0.6]


def test_isotonic_monotone_and_weighted(spark):
    # weights matter: a heavy low bin drags the pooled value toward it
    from xmlschemavalidator_spark.checks.evaluation import isotonic_calibration

    rows = [(0.1, True)] * 5 + [(0.1, False)] * 5  # bin0: .5, w=10
    rows += [(0.9, False)] * 90  # bin3: 0.0, w=90
    df = spark.createDataFrame(rows, "prob double, label boolean")
    out = isotonic_calibration(df, "prob", "label", n_bins=4).collect()
    # pooled mean = 5/100 = .05 on both bins
    assert [r["calibrated"] for r in out] == [0.05, 0.05]
    vals = [r["calibrated"] for r in out]
    assert vals == sorted(vals)


def test_isotonic_apply_and_edges(spark):
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.checks.evaluation import (
        isotonic_apply,
        isotonic_calibration,
    )

    rows = [(0.05, False), (0.2, False), (0.6, True), (0.95, True), (1.0, True)]
    df = spark.createDataFrame(rows, "prob double, label boolean")
    cmap = isotonic_calibration(df, "prob", "label", n_bins=4)
    # p=1.0 clamps into the top bin, never an out-of-range bin
    assert max(r["bin"] for r in cmap.collect()) == 3
    served = isotonic_apply(df, "prob", cmap, n_bins=4)
    assert served.where(F.col("calibrated").isNull()).count() == 0
    # monotone in prob
    got = [r["calibrated"] for r in served.orderBy("prob").collect()]
    assert got == sorted(got)
    # empty input -> empty map, no crash
    empty = df.where(F.lit(False))
    assert isotonic_calibration(empty, "prob", "label").count() == 0


# ---------------------------------------------------------------------------
# conformal_gate
# ---------------------------------------------------------------------------


def test_conformal_gate_rank_and_coverage(spark):
    import hashlib
    import math

    from xmlschemavalidator_spark.checks.evaluation import conformal_gate

    rows = [(i, math.sin(i * 0.7) * 3 + i % 11) for i in range(800)]
    df = spark.createDataFrame(rows, "id long, score double")
    [r] = conformal_gate(df, "score", "id", alpha_milli=200).collect()
    # python replay: same md5 split, same quantized rank selection
    thr_key = format(int(0.5 * (1 << 128)), "032x")

    def key(i):
        return hashlib.md5(f"conformal:{i}".encode()).hexdigest()

    cal = sorted(
        math.floor(s * 1e6) for i, s in rows if key(i) < thr_key
    )
    k = min(math.ceil((len(cal) + 1) * 0.8), len(cal))
    t = cal[k - 1]
    ev = [math.floor(s * 1e6) for i, s in rows if key(i) >= thr_key]
    cov = sum(1 for q in ev if q <= t) / len(ev)
    assert r["n_calib"] == len(cal) and r["n_eval"] == len(ev)
    assert r["k_rank"] == k and r["threshold"] == round(t / 1e6, 6)
    assert r["coverage_eval"] == round(cov, 6)
    assert r["covered"] == (cov >= 0.8)


def test_conformal_gate_edges(spark):
    import pytest

    from xmlschemavalidator_spark.checks.evaluation import conformal_gate

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "id long, score double"
    )
    # empty calibration half: one row, NULL threshold, covered=False
    [r] = conformal_gate(df, "score", "id", calib_fraction=0.0).collect()
    assert r["n_calib"] == 0 and r["threshold"] is None
    assert r["covered"] is False
    # empty eval half: threshold still set, coverage NULL
    [r] = conformal_gate(df, "score", "id", calib_fraction=1.0).collect()
    assert r["n_calib"] == 50 and r["threshold"] is not None
    assert r["coverage_eval"] is None and r["covered"] is False
    with pytest.raises(ValueError):
        conformal_gate(df, "score", "id", alpha_milli=0)


# ---------------------------------------------------------------------------
# did_test
# ---------------------------------------------------------------------------


def test_did_hand_computed(spark):
    # cells (means): t_pre 10, t_post 14, c_pre 1, c_post 2 -> DiD = 3
    from xmlschemavalidator_spark.checks.evaluation import did_test

    rows = (
        [(True, False, 9.0), (True, False, 11.0)]
        + [(True, True, 13.0), (True, True, 15.0)]
        + [(False, False, 0.0), (False, False, 2.0)]
        + [(False, True, 1.0), (False, True, 3.0)]
    )
    df = spark.createDataFrame(rows, "t boolean, p boolean, val double")
    [r] = did_test(df, "t", "p", "val").collect()
    assert (r["mean_t_pre"], r["mean_t_post"]) == (10.0, 14.0)
    assert (r["mean_c_pre"], r["mean_c_post"]) == (1.0, 2.0)
    assert r["did"] == 3.0
    # each cell: var 2, n 2 -> se = sqrt(4 * 2/2 / 2) = sqrt(4) = 2... no:
    # var/n = (2)/2 = 1 per cell -> se = sqrt(4) = 2; z = 1.5
    assert r["se"] == 2.0 and r["z"] == 1.5
    assert r["significant"] is False


def test_did_empty_and_singleton_cells(spark):
    from xmlschemavalidator_spark.checks.evaluation import did_test

    rows = [
        (True, False, 1.0),
        (True, True, 2.0),
        (True, True, 4.0),
        (False, False, 0.0),
        (False, False, 1.0),
        (False, True, 0.5),
        (False, True, 1.5),
    ]
    df = spark.createDataFrame(rows, "t boolean, p boolean, val double")
    # t_pre is a singleton cell: variance undefined -> NULL did/z
    [r] = did_test(df, "t", "p", "val").collect()
    assert r["did"] is None and r["z"] is None and r["significant"] is False
    assert r["mean_t_pre"] == 1.0  # means still reported where defined


# ---------------------------------------------------------------------------
# woe_iv / lift_chart
# ---------------------------------------------------------------------------


def test_woe_iv_hand_computed(spark):
    import math

    from xmlschemavalidator_spark.checks.evaluation import woe_iv, woe_iv_summary

    # bin a: 3 pos / 1 neg; bin b: 1 pos / 3 neg -> P = N = 4, symmetric
    rows = (
        [("a", True)] * 3 + [("a", False)]
        + [("b", True)] + [("b", False)] * 3
    )
    df = spark.createDataFrame(rows, "bin string, label boolean")
    per = {r["bin"]: r for r in woe_iv(df, "bin", "label").collect()}
    w = round(math.log(3), 12)
    assert per["a"]["woe"] == round(w, 6)
    assert per["b"]["woe"] == round(-w, 6)
    assert per["a"]["iv_term"] == round((3 / 4 - 1 / 4) * w, 6)
    [s] = woe_iv_summary(df, "bin", "label").collect()
    assert s["iv"] == round(2 * round((1 / 2) * w, 12), 6)
    assert s["strength"] == "strong"


def test_woe_iv_zero_cell_excluded(spark):
    from xmlschemavalidator_spark.checks.evaluation import woe_iv, woe_iv_summary

    rows = [("a", True), ("a", False), ("z", False), ("z", False)]
    df = spark.createDataFrame(rows, "bin string, label boolean")
    per = {r["bin"]: r for r in woe_iv(df, "bin", "label").collect()}
    assert per["z"]["woe"] is None and per["z"]["iv_term"] is None
    [s] = woe_iv_summary(df, "bin", "label").collect()
    assert s["n_bins"] == 2 and s["n_defined"] == 1


def test_lift_chart_perfect_separation(spark):
    from xmlschemavalidator_spark.checks.evaluation import lift_chart

    # 100 rows, top-20 scores are ALL the positives -> bucket 1,2 lift 5
    rows = [(i, 1.0 - i / 100.0, i < 20) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, score double, label boolean")
    out = {r["bucket"]: r for r in lift_chart(df, "score", "label", "id").collect()}
    assert out[1]["lift"] == 5.0 and out[2]["lift"] == 5.0
    assert out[2]["gain"] == 1.0  # all positives captured by depth 2
    assert out[10]["pos"] == 0 and out[10]["lift"] == 0.0
    assert [out[b]["n"] for b in range(1, 11)] == [10] * 10


def test_lift_chart_tie_break_deterministic(spark):
    from xmlschemavalidator_spark.checks.evaluation import lift_chart

    # all scores equal: bucket membership decided by id order
    rows = [(i, 0.5, i < 5) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, score double, label boolean")
    out = {r["bucket"]: r for r in lift_chart(df, "score", "label", "id", n_buckets=2).collect()}
    assert out[1]["pos"] == 5 and out[2]["pos"] == 0


# ---------------------------------------------------------------------------
# holm_adjust
# ---------------------------------------------------------------------------


def test_holm_stops_where_bh_rescues(spark):
    # same planted battery as the BH step-up test: BH rejects ranks 1-3,
    # Holm must stop at rank 2 (p2 = .0214 > .05/4) and reject ONLY rank 1
    from xmlschemavalidator_spark.checks.evaluation import bh_fdr, holm_adjust

    rows = [
        ("seg_a", 3.5), ("seg_b", 2.30), ("seg_c", 2.27),
        ("seg_d", 2.0), ("seg_e", 0.3), ("seg_f", None),
    ]
    df = spark.createDataFrame(rows, "seg string, z double")
    holm = {r["seg"]: r for r in holm_adjust(df, "seg").collect()}
    bh = {r["seg"]: r for r in bh_fdr(df, "seg").collect()}
    assert [s for s in holm if holm[s]["rejected"]] == ["seg_a"]
    assert sorted(s for s in bh if bh[s]["rejected"]) == ["seg_a", "seg_b", "seg_c"]
    # NULL z carried, excluded from m
    assert holm["seg_f"]["p_value"] is None
    assert holm["seg_f"]["rejected"] is False
    # adjusted p is monotone down the sorted order and clamped at 1
    ordered = sorted(
        (r for r in holm.values() if r["holm_rank"] is not None),
        key=lambda r: r["holm_rank"],
    )
    adj = [r["p_adjusted"] for r in ordered]
    assert adj == sorted(adj) and adj[-1] <= 1.0


def test_holm_all_significant_and_empty(spark):
    from xmlschemavalidator_spark.checks.evaluation import holm_adjust

    df = spark.createDataFrame(
        [("a", 9.0), ("b", 8.0)], "seg string, z double"
    )
    out = holm_adjust(df, "seg").collect()
    assert all(r["rejected"] for r in out)  # no first failure
    empty = df.where("false")
    assert holm_adjust(empty, "seg").count() == 0


# ---------------------------------------------------------------------------
# threshold_selection
# ---------------------------------------------------------------------------


def test_threshold_selection_hand_computed(spark):
    # pos scores .9 .8 .4 | neg .6 .3 .2: cutting at .8 -> tp2 fp0;
    # at .4 -> tp3 fp1. J(.8) = 2/3, J(.4) = 3/3 - 1/3 = 2/3 (tie) ->
    # smallest threshold of the tie class loses to... ties break by
    # SMALLEST q? No: deterministic rule is smallest threshold WINS the
    # tie (negq in the key). J ties at .4 and .8 -> picks .4.
    from xmlschemavalidator_spark.checks.evaluation import threshold_selection

    rows = [(0.9, True), (0.8, True), (0.4, True), (0.6, False), (0.3, False), (0.2, False)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    out = {r["criterion"]: r for r in threshold_selection(df, "score", "label").collect()}
    j = out["youden_j"]
    assert j["value"] == round(2 / 3, 6)
    assert j["threshold"] == 0.4 and (j["tp"], j["fp"]) == (3, 1)
    f1 = out["f1"]
    assert f1["value"] == round(6 / (6 + 1 + 0), 6)  # 2tp/(2tp+fp+fn) at .4
    acc = out["accuracy"]
    assert acc["tp"] + acc["tn"] == 5  # best accuracy 5/6


def test_threshold_selection_single_class(spark):
    from xmlschemavalidator_spark.checks.evaluation import threshold_selection

    # all-positive: J undefined (needs both classes), F1 + accuracy fine
    df = spark.createDataFrame(
        [(0.9, True), (0.1, True)], "score double, label boolean"
    )
    out = threshold_selection(df, "score", "label").collect()
    assert [r["criterion"] for r in out] == ["accuracy", "f1"]
    assert all(r["value"] == 1.0 for r in out)
    # all-negative: only accuracy survives
    df = spark.createDataFrame(
        [(0.9, False), (0.1, False)], "score double, label boolean"
    )
    out = threshold_selection(df, "score", "label").collect()
    assert [r["criterion"] for r in out] == ["accuracy"]


# ---------------------------------------------------------------------------
# fairness_audit / fairness_summary
# ---------------------------------------------------------------------------


def test_fairness_audit_hand_computed(spark):
    from xmlschemavalidator_spark.checks.evaluation import (
        fairness_audit,
        fairness_summary,
    )

    rows = (
        # group a: 4 rows, select 2 (one tp, one fp), 2 actual pos
        [("a", True, True), ("a", True, False), ("a", False, True), ("a", False, False)]
        # group b: 5 rows, select 1 (tp), 2 actual pos
        + [("b", True, True), ("b", False, True), ("b", False, False),
           ("b", False, False), ("b", False, False)]
    )
    df = spark.createDataFrame(rows, "grp string, pred boolean, label boolean")
    per = {r["grp"]: r for r in fairness_audit(df, "grp", "pred", "label").collect()}
    assert per["a"]["selection_rate"] == 0.5 and per["b"]["selection_rate"] == 0.2
    assert per["a"]["tpr"] == 0.5 and per["b"]["tpr"] == 0.5  # equalized odds holds
    assert per["a"]["fpr"] == 0.5 and per["b"]["fpr"] == 0.0
    [s] = fairness_summary(df, "grp", "pred", "label").collect()
    # DI ratio = (1/5)/(2/4) = 0.4 -> fails four-fifths
    assert (s["min_rate_group"], s["max_rate_group"]) == ("b", "a")
    assert s["disparate_impact_ratio"] == 0.4
    assert s["passes_four_fifths"] is False
    assert s["tpr_gap"] == 0.0 and s["fpr_gap"] == 0.5


def test_fairness_four_fifths_boundary_exact(spark):
    from xmlschemavalidator_spark.checks.evaluation import fairness_summary

    # rates exactly 0.4 vs 0.5: ratio exactly 0.8 -> PASSES (>=, integer
    # cross-multiply, no float threshold wobble)
    rows = [("a", i < 5, False) for i in range(10)] + [
        ("b", i < 4, False) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "grp string, pred boolean, label boolean")
    [s] = fairness_summary(df, "grp", "pred", "label").collect()
    assert s["disparate_impact_ratio"] == 0.8
    assert s["passes_four_fifths"] is True
    # single group: NULL ratio, verdict false
    df1 = df.where("grp = 'a'")
    [s1] = fairness_summary(df1, "grp", "pred", "label").collect()
    assert s1["disparate_impact_ratio"] is None
    assert s1["passes_four_fifths"] is False


# ---------------------------------------------------------------------------
# hosmer_lemeshow
# ---------------------------------------------------------------------------


def test_hosmer_lemeshow_calibrated_vs_broken(spark):
    import random

    import pytest

    from xmlschemavalidator_spark.checks.evaluation import hosmer_lemeshow

    random.seed(23)
    rows = []
    for i in range(2000):
        p = random.random()
        rows.append((i, round(p, 5), random.random() < p))
    df = spark.createDataFrame(rows, "id long, prob double, label boolean")
    [r] = hosmer_lemeshow(df, "prob", "label", "id").collect()
    assert r["n_informative"] == 10 and r["dof"] == 8
    assert r["miscalibrated"] is False  # well-calibrated by construction
    # squash the probabilities toward 0.5: same labels, broken calibration
    broken = [(i, round(min(max(p * 0.3 + 0.35, 0.0), 1.0), 5), y) for i, p, y in rows]
    df2 = spark.createDataFrame(broken, "id long, prob double, label boolean")
    [r2] = hosmer_lemeshow(df2, "prob", "label", "id").collect()
    assert r2["miscalibrated"] is True and r2["p"] == 0.0
    with pytest.raises(ValueError):
        hosmer_lemeshow(df, "prob", "label", "id", n_buckets=2)


def test_hosmer_lemeshow_degenerate_buckets_excluded(spark):
    from xmlschemavalidator_spark.checks.evaluation import hosmer_lemeshow

    # all-zero predictions: every bucket has E = 0 -> no informative
    # buckets, NULL dof/p, never a div/0
    rows = [(i, 0.0, i % 7 == 0) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, prob double, label boolean")
    [r] = hosmer_lemeshow(df, "prob", "label", "id", n_buckets=3).collect()
    assert r["n_informative"] == 0
    assert r["dof"] is None and r["p"] is None
    assert r["miscalibrated"] is False


# ---------------------------------------------------------------------------
# bayes_ab_test
# ---------------------------------------------------------------------------


def test_bayes_ab_symmetric_is_half_and_decisions(spark):
    from xmlschemavalidator_spark.checks.evaluation import bayes_ab_test

    rows = [("A", True), ("A", False), ("B", True), ("B", False)]
    df = spark.createDataFrame(rows, "variant string, outcome boolean")
    [r] = bayes_ab_test(df, "variant", "outcome", "A", "B").collect()
    assert r["prob_b_beats_a"] == 0.5  # identical posteriors
    assert r["decision"] == "keep_testing"
    # B clearly better: 9/10 vs 1/10
    rows = [("A", i < 1) for i in range(10)] + [("B", i < 9) for i in range(10)]
    df = spark.createDataFrame(rows, "variant string, outcome boolean")
    [r] = bayes_ab_test(df, "variant", "outcome", "A", "B").collect()
    assert r["prob_b_beats_a"] > 0.99 and r["decision"] == "ship_b"
    # mirrored: ship_a
    rows = [("A", i < 9) for i in range(10)] + [("B", i < 1) for i in range(10)]
    df = spark.createDataFrame(rows, "variant string, outcome boolean")
    [r] = bayes_ab_test(df, "variant", "outcome", "A", "B").collect()
    assert r["prob_b_beats_a"] < 0.01 and r["decision"] == "ship_a"


def test_bayes_ab_matches_exact_integral(spark):
    import math

    from xmlschemavalidator_spark.checks.evaluation import bayes_ab_test

    def exact(ca, na, cb, nb):
        aa, ba, ab, bb = ca + 1, na - ca + 1, cb + 1, nb - cb + 1

        def lnB(x, y):
            return math.lgamma(x) + math.lgamma(y) - math.lgamma(x + y)

        return sum(
            math.exp(
                lnB(aa + i, ba + bb)
                - math.log(bb + i)
                - lnB(1 + i, bb)
                - lnB(aa, ba)
            )
            for i in range(ab)
        )

    for ca, na, cb, nb in [(7, 50, 12, 50), (3, 30, 3, 40), (0, 10, 2, 10)]:
        rows = [("A", i < ca) for i in range(na)] + [
            ("B", i < cb) for i in range(nb)
        ]
        df = spark.createDataFrame(rows, "variant string, outcome boolean")
        [r] = bayes_ab_test(df, "variant", "outcome", "A", "B").collect()
        assert abs(r["prob_b_beats_a"] - exact(ca, na, cb, nb)) < 1e-4


def test_bayes_ab_gates(spark):
    from xmlschemavalidator_spark.checks.evaluation import bayes_ab_test

    # missing variant: NULL probability, keep_testing
    df = spark.createDataFrame([("A", True)], "variant string, outcome boolean")
    [r] = bayes_ab_test(df, "variant", "outcome", "A", "B").collect()
    assert r["prob_b_beats_a"] is None and r["decision"] == "keep_testing"
    # series longer than max_iterations: exact path refuses
    rows = [("A", True)] * 5 + [("B", True)] * 30
    df = spark.createDataFrame(rows, "variant string, outcome boolean")
    [r] = bayes_ab_test(
        df, "variant", "outcome", "A", "B", max_iterations=10
    ).collect()
    assert r["prob_b_beats_a"] is None and r["decision"] == "keep_testing"


# ---------------------------------------------------------------------------
# exact_binomial_test
# ---------------------------------------------------------------------------


def test_exact_binomial_matches_exact_pmf(spark):
    from math import comb

    import pytest

    from xmlschemavalidator_spark.checks.evaluation import exact_binomial_test

    def exact(n, k, p0):
        pmf = [comb(n, i) * p0**i * (1 - p0) ** (n - i) for i in range(n + 1)]
        return min(1.0, sum(v for v in pmf if v <= pmf[k] * (1 + 1e-7)))

    for n, k, p0m in [(100, 30, 200), (20, 0, 100), (15, 15, 500)]:
        df = spark.createDataFrame([(i < k,) for i in range(n)], "y boolean")
        [r] = exact_binomial_test(df, "y", p0_milli=p0m).collect()
        assert abs(r["p"] - exact(n, k, p0m / 1000)) < 2e-4
        assert r["significant"] == (exact(n, k, p0m / 1000) < 0.05)
    with pytest.raises(ValueError):
        exact_binomial_test(df, "y", p0_milli=0)


def test_exact_binomial_gates(spark):
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.checks.evaluation import exact_binomial_test

    df = spark.createDataFrame([(True,), (False,)], "y boolean")
    # empty input: NULL p
    [r] = exact_binomial_test(df.where(F.lit(False)), "y", p0_milli=500).collect()
    assert r["n"] == 0 and r["p"] is None and r["significant"] is False
    # over the walk gate: refused to NULL
    [r] = exact_binomial_test(df, "y", p0_milli=500, max_n=1).collect()
    assert r["p"] is None and r["significant"] is False


# ---------------------------------------------------------------------------
# cochrans_q
# ---------------------------------------------------------------------------


def test_cochrans_q_hand_computed(spark):
    from xmlschemavalidator_spark.checks.evaluation import cochrans_q

    # 4 blocks × 3 treatments; t3 passes everywhere, t1 nowhere:
    # C = (0, 2, 4), S = 6, R = (1, 2, 1, 2) -> ΣR² = 10
    # Q = 2·(3·20 − 36)/(18 − 10) = 48/8 = 6
    rows = []
    grid = {
        0: (0, 0, 1), 1: (0, 1, 1), 2: (0, 0, 1), 3: (0, 1, 1),
    }
    for b, (a, c, d) in grid.items():
        rows += [(b, "t1", bool(a)), (b, "t2", bool(c)), (b, "t3", bool(d))]
    df = spark.createDataFrame(rows, "blk long, trt string, y boolean")
    [r] = cochrans_q(df, "blk", "trt", "y").collect()
    assert (r["n_blocks"], r["n_treatments"], r["dof"]) == (4, 3, 2)
    assert r["q"] == 6.0


def test_cochrans_q_constant_blocks_null(spark):
    from xmlschemavalidator_spark.checks.evaluation import cochrans_q

    # every block all-pass: denominator k·S − ΣR² = 0 -> NULL
    rows = [(b, t, True) for b in range(5) for t in ("a", "b")]
    df = spark.createDataFrame(rows, "blk long, trt string, y boolean")
    [r] = cochrans_q(df, "blk", "trt", "y").collect()
    assert r["q"] is None and r["significant"] is False
    # incomplete block excluded
    rows += [(99, "a", True)]
    df = spark.createDataFrame(rows, "blk long, trt string, y boolean")
    [r] = cochrans_q(df, "blk", "trt", "y").collect()
    assert r["n_blocks"] == 5


# ---------------------------------------------------------------------------
# bowker_test
# ---------------------------------------------------------------------------


def test_bowker_hand_computed(spark):
    from xmlschemavalidator_spark.checks.evaluation import bowker_test

    # flows: a->b 8 vs b->a 2; a->c 3 vs c->a 3; b<->c never
    rows = (
        [("a", "b")] * 8 + [("b", "a")] * 2
        + [("a", "c")] * 3 + [("c", "a")] * 3
        + [("a", "a")] * 50  # diagonal must not enter
    )
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = bowker_test(df, "a", "b").collect()
    # chi2 = (8-2)²/10 + 0 = 3.6; b-c pair empty -> excluded from df
    assert r["chi2"] == 3.6
    assert r["n_informative_pairs"] == 2 and r["dof"] == 2
    assert r["n_offdiag_pairs"] == 2  # (a,b) and (a,c) materialized


def test_bowker_symmetric_and_degenerate(spark):
    from xmlschemavalidator_spark.checks.evaluation import bowker_test

    # perfectly symmetric flow: chi2 = 0, not significant
    rows = [("x", "y")] * 5 + [("y", "x")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = bowker_test(df, "a", "b").collect()
    assert r["chi2"] == 0.0 and r["significant"] is False
    # all-diagonal: no informative pairs -> NULL chi2/p
    rows = [("x", "x")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    [r] = bowker_test(df, "a", "b").collect()
    assert r["chi2"] is None and r["significant"] is False


def test_mcnemar_exact_hand_computed(spark):
    from math import comb

    from xmlschemavalidator_spark.checks.evaluation import mcnemar_exact_test

    rows = (
        [(True, True)] * 100 + [(False, False)] * 85
        + [(True, False)] * 12 + [(False, True)] * 3
    )
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    [r] = mcnemar_exact_test(df, "a", "b").collect()
    assert (r["n"], r["n_flips"], r["n_a_only"], r["n_b_only"]) == (200, 15, 12, 3)
    pmf = [comb(15, i) * 0.5**15 for i in range(16)]
    exact = sum(v for v in pmf if v <= pmf[12] * (1 + 1e-7))
    assert abs(r["p"] - exact) < 1e-5 and r["significant"] is True
    # zero flips: NULL p, no information
    df2 = spark.createDataFrame([(True, True)] * 5, "a boolean, b boolean")
    [r2] = mcnemar_exact_test(df2, "a", "b").collect()
    assert r2["p"] is None and r2["significant"] is False
