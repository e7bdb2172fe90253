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
