"""Learned quality classifier (quality_model.py): NB over hashed tokens,
weak-label bootstrap, exact integer scoring, persistence, and the
held-out-AUC-beats-heuristic claim (VERDICT r2 item 4)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from xmlschemavalidator_spark.quality_model import (
    QualityModel,
    score_quality,
    train_quality_model,
)
from xmlschemavalidator_spark.textops import gopher_pass, quality_score

SF = "/root/testdata/sf0.001"


def _auc(y, s):
    y, s = np.asarray(y, bool), np.asarray(s, float)
    order = np.argsort(s)
    ranks = np.empty(len(s))
    ranks[order] = np.arange(1, len(s) + 1)
    npos, nneg = y.sum(), (~y).sum()
    return (ranks[y].sum() - npos * (npos + 1) / 2) / (npos * nneg)


def test_heldout_auc_beats_heuristic(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "y", gopher_pass(F.col("text"))
    )
    train = docs.where(F.col("doc_id") % 5 != 0)
    test = docs.where(F.col("doc_id") % 5 == 0)
    model = train_quality_model(train, "doc_id", "y")
    rows = (
        score_quality(test, model, "doc_id")
        .join(
            test.select(
                F.col("doc_id").alias("doc"),
                "y",
                quality_score(F.col("text")).alias("h"),
            ),
            "doc",
        )
        .collect()
    )
    y = [bool(r["y"]) for r in rows]
    auc_nb = _auc(y, [r["quality_logodds"] for r in rows])
    auc_h = _auc(y, [r["h"] for r in rows])
    assert auc_nb > auc_h, (auc_nb, auc_h)
    assert auc_nb > 0.9, auc_nb  # genuinely learned, not a coin flip


def test_score_is_exact_integer_sum_and_prior_fallback(spark):
    docs = spark.createDataFrame(
        [
            (1, "good clean prose with the usual words", True),
            (2, "zz@@ ## !!", False),
            (3, "", None),  # NULL label -> excluded from training
        ],
        "doc_id bigint, text string, y boolean",
    )
    model = train_quality_model(docs, "doc_id", "y")
    got = {r["doc"]: r for r in score_quality(docs, model, "doc_id").collect()}
    assert set(got) == {1, 2, 3}
    for r in got.values():
        # logodds is exactly micros/1e6 and pass is exactly micros > 0
        assert r["quality_logodds"] == r["quality_micros"] / 1e6
        assert r["quality_pass"] == (r["quality_micros"] > 0)
    # token-less doc scores exactly the prior
    assert got[3]["quality_micros"] == model.prior_micro
    assert got[1]["quality_micros"] > got[2]["quality_micros"]
    # weight table always covers the full bucket space
    assert model.weights.count() == model.n_buckets


def test_save_load_roundtrip_scores_identical(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "y", gopher_pass(F.col("text"))
    )
    model = train_quality_model(docs, "doc_id", "y", n_buckets=512)
    path = str(tmp_path / "qm")
    model.save(path)
    loaded = QualityModel.load(spark, path)
    assert (
        loaded.prior_micro == model.prior_micro
        and loaded.n_buckets == model.n_buckets
        and loaded.n_docs_pos == model.n_docs_pos
    )
    a = {r["doc"]: r["quality_micros"] for r in score_quality(docs, model, "doc_id").collect()}
    b = {r["doc"]: r["quality_micros"] for r in score_quality(docs, loaded, "doc_id").collect()}
    assert a == b


def test_scoring_plan_broadcasts_weights(spark):
    """The B-row weight table must broadcast — a shuffle join on bucket
    would repartition the whole token stream at corpus scale."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "y", gopher_pass(F.col("text"))
    )
    model = train_quality_model(docs, "doc_id", "y", n_buckets=256)
    plan = score_quality(docs, model, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_quality_buckets_terciles(spark):
    import pytest

    from xmlschemavalidator_spark.quality_model import quality_buckets

    scored = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 10)], "doc bigint, quality_micros bigint"
    )
    with pytest.warns(RuntimeWarning, match="ONE global sort partition"):
        got = {r["doc"]: r["bucket"] for r in quality_buckets(scored, 3).collect()}
    # best scores (9,8,7) are the head bucket
    assert {d for d, b in got.items() if b == 1} == {9, 8, 7}
    assert {d for d, b in got.items() if b == 3} == {3, 2, 1}
    # grouped mode: independent tiles per group, no warning
    import warnings

    g = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 10), ("a", 3, 1), ("b", 4, 2)],
        "lang string, doc bigint, quality_micros bigint",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        got = {
            r["doc"]: r["bucket"]
            for r in quality_buckets(g, 3, group_col="lang").collect()
        }
    assert got[2] == 1 and got[1] == 2 and got[3] == 3 and got[4] == 1


def test_bigram_lm_scores_in_distribution_higher(spark):
    import math

    from xmlschemavalidator_spark.quality_model import (
        perplexity_score,
        train_bigram_lm,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lm = train_bigram_lm(docs.where(F.col("doc_id") % 5 != 0), "doc_id")
    assert lm.v > 1
    real = docs.where(F.col("doc_id") % 5 == 0).orderBy("doc_id").limit(1).collect()[0]["text"]
    test = spark.createDataFrame(
        [(1, real), (2, "zqx vbn mkl pqr stw xyz abc def ghi"), (3, "")],
        "doc_id bigint, text string",
    )
    got = {r["doc"]: r for r in perplexity_score(test, lm, "doc_id").collect()}
    assert got[1]["avg_logprob"] > got[2]["avg_logprob"]
    # exact-integer contract: avg is literally micro-sum / (n * 1e6)
    for d in (1, 2):
        r = got[d]
        assert r["avg_logprob"] == r["logprob_micro"] / (r["n_bigrams"] * 1e6)
        assert math.exp(-r["avg_logprob"]) > 1.0  # a real perplexity
    assert got[3]["n_bigrams"] == 0 and got[3]["avg_logprob"] is None


def test_bigram_lm_save_load_roundtrip(spark, tmp_path):
    from xmlschemavalidator_spark.quality_model import (
        BigramLM,
        perplexity_score,
        train_bigram_lm,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lm = train_bigram_lm(docs, "doc_id")
    path = str(tmp_path / "lm")
    lm.save(path)
    loaded = BigramLM.load(spark, path)
    assert (loaded.v, loaded.alpha) == (lm.v, lm.alpha)
    a = {r["doc"]: r["logprob_micro"] for r in perplexity_score(docs, lm, "doc_id").collect()}
    b = {r["doc"]: r["logprob_micro"] for r in perplexity_score(docs, loaded, "doc_id").collect()}
    assert a == b


def test_dsir_sample_shifts_toward_target_distribution(spark):
    from xmlschemavalidator_spark.quality_model import dsir_sample, train_dsir_model

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    target = docs.where(F.col("lang") == "en")
    base_frac = target.count() / docs.count()
    model = train_dsir_model(target, docs, "doc_id", n_buckets=1024)
    picked = dsir_sample(docs, model, "doc_id", k=100, salt="t")
    joined = picked.join(
        docs.select(F.col("doc_id").alias("doc"), "lang"), "doc"
    )
    en_frac = joined.where(F.col("lang") == "en").count() / 100
    # importance resampling must over-represent the target slice
    assert en_frac > base_frac + 0.15, (en_frac, base_frac)


def test_dsir_deterministic_and_partitioning_invariant(spark):
    from xmlschemavalidator_spark.quality_model import dsir_sample, train_dsir_model

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    model = train_dsir_model(docs.where(F.col("lang") == "en"), docs, "doc_id", n_buckets=512)
    a = sorted(r["doc"] for r in dsir_sample(docs, model, "doc_id", k=50, salt="s").collect())
    b = sorted(
        r["doc"]
        for r in dsir_sample(docs.repartition(13), model, "doc_id", k=50, salt="s").collect()
    )
    assert a == b
    c = sorted(r["doc"] for r in dsir_sample(docs, model, "doc_id", k=50, salt="z").collect())
    assert a != c  # the draw depends on the salt, not on rand()


def test_dsir_model_save_load_roundtrip(spark, tmp_path):
    from xmlschemavalidator_spark.quality_model import (
        ImportanceModel,
        dsir_score,
        train_dsir_model,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    model = train_dsir_model(docs.where(F.col("lang") == "en"), docs, "doc_id", n_buckets=256)
    path = str(tmp_path / "dsir")
    model.save(path)
    loaded = ImportanceModel.load(spark, path)
    assert (loaded.n_buckets, loaded.alpha) == (model.n_buckets, model.alpha)
    a = {r["doc"]: r["lambda_micro"] for r in dsir_score(docs, model, "doc_id").collect()}
    b = {r["doc"]: r["lambda_micro"] for r in dsir_score(docs, loaded, "doc_id").collect()}
    assert a == b


def test_dsir_threshold_selects_same_set_as_topk(spark):
    """The scale path (quantile-bracketed exact k-th element + narrow
    filter) must pick the IDENTICAL set the TakeOrderedAndProject path
    picks, for small and corpus-fraction k alike. boundary_cap=64 forces
    real bracket iterations on a 500-doc corpus."""
    from xmlschemavalidator_spark.quality_model import dsir_sample, train_dsir_model

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    model = train_dsir_model(docs.where(F.col("lang") == "en"), docs, "doc_id", n_buckets=512)
    for k in (50, 150, 400):
        topk = dsir_sample(docs, model, "doc_id", k=k, salt="th", method="topk")
        thr = dsir_sample(
            docs, model, "doc_id", k=k, salt="th", method="threshold", boundary_cap=64
        )
        a = sorted(r["doc"] for r in topk.collect())
        b = sorted(r["doc"] for r in thr.collect())
        assert a == b, f"k={k}: threshold set diverged from top-k set"
        assert len(b) == k


def test_dsir_threshold_k_ge_n_returns_all(spark):
    from xmlschemavalidator_spark.quality_model import dsir_sample, train_dsir_model

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    model = train_dsir_model(docs, docs, "doc_id", n_buckets=128)
    out = dsir_sample(docs, model, "doc_id", k=1000, method="threshold")
    assert out.count() == 40


def test_dsir_auto_picks_threshold_at_corpus_fraction_k(spark):
    """auto + n_docs routes corpus-fraction k to the threshold path (no
    TakeOrderedAndProject anywhere in the plan — VERDICT r3 item 1's 'done'
    criterion) and small k to the classic top-k."""
    from xmlschemavalidator_spark.quality_model import dsir_sample, train_dsir_model

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    model = train_dsir_model(docs.where(F.col("lang") == "en"), docs, "doc_id", n_buckets=256)
    jvm = spark._jvm

    def plan(df):
        return df._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )

    frac = dsir_sample(
        docs, model, "doc_id", k=300, salt="a", n_docs=n, topk_max_fraction=0.4
    )
    assert "TakeOrderedAndProject" not in plan(frac)
    small = dsir_sample(
        docs, model, "doc_id", k=150, salt="a", n_docs=n, topk_max_fraction=0.4
    )
    assert "TakeOrderedAndProject" in plan(small)


def test_quality_buckets_approx_matches_exact_orientation(spark):
    from xmlschemavalidator_spark.quality_model import (
        quality_buckets,
        quality_buckets_approx,
        score_quality,
        train_quality_model,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "y", gopher_pass(F.col("text"))
    )
    model = train_quality_model(docs, "doc_id", "y")
    scored = score_quality(docs, model, "doc_id")
    approx = quality_buckets_approx(scored, n_buckets=3)
    n = scored.count()
    sizes = {r["bucket"]: r["n"] for r in
             approx.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(sizes) <= {1, 2, 3}
    # tiles approximately equal (tight rel_error, 500 rows)
    for b in sizes:
        assert abs(sizes[b] - n / 3) < 0.25 * n, sizes
    # orientation: bucket 1 strictly the best scores — its min beats
    # bucket 3's max
    stats = {r["bucket"]: r for r in approx.groupBy("bucket").agg(
        F.min("quality_micros").alias("mn"), F.max("quality_micros").alias("mx")
    ).collect()}
    # clear message (not a KeyError) if score ties empty an edge bucket
    assert 1 in stats and 3 in stats, stats
    assert stats[1]["mn"] >= stats[3]["mx"]
    # same orientation as the exact ntile: the top-ranked doc of the
    # exact form is in approx bucket 1
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        exact = quality_buckets(scored, n_buckets=3)
    best_doc = exact.where("bucket = 1").orderBy(F.col("quality_micros").desc()).first()["doc"]
    assert approx.where(F.col("doc") == best_doc).first()["bucket"] == 1


def test_quality_buckets_approx_rejects_single_bucket(spark):
    import pytest as _pytest

    from xmlschemavalidator_spark.quality_model import quality_buckets_approx

    df = spark.createDataFrame([(1, 10)], "doc bigint, quality_micros bigint")
    with _pytest.raises(ValueError):
        quality_buckets_approx(df, n_buckets=1)


def test_quality_buckets_approx_rejects_bad_rel_error(spark):
    import pytest as _pytest

    from xmlschemavalidator_spark.quality_model import quality_buckets_approx

    df = spark.createDataFrame([(1, 10), (2, 20)], "doc bigint, quality_micros bigint")
    for bad in (0.0, -0.1, 0.9):
        with _pytest.raises(ValueError):
            quality_buckets_approx(df, rel_error=bad)


def test_ecdf_normalize_groups_and_singletons(spark):
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.quality_model import ecdf_normalize

    df = spark.createDataFrame(
        [
            ("en", 1, 10.0), ("en", 2, 20.0), ("en", 3, 30.0),
            ("de", 4, 999.0),            # singleton group -> 0
            ("fr", 5, 7.0), ("fr", 6, 7.0),  # tie -> id order splits
            ("xx", 7, None),             # NULL score excluded
        ],
        "lang string, id bigint, score double",
    )
    got = {r["id"]: r["pct_micro"] for r in
           ecdf_normalize(df, "score", "id", group_cols=("lang",)).collect()}
    assert got[1] == 0 and got[2] == 500000 and got[3] == 1000000
    assert got[4] == 0
    assert (got[5], got[6]) == (0, 1000000)
    assert 7 not in got


# --------------------------------------------------------------------------
# Kneser–Ney
# --------------------------------------------------------------------------

def _kn_reference(train_docs, score_docs, d=0.75):
    """Pure-Python interpolated KN mirroring the documented conventions."""
    import math
    from collections import Counter

    bc: Counter = Counter()
    for txt in train_docs:
        toks = ["<s>"] + txt.lower().split()
        for a, b in zip(toks, toks[1:]):
            bc[(a, b)] += 1
    n_p: Counter = Counter()
    n1p_fwd: Counter = Counter()
    n1p_bwd: Counter = Counter()
    for (a, b), n in bc.items():
        n_p[a] += n
        n1p_fwd[a] += 1
        n1p_bwd[b] += 1
    n_types = len(bc)
    v = len(n1p_bwd)

    def pc(w):
        return (n1p_bwd.get(w, 0) + 1.0) / (n_types + v + 1.0)

    out = []
    for txt in score_docs:
        toks = ["<s>"] + txt.lower().split()
        lp = 0
        nb = 0
        for a, b in zip(toks, toks[1:]):
            if n_p.get(a, 0) > 0:
                p = (
                    max(bc.get((a, b), 0) * 1e6 - d * 1e6, 0.0)
                    + d * 1e6 * n1p_fwd[a] * pc(b)
                ) / (n_p[a] * 1e6)
            else:
                p = pc(b)
            lp += math.floor(math.log(p) * 1e6)
            nb += 1
        out.append((nb, lp))
    return out


def test_kneser_ney_matches_pure_python_reference(spark):
    from xmlschemavalidator_spark.quality_model import (
        kn_perplexity_score,
        train_kneser_ney,
    )

    train = [
        "san francisco is foggy",
        "san francisco is hilly",
        "new york is big",
        "the bay near san francisco",
    ]
    score = ["san francisco is big", "totally unseen words here"]
    tdf = spark.createDataFrame(
        list(enumerate(train)), "doc_id bigint, text string"
    )
    sdf = spark.createDataFrame(
        list(enumerate(score)), "doc_id bigint, text string"
    )
    lm = train_kneser_ney(tdf, "doc_id")
    got = {
        r["doc"]: (r["n_bigrams"], r["logprob_micro"])
        for r in kn_perplexity_score(sdf, lm, "doc_id").collect()
    }
    want = _kn_reference(train, score)
    for i, w in enumerate(want):
        assert got[i] == w, (i, got[i], w)


def test_kneser_ney_continuation_beats_bound_word(spark):
    """'francisco' is frequent but follows ONLY 'san'; 'is' follows many
    contexts. In an unseen context KN must prefer the productive word —
    the distinction add-alpha smoothing cannot make."""
    from xmlschemavalidator_spark.quality_model import (
        kn_perplexity_score,
        train_kneser_ney,
    )

    train = [
        "san francisco",
        "san francisco",
        "san francisco",
        "cats is",
        "dogs is",
        "birds is",
    ]
    tdf = spark.createDataFrame(list(enumerate(train)), "doc_id bigint, text string")
    lm = train_kneser_ney(tdf, "doc_id")
    # both scored after the unseen context 'zzz' -> pure continuation prob
    sdf = spark.createDataFrame(
        [(0, "zzz francisco"), (1, "zzz is")], "doc_id bigint, text string"
    )
    got = {
        r["doc"]: r["logprob_micro"]
        for r in kn_perplexity_score(sdf, lm, "doc_id").collect()
    }
    assert got[1] > got[0]  # 'is' (3 distinct contexts) > 'francisco' (1)


def test_kneser_ney_save_load_roundtrip(spark, tmp_path):
    from xmlschemavalidator_spark.quality_model import (
        KneserNeyLM,
        kn_perplexity_score,
        train_kneser_ney,
    )

    tdf = spark.createDataFrame(
        [(0, "a b c"), (1, "a b d"), (2, "c a b")], "doc_id bigint, text string"
    )
    lm = train_kneser_ney(tdf, "doc_id")
    path = str(tmp_path / "knlm")
    lm.save(path)
    lm2 = KneserNeyLM.load(spark, path)
    a = sorted(tuple(r) for r in kn_perplexity_score(tdf, lm, "doc_id").collect())
    b = sorted(tuple(r) for r in kn_perplexity_score(tdf, lm2, "doc_id").collect())
    assert a == b
    assert (lm2.n_bigram_types, lm2.v, lm2.discount_micro) == (
        lm.n_bigram_types,
        lm.v,
        lm.discount_micro,
    )


def test_kneser_ney_rejects_bad_discount(spark):
    import pytest

    from xmlschemavalidator_spark.quality_model import train_kneser_ney

    df = spark.createDataFrame([(0, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        train_kneser_ney(df, "doc_id", discount_micro=0)
    with pytest.raises(ValueError):
        train_kneser_ney(df, "doc_id", discount_micro=1_000_000)


# --------------------------------------------------------------------------
# Stupid Backoff trigram LM
# --------------------------------------------------------------------------


def test_stupid_backoff_hand_computed(spark):
    import math

    from xmlschemavalidator_spark.quality_model import (
        sb_logprob_score,
        train_stupid_backoff,
    )

    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    lm = train_stupid_backoff(train, "doc_id")
    # margins of the padded trigram stream: N = 7 real tokens, v = 3
    assert (lm.n_tokens, lm.v) == (7, 3)

    test = spark.createDataFrame(
        [(10, "a b c"), (11, "b q"), (12, None)], "doc_id long, text string"
    )
    got = {
        r["doc"]: (r["n_trigrams"], r["logscore_micro"])
        for r in sb_logprob_score(test, lm, "doc_id").collect()
    }
    # doc 10: (s,s,a) 2/2 -> 0; (s,a,b) 2/2 -> 0; (a,b,c) 1/2
    assert got[10] == (3, math.floor(math.log(1 / 2) * 1e6))
    # doc 11: both trigrams unseen; (s,s,b): bigram (s,b) unseen ->
    # unigram b (n1=3); (s,b,q): q unseen -> add-1 floor
    a = 0.4
    a2 = a * a
    lp1 = math.floor(math.log(a2 * ((3 + 1.0) / 10.0)) * 1e6)
    lp2 = math.floor(math.log(a2 * ((0 + 1.0) / 10.0)) * 1e6)
    assert got[11] == (2, lp1 + lp2)
    assert got[12] == (0, 0)  # NULL text: zero trigrams


def test_stupid_backoff_bigram_level(spark):
    import math

    from xmlschemavalidator_spark.quality_model import (
        sb_logprob_score,
        train_stupid_backoff,
    )

    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    lm = train_stupid_backoff(train, "doc_id")
    test = spark.createDataFrame([(20, "b a a")], "doc_id long, text string")
    [r] = sb_logprob_score(test, lm, "doc_id").collect()
    # (s,s,b): unigram b -> a2*4/10 ; (s,b,a): BIGRAM hit 0.4*(1/2);
    # (b,a,a): bigram (a,a) unseen -> unigram a (n1=3)
    exp = (
        math.floor(math.log(0.16000000000000003 * ((3 + 1.0) / 10.0)) * 1e6)
        + math.floor(math.log(0.4 * (1.0 / 2.0)) * 1e6)
        + math.floor(math.log(0.16000000000000003 * ((3 + 1.0) / 10.0)) * 1e6)
    )
    assert (r["n_trigrams"], r["logscore_micro"]) == (3, exp)


def test_stupid_backoff_ranks_fluent_over_shuffled(spark):
    from xmlschemavalidator_spark.quality_model import (
        sb_logprob_score,
        train_stupid_backoff,
    )

    corpus = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)],
        "doc_id long, text string",
    )
    lm = train_stupid_backoff(corpus, "doc_id")
    probe = spark.createDataFrame(
        [(100, "the quick brown fox"), (101, "fox brown quick the")],
        "doc_id long, text string",
    )
    rows = {r["doc"]: r["avg_logscore"] for r in
            sb_logprob_score(probe, lm, "doc_id").collect()}
    assert rows[100] > rows[101]
