"""Trained language classifier (VERDICT r3 item 3): hashed char-n-gram
multinomial NB bootstrapped from the stopword heuristic's confident
calls. The planted corpus follows the planted-oracle rule — the driver
testdata's text is lang-independent, so every signal here is constructed:
per-language word pools with DISTINCT character distributions, and a
held-out set that contains NO stopwords at all (the heuristic must say
'und' there; the classifier must still call the language from trigrams —
that generalization gap IS the point of training a model)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# train pool: stopwords (so the weak teacher labels confidently) + words
# whose char n-grams are language-typical; holdout pool: stopword-FREE
_TRAIN_WORDS = {
    "en": ["the", "and", "of", "that", "light", "night", "through", "world", "thing", "knowing"],
    "de": ["der", "die", "und", "nicht", "schön", "zügig", "straße", "müller", "könig", "jünger"],
    "fr": ["le", "la", "les", "pour", "château", "français", "déjà", "très", "être", "voilà"],
    "es": ["el", "los", "que", "por", "señor", "año", "corazón", "niño", "mañana", "español"],
    "sv": ["och", "att", "det", "som", "björn", "över", "något", "sjö", "kärlek", "förstå"],
}
_HOLDOUT_WORDS = {
    "en": ["light", "night", "through", "world", "thing", "knowing", "brought", "weather"],
    "de": ["schön", "zügig", "straße", "müller", "könig", "jünger", "größe", "übung"],
    "fr": ["château", "français", "déjà", "très", "être", "voilà", "forêt", "hôtel"],
    "es": ["señor", "año", "corazón", "niño", "mañana", "español", "cañón", "sueño"],
    "sv": ["björn", "över", "något", "sjö", "kärlek", "förstå", "sjön", "höjd"],
}


def _doc(words: list[str], seed: int, n: int = 24) -> str:
    # deterministic "sampling" without random: rotate through the pool
    return " ".join(words[(seed + i * 7) % len(words)] for i in range(n))


def _corpus(spark, pool: dict, n_per_lang: int, id_base: int):
    rows = []
    i = 0
    for lang in sorted(pool):
        for s in range(n_per_lang):
            rows.append((id_base + i, lang, _doc(pool[lang], s)))
            i += 1
    return spark.createDataFrame(rows, "doc_id bigint, true_lang string, text string")


def test_weak_trained_classifier_beats_heuristic_on_stopword_free_holdout(spark):
    from xmlschemavalidator_spark.lang_model import predict_lang, train_lang_model_weak
    from xmlschemavalidator_spark.textops import lang_id

    train = _corpus(spark, _TRAIN_WORDS, 40, 0)
    holdout = _corpus(spark, _HOLDOUT_WORDS, 20, 10_000)
    model = train_lang_model_weak(train, "doc_id", n_buckets=2048)
    assert set(model.langs) == set(_TRAIN_WORDS)

    pred = predict_lang(holdout, model, "doc_id").join(
        holdout.select(F.col("doc_id").alias("doc"), "true_lang"), "doc"
    )
    n = holdout.count()
    model_acc = pred.where(F.col("lang_pred") == F.col("true_lang")).count() / n
    heur = holdout.select(
        "true_lang", lang_id(F.col("text")).alias("h")
    )
    heur_acc = heur.where(F.col("h") == F.col("true_lang")).count() / n
    # the holdout has zero stopwords: the heuristic is blind there
    assert heur_acc <= 0.05, heur_acc
    assert model_acc >= 0.95, model_acc


def test_predictions_deterministic_and_partitioning_invariant(spark):
    from xmlschemavalidator_spark.lang_model import predict_lang, train_lang_model

    train = _corpus(spark, _TRAIN_WORDS, 20, 0)
    model = train_lang_model(train, "doc_id", label_col="true_lang", n_buckets=1024)
    a = sorted(
        (r["doc"], r["lang_pred"], r["score_micro"])
        for r in predict_lang(train, model, "doc_id").collect()
    )
    b = sorted(
        (r["doc"], r["lang_pred"], r["score_micro"])
        for r in predict_lang(train.repartition(13), model, "doc_id").collect()
    )
    assert a == b


def test_empty_text_scores_prior_argmax(spark):
    from xmlschemavalidator_spark.lang_model import predict_lang, train_lang_model

    train = _corpus(spark, _TRAIN_WORDS, 10, 0)
    # skew priors: double the en docs
    en_extra = train.where(F.col("true_lang") == "en").withColumn(
        "doc_id", F.col("doc_id") + 500
    )
    model = train_lang_model(train.union(en_extra), "doc_id", "true_lang", n_buckets=512)
    empties = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")], "doc_id bigint, text string"
    )
    out = {r["doc"]: r["lang_pred"] for r in predict_lang(empties, model, "doc_id").collect()}
    best_prior = max(sorted(model.priors), key=lambda lg: (model.priors[lg], ))
    # featureless docs score the prior only -> argmax prior (en, doubled)
    assert best_prior == "en"
    assert set(out.values()) == {"en"}


def test_save_load_roundtrip(spark, tmp_path):
    from xmlschemavalidator_spark.lang_model import (
        LangModel,
        predict_lang,
        train_lang_model,
    )

    train = _corpus(spark, _TRAIN_WORDS, 10, 0)
    model = train_lang_model(train, "doc_id", "true_lang", n_buckets=512)
    path = str(tmp_path / "langnb")
    model.save(path)
    loaded = LangModel.load(spark, path)
    assert (loaded.langs, loaded.priors, loaded.n_buckets, loaded.n) == (
        model.langs,
        model.priors,
        model.n_buckets,
        model.n,
    )
    a = {r["doc"]: r["lang_pred"] for r in predict_lang(train, model, "doc_id").collect()}
    b = {r["doc"]: r["lang_pred"] for r in predict_lang(train, loaded, "doc_id").collect()}
    assert a == b


def test_with_lang_feeds_ccnet_terciles_and_report(spark, tmp_path):
    """The VERDICT 'done' criterion: per-lang downstream stages (CCNet
    terciles, report per_lang panel) run on CLASSIFIER-produced langs."""
    from xmlschemavalidator_spark.lang_model import train_lang_model_weak, with_lang
    from xmlschemavalidator_spark.quality_model import (
        perplexity_score,
        quality_buckets,
        train_bigram_lm,
    )
    from xmlschemavalidator_spark.report import per_doc_signals

    docs = _corpus(spark, _TRAIN_WORDS, 15, 0).drop("true_lang")
    model = train_lang_model_weak(docs, "doc_id", n_buckets=1024)
    tagged = with_lang(docs, model, "doc_id")
    assert "lang" in tagged.columns
    langs = {r["lang"] for r in tagged.select("lang").distinct().collect()}
    assert langs <= set(_TRAIN_WORDS)

    lm = train_bigram_lm(tagged, "doc_id")
    scored = perplexity_score(tagged, lm, "doc_id").join(
        tagged.select(F.col("doc_id").alias("doc"), "lang"), "doc"
    )
    buckets = quality_buckets(
        scored, n_buckets=3, score_col="logprob_micro", group_col="lang"
    )
    assert buckets.count() == tagged.count()

    sig = per_doc_signals(tagged, "doc_id")
    assert "lang" in sig.columns
    per_lang = sig.groupBy("lang").count()
    assert per_lang.count() == len(langs)


def test_char_ngrams_matches_duckdb_replica(spark):
    """Gram-stream parity: the exact arrays, including the sequence(1,0)
    guard (short strings), truncation, and ws-collapse, byte-equal vs the
    SQL template in DuckDB."""
    import duckdb

    from xmlschemavalidator_spark.lang_model import char_ngrams, char_ngrams_sql

    rows = [
        (1, "Hello  World"),
        (2, "ab"),
        (3, ""),
        (4, None),
        (5, "tab\there\x0bvt"),
        (6, "x" * 1200),
        (7, "éclair ÜBUNG señor"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", char_ngrams(F.col("text"), 3, 1000).alias("g")).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT doc_id, {char_ngrams_sql('text', 3, 1000)} FROM t"
        ).fetchall()
    }
    assert got == want
