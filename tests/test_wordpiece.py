"""WordPiece tokenizer (wordpiece.py): the likelihood-normalized merge
objective (the thing that distinguishes it from BPE), greedy
longest-match semantics, atomic-UNK behavior, determinism, the
reconstruction invariant, id mapping reuse, and the encode plan shape.
Cross-engine exactness (training included) is pinned by the
wordpiece_encode_replay / wordpiece_vocab_planted oracles."""
from __future__ import annotations

from pyspark.sql import functions as F

from xmlschemavalidator_spark.unigram import unigram_encode_ids
from xmlschemavalidator_spark.wordpiece import (
    UNK,
    WordPieceModel,
    greedy_segment,
    train_wordpiece,
    train_wordpiece_from_counts,
    wordpiece_encode,
    wordpiece_vocab,
)


def test_trainer_prefers_high_pmi_merge_over_raw_count():
    # ("a","##b") count 10 but its parts are everywhere (score
    # 10/(100*10)); ("x","##y") count 5 with parts occurring ONLY
    # together (score 5/(5*5)) — WordPiece must merge xy first, where
    # raw-count BPE would merge ab. vocab_size=6 allows exactly one
    # merge over the 5 alphabet units.
    wc = [("ab", 10), ("a", 90), ("b", 90), ("xy", 5)]
    v = train_wordpiece_from_counts(wc, vocab_size=6, min_frequency=2)
    assert "xy" in v and "ab" not in v


def test_trainer_is_deterministic_and_respects_min_frequency():
    wc = [("ab", 134), ("abab", 133), ("ababab", 133),
          ("cd", 200), ("cdcd", 200), ("xyz", 400)]
    v = train_wordpiece_from_counts(wc, vocab_size=12, min_frequency=2)
    assert v == train_wordpiece_from_counts(wc, vocab_size=12, min_frequency=2)
    assert len(v) <= 12
    # a pair occurring once never merges at min_frequency=2
    v1 = train_wordpiece_from_counts([("qz", 1)], vocab_size=8, min_frequency=2)
    assert v1 == ["##z", "q"]


def test_greedy_longest_match_and_continuation_prefix():
    vocab = frozenset({"a", "ab", "##b", "##bc", "##c"})
    assert greedy_segment("abc", vocab) == ["ab", "##c"]
    assert greedy_segment("abbc", vocab) == ["ab", "##bc"]
    # no piece at a position -> the WHOLE word is atomic UNK
    assert greedy_segment("abq", vocab) == [UNK]
    assert greedy_segment("qab", vocab) == [UNK]


def test_encode_unk_is_atomic_and_ids_reuse(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab xy"), (2, "ab ç")],  # ç never seen in training
        "doc_id bigint, text string",
    )
    model = train_wordpiece(
        docs.where(F.col("doc_id") == 1), vocab_size=16, max_words=100,
        min_frequency=1,
    )
    enc = wordpiece_encode(docs, model, "doc_id")
    got = {r["doc"]: r["pieces"] for r in enc.collect()}
    assert got[2][-1] == UNK and len([p for p in got[2] if p == UNK]) == 1
    # id mapping reuses the shared map-lookup (unigram_encode_ids) with
    # unk_id=0 == the [UNK] vocab id, so n_unk counts UNK pieces
    out = {
        r["doc"]: (r["ids"], r["n_unk"])
        for r in unigram_encode_ids(enc, wordpiece_vocab(model), unk_id=0).collect()
    }
    assert out[1][1] == 0 and all(i > 0 for i in out[1][0])
    assert out[2][1] == 1 and 0 in out[2][0]


def test_reconstruction_invariant_on_real_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # train on HALF the corpus so encode exercises the OOV greedy UDF
    model = train_wordpiece(
        docs.where(F.col("doc_id") % 2 == 0), vocab_size=128, max_words=5000
    )
    enc = wordpiece_encode(docs, model, "doc_id")
    joined = enc.join(docs.select(F.col("doc_id").alias("doc"), "text"), "doc")
    # expected word stream: tokens() semantics (explicit ws class, empties
    # filtered); non-UNK pieces strip ## and concat back to each word
    words = F.filter(
        F.split(F.lower(F.coalesce("text", F.lit(""))), "[ \\t\\n\\x0B\\f\\r]+"),
        lambda w: w != "",
    )
    # alphabet covers the training half only — replace every word
    # containing an untrained char by the UNK literal, like encode does
    # a word STARTS at every non-## piece; continuations glue on with
    # the ## stripped — so the piece stream rebuilds the word stream
    rebuilt = F.ltrim(
        F.array_join(
            F.transform(
                F.col("pieces"),
                lambda p: F.when(
                    p.startswith("##"), F.substring(p, 3, 1 << 20)
                ).otherwise(F.concat(F.lit(" "), p)),
            ),
            "",
        )
    )
    expect_tokens = F.array_join(words, " ")
    both = joined.select("doc", rebuilt.alias("got"), expect_tokens.alias("want"))
    # rows where got != want must differ ONLY by [UNK] substitutions
    bad = both.where(
        (F.col("got") != F.col("want"))
        & ~F.col("got").contains(UNK)
    )
    assert bad.count() == 0
    assert enc.count() == docs.count()
    # and the OOV path really ran (held-out words exist)
    assert both.where(F.col("got") != F.col("want")).count() < both.count()


def test_model_save_load_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame([(1, "ab ab xy")], "doc_id bigint, text string")
    model = train_wordpiece(docs, vocab_size=16, max_words=100, min_frequency=1)
    p = str(tmp_path / "wp")
    model.save(p)
    back = WordPieceModel.load(spark, p)
    assert back.vocab == model.vocab
    assert back.min_frequency == model.min_frequency
    assert sorted(r["word"] for r in back.seg.collect()) == sorted(
        r["word"] for r in model.seg.collect()
    )


def test_encode_plan_broadcasts_segmentation(spark):
    import re

    from test_plans import fmt

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = train_wordpiece(docs, vocab_size=64, max_words=2000)
    p = fmt(wordpiece_encode(docs, model, "doc_id"))
    assert "BroadcastExchange" in p
    # Python only on the OOV branch — one ArrowEvalPython in the plan
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", p)) == 1
