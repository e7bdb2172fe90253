"""Unigram-LM tokenizer (unigram.py): trainer semantics, Viterbi
determinism, totality, the reconstruction invariant, id mapping, and
the encode plan shape. Cross-engine exactness (training included) is
pinned by the unigram_encode_replay / unigram_vocab_planted oracles in
the driver gate; these tests pin the Python-side semantics."""
from __future__ import annotations

from pyspark.sql import functions as F

from xmlschemavalidator_spark.unigram import (
    WB,
    _viterbi,
    train_unigram,
    train_unigram_from_counts,
    unigram_encode,
    unigram_encode_ids,
    unigram_vocab,
)

_WC = [
    ("ab", 134), ("abab", 133), ("ababab", 133),
    ("cd", 200), ("cdcd", 200), ("xyz", 400),
]


def test_trainer_learns_frequent_pieces_and_is_deterministic():
    logp = train_unigram_from_counts(_WC, vocab_size=12, max_piece_len=6)
    assert len(logp) <= 12
    # high-mass whole-word pieces survive pruning
    assert WB + "xyz" in logp and WB + "cd" in logp
    # every single character of the training data survives (totality)
    for ch in "abcdxyz" + WB:
        assert ch in logp
    # bit-identical retrain — the oracle-replay contract
    assert logp == train_unigram_from_counts(_WC, vocab_size=12, max_piece_len=6)


def test_viterbi_prefers_longest_piece_on_exact_tie():
    logp = {"a": -1.0, "b": -1.0, "ab": -2.0, WB: -1.0}
    # ['ab'] and ['a','b'] score exactly -2.0: longest-first scan +
    # strictly-greater keeps the single long piece
    assert _viterbi("ab", logp, 4) == ["ab"]


def test_viterbi_total_on_unseen_chars():
    logp = train_unigram_from_counts(_WC, vocab_size=12, max_piece_len=6)
    segs = _viterbi(WB + "abq!", logp, 6)
    assert "".join(segs) == WB + "abq!"  # never fails, never drops chars


def test_reconstruction_invariant_on_real_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # train on HALF the corpus so encode exercises the OOV Viterbi UDF
    model = train_unigram(
        docs.where(F.col("doc_id") % 2 == 0), vocab_size=128, max_words=5000
    )
    enc = unigram_encode(docs, model, "doc_id")
    joined = enc.join(docs.select(F.col("doc_id").alias("doc"), "text"), "doc")
    # expected = the exact word stream tokens() produces (split on the
    # explicit ws class, empties filtered — so NULL / whitespace-only /
    # ws-edged text reconstructs to '' on both sides, not a bare WB)
    words = F.filter(
        F.split(F.lower(F.coalesce("text", F.lit(""))), "[ \\t\\n\\x0B\\f\\r]+"),
        lambda w: w != "",
    )
    expect = F.array_join(
        F.transform(words, lambda w: F.concat(F.lit(WB), w)), ""
    )
    bad = joined.where(F.array_join("pieces", "") != expect)
    # pieces concat back to the WB-joined normalized text, byte-exact
    assert bad.count() == 0
    assert enc.count() == docs.count()


def test_encode_ids_unk_accounting(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab"), (2, "ab ç")],  # ç never seen in training
        "doc_id bigint, text string",
    )
    model = train_unigram(
        docs.where(F.col("doc_id") == 1), vocab_size=16, max_words=100
    )
    enc = unigram_encode(docs, model, "doc_id")
    out = {
        r["doc"]: (r["ids"], r["n_unk"])
        for r in unigram_encode_ids(enc, unigram_vocab(model)).collect()
    }
    assert out[1][1] == 0  # fully in-vocab
    assert out[2][1] >= 1  # the unseen char maps to unk
    assert all(i >= 0 for i in out[1][0])
    assert -1 in out[2][0]


def test_unigram_encode_plan_broadcasts_segmentation(spark):
    import re

    from test_plans import fmt

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = train_unigram(docs, vocab_size=64, max_words=2000)
    p = fmt(unigram_encode(docs, model, "doc_id"))
    assert "BroadcastExchange" in p
    # Python only on the OOV branch — one ArrowEvalPython in the plan
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", p)) == 1
