"""BPE subword tokenizer (bpe.py): merge learning on the bounded
word-count table, broadcast-join + OOV-UDF encoding, reconstruction
invariants, persistence. Training is iterative (not SQL-expressible), so
parity is pinned here — the paper's worked example and cross-path
equivalence — instead of a DuckDB oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xmlschemavalidator_spark.bpe import (
    EOW,
    BPEModel,
    _learn_merges,
    apply_merges,
    bpe_encode,
    train_bpe,
)

SF = "/root/testdata/sf0.001"


def test_learn_merges_sennrich_worked_example():
    # Sennrich et al. 2016 §3.2 corpus: the classic first merges
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    m = _learn_merges(wc, 5, 1)
    assert m[:2] == [("e", "s"), ("es", "t")]
    assert m[2] == ("est", EOW)
    assert m[3:5] == [("l", "o"), ("lo", "w")]
    assert apply_merges("newest", m[:5]) == ["n", "e", "w", "est" + EOW]
    # a word unseen in training still segments with the learned units
    assert apply_merges("lowest", m[:5]) == ["low", "est" + EOW]


def test_apply_merges_greedy_run_semantics():
    # overlapping pair runs merge left-to-right: eeee -> (ee)(ee)
    m = [("e", "e")]
    assert apply_merges("eeee", m) == ["ee", "ee", EOW]
    assert apply_merges("eee", m) == ["ee", "e", EOW]


def test_bpe_encode_reconstructs_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(30)
    model = train_bpe(docs, n_merges=60, max_words=5000)
    rows = bpe_encode(docs, model, "doc_id").collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(rows) == 30
    for r in rows:
        joined = "".join(r["pieces"]).replace(EOW, " ").strip()
        orig = " ".join((texts[r["doc"]] or "").lower().split())
        assert joined == orig, r["doc"]
        assert r["n_pieces"] == len(r["pieces"])


def test_bpe_oov_path_matches_reference(spark):
    # train on the real corpus, encode docs salted with invented words
    # (the synthetic corpus vocabulary is tiny — every real word is in the
    # seg table) — the invented ones MUST go through the pandas-UDF path
    # and match apply_merges exactly
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    model = train_bpe(docs, n_merges=40, max_words=5000)
    seg_words = {r["word"] for r in model.seg.collect()}
    target = docs.limit(8).select(
        "doc_id",
        F.concat(
            F.coalesce("text", F.lit("")), F.lit(" zzqxv glorbnakket unseenword")
        ).alias("text"),
    )
    rows = {r["doc"]: r["pieces"] for r in bpe_encode(target, model, "doc_id").collect()}
    texts = {r["doc_id"]: r["text"] for r in target.collect()}
    saw_oov = False
    for doc, pieces in rows.items():
        expect = []
        for w in (texts[doc] or "").lower().split():
            saw_oov = saw_oov or w not in seg_words
            expect.extend(apply_merges(w, model.merges))
        assert pieces == expect, doc
    assert saw_oov  # the test must actually exercise the UDF path


def test_train_bpe_deterministic_across_partitionings(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = train_bpe(docs, n_merges=30, max_words=1000)
    b = train_bpe(docs.repartition(13), n_merges=30, max_words=1000)
    assert a.merges == b.merges


def test_bpe_model_save_load_roundtrip(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    model = train_bpe(docs, n_merges=20, max_words=200)
    path = str(tmp_path / "bpe")
    model.save(path)
    loaded = BPEModel.load(spark, path)
    assert loaded.merges == model.merges
    assert loaded.max_words == model.max_words
    a = sorted((r["word"], tuple(r["pieces"])) for r in model.seg.collect())
    b = sorted((r["word"], tuple(r["pieces"])) for r in loaded.seg.collect())
    assert a == b


def test_train_bpe_rejects_unbounded_collect(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError):
        train_bpe(docs, max_words=(1 << 21) + 1)


def test_bpe_encode_empty_and_null_text(spark):
    docs = spark.createDataFrame(
        [(1, "plain words"), (2, ""), (3, None)], "doc_id bigint, text string"
    )
    model = train_bpe(docs, n_merges=5, max_words=100, min_frequency=1)
    got = {r["doc"]: r for r in bpe_encode(docs, model, "doc_id").collect()}
    assert set(got) == {1, 2, 3}
    assert got[2]["n_pieces"] == 0 and got[3]["n_pieces"] == 0
    assert got[1]["n_pieces"] > 0


def test_learn_merges_incremental_matches_naive_rebuild():
    """The incremental trainer (pair counts updated only for touched
    words) must produce exactly the merge sequence of a naive
    rebuild-every-iteration reference."""
    import random

    from xmlschemavalidator_spark.bpe import _merge_pair

    def naive(word_counts, n_merges, min_frequency):
        segs = [(list(w) + [EOW], c) for w, c in word_counts]
        merges = []
        for _ in range(n_merges):
            pc = {}
            for syms, c in segs:
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    pc[p] = pc.get(p, 0) + c
            if not pc:
                break
            (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if cnt < min_frequency:
                break
            merges.append((a, b))
            segs = [(_merge_pair(s, a, b), c) for s, c in segs]
        return merges

    rng = random.Random(7)
    for trial in range(5):
        wc = [
            (
                "".join(rng.choice("abce") for _ in range(rng.randint(1, 7))),
                rng.randint(1, 9),
            )
            for _ in range(40)
        ]
        # dedupe words (counts table semantics)
        seen = {}
        for w, c in wc:
            seen[w] = seen.get(w, 0) + c
        wc = sorted(seen.items())
        got = _learn_merges(wc, 25, 1)
        want = naive(wc, 25, 1)
        assert got == want, (trial, got, want)


def test_bpe_vocab_and_encode_ids_roundtrip(spark):
    from xmlschemavalidator_spark.bpe import bpe_encode, bpe_encode_ids, bpe_vocab

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(15)
    model = train_bpe(docs, n_merges=40, max_words=2000)
    vocab = {r["piece"]: r["piece_id"] for r in bpe_vocab(model).collect()}
    # ids are dense 0..V-1 over sorted pieces, and include eow + chars
    assert sorted(vocab.values()) == list(range(len(vocab)))
    assert EOW in vocab
    pieces = {r["doc"]: r["pieces"] for r in bpe_encode(docs, model, "doc_id").collect()}
    ids = {r["doc"]: r for r in bpe_encode_ids(docs, model, "doc_id").collect()}
    assert set(ids) == set(pieces)
    for doc, row in ids.items():
        assert row["ids"] == [vocab[p] for p in pieces[doc]], doc
        assert row["n_pieces"] == len(pieces[doc])


def test_bpe_encode_ids_empty_doc_preserved(spark):
    from xmlschemavalidator_spark.bpe import bpe_encode_ids

    docs = spark.createDataFrame(
        [(1, "some regular words"), (2, None)], "doc_id bigint, text string"
    )
    model = train_bpe(docs, n_merges=5, max_words=50, min_frequency=1)
    got = {r["doc"]: r for r in bpe_encode_ids(docs, model, "doc_id").collect()}
    assert set(got) == {1, 2}
    assert got[2]["n_pieces"] == 0 and got[2]["ids"] == []


def test_bpe_vocab_covers_intermediate_merge_pieces(spark):
    """An OOV word can emit a merge-intermediate piece that survives in no
    trained word's FINAL segmentation (train 'abc' -> merges absorb 'ab'
    into 'abc'); the vocab must still carry it (review finding: it mapped
    to oov_id, collapsing distinct subwords)."""
    from xmlschemavalidator_spark.bpe import (
        apply_merges,
        bpe_encode_ids,
        bpe_vocab,
        train_bpe,
    )

    docs = spark.createDataFrame(
        [(i, "abc abc abc") for i in range(3)], "doc_id bigint, text string"
    )
    model = train_bpe(docs, n_merges=10, max_words=10, min_frequency=1)
    oov_pieces = apply_merges("abd", model.merges)
    assert "ab" in oov_pieces  # the trace actually happens
    vocab = {r["piece"]: r["piece_id"] for r in bpe_vocab(model).collect()}
    assert "ab" in vocab
    probe = spark.createDataFrame([(99, "abd")], "doc_id bigint, text string")
    row = bpe_encode_ids(probe, model, "doc_id").collect()[0]
    # 'ab' resolves to a REAL id; only the genuinely unseen character 'd'
    # takes oov_id (-1), exactly the documented contract
    assert row["ids"] == [vocab.get(p, -1) for p in oov_pieces]
    assert row["ids"][oov_pieces.index("ab")] == vocab["ab"] != -1
    assert row["ids"][oov_pieces.index("d")] == -1


def test_byte_fallback_encode_ids_unk_free_on_exotic_codepoints(spark):
    """byte_fallback=True: ids are UNK-free BY CONSTRUCTION — planted
    codepoints absent from every trained word (CJK, emoji, umlauts)
    decompose to their raw UTF-8 bytes in the reserved 0..255 id space."""
    from xmlschemavalidator_spark.bpe import bpe_encode_ids, bpe_vocab, train_bpe

    train = spark.createDataFrame(
        [(i, "low lower lowest newer newest wide width " * 2) for i in range(6)],
        "doc_id bigint, text string",
    )
    model = train_bpe(train, n_merges=20, min_frequency=1, byte_fallback=True)
    exotic = spark.createDataFrame(
        [
            (1, "low newer 漢字 🙂 straße"),
            (2, "übung"),
            (3, ""),
            (4, None),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc"]: r["ids"] for r in bpe_encode_ids(exotic, model, "doc_id").collect()}
    assert all(all(i >= 0 for i in ids) for ids in out.values())
    assert out[3] == [] and out[4] == []
    # the exotic bytes land in the reserved byte space
    assert any(i < 256 for i in out[1]) and any(i < 256 for i in out[2])
    # byte decomposition is the UTF-8 spelling: '漢' = e6 bc a2
    assert [0xE6, 0xBC, 0xA2] == [i for i in out[1] if i < 256][: 3]
    # known words still resolve through the learned (256+) space
    assert any(i >= 256 for i in out[1])


def test_byte_fallback_vocab_id_spaces_and_roundtrip(spark, tmp_path):
    from xmlschemavalidator_spark.bpe import BPEModel, bpe_vocab, train_bpe

    train = spark.createDataFrame(
        [(1, "abc abd abcd " * 3)], "doc_id bigint, text string"
    )
    model = train_bpe(train, n_merges=5, min_frequency=1, byte_fallback=True)
    v = bpe_vocab(model)
    byte_rows = v.where(F.col("piece_id") < 256).count()
    assert byte_rows == 256
    learned = v.where(F.col("piece_id") >= 256)
    assert learned.count() > 0
    # ids dense and deterministic within each space
    ids = sorted(r["piece_id"] for r in learned.collect())
    assert ids == list(range(256, 256 + len(ids)))
    path = str(tmp_path / "bpe_bf")
    model.save(path)
    loaded = BPEModel.load(spark, path)
    assert loaded.byte_fallback is True
