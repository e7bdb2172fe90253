"""HF tokenizers-JSON export/import (tokenizer_io.py): the round-trip
contract is BIT-IDENTICAL token ids after export → reload → encode, for
all three tokenizer families — the reloaded model runs with an empty
segmentation fast path, so these tests also pin that the OOV path equals
the seg-table path piece-for-piece (they are the same function by
construction)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from xmlschemavalidator_spark.tokenizer_io import (
    load_hf_tokenizer,
    save_hf_bpe,
    save_hf_unigram,
    save_hf_wordpiece,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .where(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )


def _ids_by_doc(df):
    return {
        r["doc"]: list(r["ids"]) for r in df.select("doc", "ids").collect()
    }


def test_bpe_roundtrip_bit_identical_ids(spark, docs, tmp_path):
    from xmlschemavalidator_spark.bpe import bpe_encode_ids, train_bpe

    model = train_bpe(docs, n_merges=40, max_words=500, min_frequency=1)
    path = str(tmp_path / "bpe" / "tokenizer.json")
    save_hf_bpe(model, path)

    loaded = load_hf_tokenizer(spark, path)
    assert loaded.kind == "bpe"
    assert loaded.model.merges == model.merges
    assert loaded.model.seg.count() == 0  # every word takes the OOV path

    want = _ids_by_doc(bpe_encode_ids(docs, model, "doc_id"))
    got = _ids_by_doc(
        bpe_encode_ids(docs, loaded.model, "doc_id", vocab=loaded.vocab)
    )
    assert want == got and len(want) == 60


def test_bpe_byte_fallback_roundtrip(spark, tmp_path):
    from xmlschemavalidator_spark.bpe import bpe_encode_ids, train_bpe

    corpus = spark.createDataFrame(
        [(0, "low lower lowest"), (1, "newest widest"), (2, "low λambda 语")],
        "doc_id bigint, text string",
    )
    model = train_bpe(
        corpus, n_merges=10, max_words=100, min_frequency=1, byte_fallback=True
    )
    path = str(tmp_path / "tokenizer.json")
    save_hf_bpe(model, path)
    doc = json.load(open(path, encoding="utf-8"))
    assert doc["model"]["byte_fallback"] is True
    # reserved byte alphabet exported with its arithmetic ids
    assert doc["model"]["vocab"]["<0x41>"] == 0x41

    loaded = load_hf_tokenizer(spark, path)
    assert loaded.model.byte_fallback is True
    want = _ids_by_doc(bpe_encode_ids(corpus, model, "doc_id"))
    got = _ids_by_doc(
        bpe_encode_ids(corpus, loaded.model, "doc_id", vocab=loaded.vocab)
    )
    assert want == got
    # the exotic codepoints really exercised the byte fallback: UNK-free
    assert all(i >= 0 for ids in got.values() for i in ids)


def test_wordpiece_roundtrip_bit_identical_ids(spark, docs, tmp_path):
    from xmlschemavalidator_spark.unigram import unigram_encode_ids
    from xmlschemavalidator_spark.wordpiece import (
        train_wordpiece,
        wordpiece_encode,
        wordpiece_vocab,
    )

    model = train_wordpiece(docs, vocab_size=80, max_words=500, min_frequency=1)
    path = str(tmp_path / "tokenizer.json")
    save_hf_wordpiece(model, path)
    doc = json.load(open(path, encoding="utf-8"))
    assert doc["model"]["type"] == "WordPiece"
    assert doc["model"]["unk_token"] == "[UNK]"
    assert doc["model"]["continuing_subword_prefix"] == "##"

    loaded = load_hf_tokenizer(spark, path)
    assert loaded.kind == "wordpiece"
    assert loaded.model.vocab == model.vocab

    want = _ids_by_doc(
        unigram_encode_ids(
            wordpiece_encode(docs, model, "doc_id"), wordpiece_vocab(model)
        )
    )
    got = _ids_by_doc(
        unigram_encode_ids(
            wordpiece_encode(docs, loaded.model, "doc_id"), loaded.vocab
        )
    )
    assert want == got and len(want) == 60


def test_unigram_roundtrip_bit_identical_ids(spark, docs, tmp_path):
    from xmlschemavalidator_spark.unigram import (
        train_unigram,
        unigram_encode,
        unigram_encode_ids,
        unigram_vocab,
    )

    model = train_unigram(docs, vocab_size=120, max_words=500, max_piece_len=6)
    path = str(tmp_path / "tokenizer.json")
    save_hf_unigram(model, path)
    doc = json.load(open(path, encoding="utf-8"))
    assert doc["model"]["type"] == "Unigram"
    # list order carries the ids; floats round-trip exactly via repr
    assert doc["model"]["vocab"] == [
        [p, lp]
        for p, lp in sorted(model.logp.items(), key=lambda kv: (-kv[1], kv[0]))
    ]

    loaded = load_hf_tokenizer(spark, path)
    assert loaded.kind == "unigram"
    assert loaded.model.logp == model.logp
    # derived search bound never exceeds the trained one
    assert loaded.model.max_piece_len <= model.max_piece_len

    base_vocab = unigram_vocab(model).select("piece", "id")
    want = _ids_by_doc(
        unigram_encode_ids(unigram_encode(docs, model, "doc_id"), base_vocab)
    )
    got = _ids_by_doc(
        unigram_encode_ids(
            unigram_encode(docs, loaded.model, "doc_id"), loaded.vocab
        )
    )
    assert want == got and len(want) == 60


def test_bpe_merges_serialize_space_joined_training_order(spark, tmp_path):
    from xmlschemavalidator_spark.bpe import train_bpe

    corpus = spark.createDataFrame(
        [(0, "low low lower newest newest newest widest")],
        "doc_id bigint, text string",
    )
    model = train_bpe(corpus, n_merges=5, max_words=100, min_frequency=1)
    path = str(tmp_path / "tokenizer.json")
    save_hf_bpe(model, path)
    doc = json.load(open(path, encoding="utf-8"))
    assert doc["model"]["merges"] == [f"{a} {b}" for a, b in model.merges]
    # loader accepts both serde forms
    doc["model"]["merges"] = [m.split(" ", 1) for m in doc["model"]["merges"]]
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f)
    loaded = load_hf_tokenizer(spark, path)
    assert loaded.model.merges == model.merges
