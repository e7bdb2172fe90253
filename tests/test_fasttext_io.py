"""fastText .bin import/export (fasttext_io.py): binary roundtrip of
the supervised subset, the exact FNV-1a / chained-ngram hash recipe,
Spark-vs-pure-Python prediction parity, quantized/unsupported rejection,
and the NB-weight export bridge."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from xmlschemavalidator_spark.fasttext_io import (
    FastTextModel,
    ft_hash,
    predict_lang_fasttext,
    read_fasttext_model,
    write_fasttext_model,
)


def _toy_model(rng, nwords=6, bucket=32, dim=4, nlabels=3, minn=0, maxn=0, wordNgrams=2):
    words = ["</s>", "the", "cat", "sat", "chat", "le"][:nwords]
    labels = [f"__label__l{i}" for i in range(nlabels)]
    inp = rng.standard_normal((nwords + bucket, dim))
    out = rng.standard_normal((nlabels, dim))
    return words, labels, inp, out, bucket, minn, maxn, wordNgrams


def test_ft_hash_is_fnv1a32():
    # FNV-1a reference values (public constants)
    assert ft_hash("") == 2_166_136_261
    h = 2_166_136_261
    for b in b"a":
        h = (h ^ b) * 16_777_619 & 0xFFFFFFFF
    assert ft_hash("a") == h


def test_bin_roundtrip_bitexact(tmp_path):
    rng = np.random.default_rng(0)
    words, labels, inp, out, bucket, minn, maxn, wn = _toy_model(rng, minn=2, maxn=4)
    p = str(tmp_path / "model.bin")
    write_fasttext_model(p, words, labels, inp, out, bucket, minn, maxn, wn)
    m = read_fasttext_model(p)
    assert m.words == words and m.labels == labels
    assert m.bucket == bucket and (m.minn, m.maxn) == (minn, maxn)
    assert m.wordNgrams == wn and m.dim == 4
    # float32 storage: compare at float32 resolution
    assert np.array_equal(m.input_mat, inp.astype("<f4").astype(np.float64))
    assert np.array_equal(m.output_mat, out.astype("<f4").astype(np.float64))


def test_reader_rejects_quantized_and_foreign(tmp_path):
    rng = np.random.default_rng(1)
    words, labels, inp, out, bucket, *_ = _toy_model(rng)
    p = str(tmp_path / "model.bin")
    write_fasttext_model(p, words, labels, inp, out, bucket)
    blob = bytearray(open(p, "rb").read())
    # flip the quant flag byte of the input matrix
    # locate it: header(8) + args(12*4+8) + dict header(3*4+2*8) + entries
    pos = 8 + 56 + 28
    for w in words + labels:
        pos += len(w.encode()) + 1 + 9
    assert blob[pos] == 0
    blob[pos] = 1
    bad = str(tmp_path / "quant.bin")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="quantized"):
        read_fasttext_model(bad)
    open(bad, "wb").write(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        read_fasttext_model(bad)


def test_predict_matches_hand_computation():
    rng = np.random.default_rng(2)
    words, labels, inp, out, bucket, *_ = _toy_model(rng, minn=0, maxn=0, wordNgrams=1)
    m = FastTextModel(words, labels, inp, out, 4, bucket, 0, 0, 1, 3)
    # "the cat" -> ids [1, 2] + EOS id 0; unigrams only
    hidden = inp[[1, 2, 0]].mean(axis=0)
    scores = out @ hidden
    lab, sc = m.predict_py("The  Cat")
    assert lab == labels[int(np.argmax(scores))]
    assert sc == pytest.approx(float(scores.max()))


def test_word_ngrams_and_subwords_change_features():
    rng = np.random.default_rng(3)
    words, labels, inp, out, bucket, *_ = _toy_model(rng)
    uni = FastTextModel(words, labels, inp, out, 4, bucket, 0, 0, 1, 3)
    bi = FastTextModel(words, labels, inp, out, 4, bucket, 0, 0, 2, 3)
    sub = FastTextModel(words, labels, inp, out, 4, bucket, 2, 3, 1, 3)
    assert uni.tokens_to_ids(["the", "cat"]) == [1, 2]
    ids_bi = bi.tokens_to_ids(["the", "cat"])
    assert ids_bi[:2] == [1, 2] and len(ids_bi) == 3 and ids_bi[2] >= len(words)
    ids_sub = sub.tokens_to_ids(["the"])
    # word id + its <the> char 2-3 grams, all bucketized
    assert ids_sub[0] == 1 and all(i >= len(words) for i in ids_sub[1:])
    assert len(ids_sub) > 3
    # OOV word still contributes subwords (fastText addSubwords on wid<0)
    assert all(i >= len(words) for i in sub.tokens_to_ids(["zzz"]))


def test_spark_prediction_parity_and_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(4)
    words, labels, inp, out, bucket, *_ = _toy_model(rng, minn=1, maxn=3, wordNgrams=2)
    p = str(tmp_path / "model.bin")
    write_fasttext_model(p, words, labels, inp, out, bucket, 1, 3, 2)
    m = read_fasttext_model(p)
    texts = ["the cat sat", "le chat", "unknown words here", "", "CAT the"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        r["doc"]: (r["lang_pred"], r["score"])
        for r in predict_lang_fasttext(df, m, "doc_id").collect()
    }
    for i, t in enumerate(texts):
        lab, sc = m.predict_py(t)
        assert got[i] == (lab.removeprefix("__label__"), round(sc, 6)), (i, t)


def test_export_nb_weights_as_fasttext(spark, tmp_path):
    """The in-engine NB weight grid transports through the fastText
    format: per-bucket class scores survive bit-level (float32) and the
    score-argmax over a doc's buckets matches the NB argmax when priors
    are flat (the disclosed prior-drop caveat)."""
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.fasttext_io import export_nb_as_fasttext
    from xmlschemavalidator_spark.lang_model import train_lang_model

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # balanced 3-lang subset → flat priors
    sub = docs.where(F.col("lang").isin("en", "de", "sv"))
    counts = sub.groupBy("lang").count().collect()
    nmin = min(r["count"] for r in counts)
    sub = (
        sub.withColumn(
            "_rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("lang").orderBy("doc_id")
            ),
        ).where(F.col("_rn") <= nmin).drop("_rn")
    )
    nb = train_lang_model(sub, "doc_id", n_buckets=128)
    p = str(tmp_path / "nb.bin")
    export_nb_as_fasttext(nb, p)
    m = read_fasttext_model(p)
    assert m.labels == [f"__label__{lg}" for lg in nb.langs]
    assert m.bucket == 128 and len(m.words) == 0
    # weight transport: input row b, column c == w_micro/1e6 at f32
    wrow = {(r["bucket"], r["lang"]): r["w_micro"] for r in nb.weights.collect()}
    for b in (0, 7, 127):
        for ci, lg in enumerate(nb.langs):
            assert m.input_mat[b, ci] == pytest.approx(
                np.float32(wrow[(b, lg)] / 1e6), abs=0
            )
