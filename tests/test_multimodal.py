"""Multimodal plumbing tests: schema, mapInPandas batching, decode stub,
frame sampling, resize stub contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xmlschemavalidator_spark.multimodal import (
    decode_features,
    fake_media,
    frame_sample,
    resize_stub,
)


def test_fake_media_schema_and_determinism(spark):
    df = fake_media(spark, 20)
    assert df.columns == ["media_id", "kind", "content", "meta"]
    a = sorted((r["media_id"], bytes(r["content"])) for r in df.collect())
    b = sorted((r["media_id"], bytes(r["content"])) for r in fake_media(spark, 20).collect())
    assert a == b


def test_decode_features_consistent_with_meta(spark):
    df = fake_media(spark, 30)
    out = decode_features(df).join(df.select("media_id", "meta"), "media_id")
    for r in out.collect():
        assert r["width"] == r["meta"]["width"]
        assert r["height"] == r["meta"]["height"]
        assert r["n_frames"] == r["meta"]["n_frames"]
        assert len(r["features"]) == 8
        assert abs(sum(r["features"]) - 1.0) < 1e-5
        assert 0.0 <= r["mean_intensity"] <= 255.0


def test_frame_sample_counts(spark):
    df = fake_media(spark, 40)
    frames = frame_sample(df, every_k=2)
    meta = {r["media_id"]: r["meta"] for r in df.where(F.col("kind") == "video").collect()}
    got = frames.groupBy("media_id").count().collect()
    assert len(got) == len(meta) > 0
    for r in got:
        nf = meta[r["media_id"]]["n_frames"]
        assert r["count"] == (nf + 1) // 2
    one = frames.limit(1).collect()[0]
    m = meta[one["media_id"]]
    assert len(bytes(one["frame"])) == m["width"] * m["height"]


def test_resize_stub_raises_cleanly(spark):
    df = fake_media(spark, 3)
    with pytest.raises(Exception, match="NotImplementedError|resize requires a codec"):
        resize_stub(df, 8, 8).collect()


# --- REAL formats (round 2): BMP / WAV, pure-spec codecs -------------------


def test_bmp_roundtrip_pure_python():
    import numpy as np

    from xmlschemavalidator_spark.multimodal import decode_bmp, encode_bmp

    gray = (np.arange(7 * 5, dtype=np.uint8) * 3 % 256).reshape(7, 5)
    blob = encode_bmp(gray)
    assert blob[:2] == b"BM"
    w, h, back = decode_bmp(blob)
    assert (w, h) == (5, 7)
    assert (back == gray).all()  # lossless: 24-bit with B=G=R


def test_bmp_rejects_garbage():
    import pytest

    from xmlschemavalidator_spark.multimodal import decode_bmp

    with pytest.raises(ValueError):
        decode_bmp(b"PNG not a bmp at all, definitely not 54 bytes of hdr!!")
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 10)


def test_wav_roundtrip_pure_python():
    import numpy as np

    from xmlschemavalidator_spark.multimodal import decode_wav, encode_wav

    samples = (np.sin(np.arange(800) / 10) * 20000).astype(np.int16)
    rate, back = decode_wav(encode_wav(samples, 22050))
    assert rate == 22050
    assert (back == samples).all()


def test_real_media_decode_features_end_to_end(spark):
    import numpy as np

    from xmlschemavalidator_spark.multimodal import (
        decode_real_features,
        real_media,
    )

    media = real_media(spark, 60)
    out = decode_real_features(media).collect()
    assert len(out) == 60
    by_kind = {}
    for r in out:
        by_kind.setdefault(r["kind"], []).append(r)
        assert r["decode_error"] is None, r
        assert abs(sum(r["features"]) - 1.0) < 1e-5  # histogram normalized
    assert set(by_kind) == {"image", "audio", "video"}
    for r in by_kind["audio"]:
        assert r["sample_rate"] == 16000 and r["height"] == 1
    for r in by_kind["image"]:
        assert r["width"] >= 4 and r["height"] >= 4


def test_decode_real_features_bad_blob_is_row_error_not_task_failure(spark):
    from xmlschemavalidator_spark.multimodal import decode_real_features

    df = spark.createDataFrame(
        [(1, "image", bytearray(b"not a bmp"), None)],
        "media_id long, kind string, content binary, "
        "meta struct<width:int,height:int,n_frames:int>",
    )
    rows = decode_real_features(df).collect()
    assert len(rows) == 1
    assert rows[0]["decode_error"] is not None
    assert "BMP" in rows[0]["decode_error"] or "truncated" in rows[0]["decode_error"]


def test_resize_images_real_resample(spark):
    from xmlschemavalidator_spark.multimodal import (
        decode_real_features,
        real_media,
        resize_images,
    )

    media = real_media(spark, 30)
    resized = resize_images(media, 8, 6)
    out = decode_real_features(resized).collect()
    for r in out:
        assert r["decode_error"] is None
        if r["kind"] == "image":
            assert (r["width"], r["height"]) == (8, 6)
