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
