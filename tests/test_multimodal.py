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


# ---------------------------------------------------------------- image dHash

def _bmp_row(mid, gray):
    import numpy as np

    from xmlschemavalidator_spark.multimodal import encode_bmp

    g = np.asarray(gray, dtype=np.uint8)
    h, w = g.shape
    return (mid, "image", bytearray(encode_bmp(g)),
            {"width": int(w), "height": int(h), "n_frames": 1})


def test_dhash_hand_computed_and_invariances():
    import numpy as np

    from xmlschemavalidator_spark.multimodal import (
        decode_bmp,
        dhash_py,
        encode_bmp,
    )

    g = np.array([[10, 20, 5], [7, 7, 9]], dtype=np.uint8)
    # 1x1 blocks: bits are the adjacent comparisons 10>20(no), 20>5(yes);
    # 7>7(no), 7>9(no) -> 0b10
    assert dhash_py(g, hash_w=2, hash_h=2) == 0b10
    # brightness offset and integer upscale change NO bits
    assert dhash_py((g + 50).astype(np.uint8), 2, 2) == 0b10
    assert dhash_py(np.kron(g, np.ones((4, 4), dtype=np.uint8)), 2, 2) == 0b10
    # BMP roundtrip preserves the hash
    _w, _h, back = decode_bmp(encode_bmp(g))
    assert dhash_py(back, 2, 2) == 0b10
    # the sign fold: a hash with bit 63 set stores as a NEGATIVE int64
    hi = np.zeros((8, 9), dtype=np.uint8)
    hi[7, 7] = 255  # px[7,7] > px[7,8] -> bit 63
    s = dhash_py(hi, 8, 8)
    assert s < 0 and (s + (1 << 64)) >> 63 == 1


def test_image_dhash_udf_matches_python_and_surfaces_errors(spark):
    import numpy as np

    from xmlschemavalidator_spark.multimodal import (
        MEDIA_SCHEMA,
        dhash_py,
        image_dhash,
    )

    g1 = (np.add.outer(np.arange(12), np.arange(16)) % 256).astype(np.uint8)
    g2 = ((np.add.outer(np.arange(12), np.arange(16)) * 7) % 256).astype(np.uint8)
    rows = [_bmp_row(1, g1), _bmp_row(2, g2),
            (3, "image", bytearray(b"not a bmp at all, truncated"), None),
            (4, "audio", bytearray(b"\x00" * 64), None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["doc"]: (r["sig"], r["decode_error"])
           for r in image_dhash(df).collect()}
    assert set(got) == {1, 2, 3}  # audio filtered BEFORE the UDF
    assert got[1] == (dhash_py(g1), None)
    assert got[2] == (dhash_py(g2), None)
    assert got[3][0] is None and "BMP" in got[3][1]


def test_image_near_dups_pairs_perceptual_duplicates(spark):
    import numpy as np

    from xmlschemavalidator_spark.multimodal import (
        MEDIA_SCHEMA,
        image_near_dups,
    )

    base = (np.add.outer(np.arange(32), np.arange(32)) % 256).astype(np.uint8)
    bright = ((base.astype(int) + 40) % 256).astype(np.uint8)  # offset copy
    noisy = base.copy()
    noisy[5, 5] = 255  # one hot pixel: a handful of bits at most
    far = ((np.add.outer(np.arange(32), np.arange(32)) * 31) % 256).astype(
        np.uint8
    )
    df = spark.createDataFrame(
        [_bmp_row(1, base), _bmp_row(2, bright), _bmp_row(3, noisy),
         _bmp_row(4, far),
         (5, "image", bytearray(b"junk"), None)],  # undecodable: excluded
        MEDIA_SCHEMA,
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_near_dups(df, hamming_max=4).collect()}
    # wrap pixels (255->(255+40)%256) flip a few comparisons, so the
    # brightness copy pairs at small-but-nonzero hamming; the hot-pixel
    # copy pairs near 0; the far texture pairs with nothing
    assert (1, 3) in pairs and pairs[(1, 3)] <= 2
    assert (1, 2) in pairs and pairs[(1, 2)] <= 4
    assert not any(4 in p or 5 in p for p in pairs)


def test_ahash_phash_invariance_and_panel(spark):
    import numpy as np

    from xmlschemavalidator_spark.multimodal import (
        ahash_py,
        dhash_py,
        phash_py,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 200, size=(64, 48), dtype=np.uint8).astype(float)

    # brightness OFFSET leaves both aHash and dHash bit-identical
    assert ahash_py(img) == ahash_py(img + 30)
    assert dhash_py(img.astype(np.uint8)) == dhash_py((img + 30).astype(float))

    # uniform 2x resize (block replication): aHash exact on this fixed
    # seed; pHash robust — uneven 48->32 block boundaries shift the
    # box means slightly, flipping at most a few near-median bits
    big = np.kron(img, np.ones((2, 2)))
    assert ahash_py(big) == ahash_py(img)
    ham = bin((phash_py(big) ^ phash_py(img)) & ((1 << 64) - 1)).count("1")
    assert ham <= 6

    # different images get different hashes
    other = rng.integers(0, 200, size=(64, 48)).astype(float)
    assert ahash_py(other) != ahash_py(img)
    assert phash_py(other) != phash_py(img)


def test_image_hash_panel_one_pass(spark):
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.multimodal import (
        ahash_py,
        decode_bmp,
        image_hash_panel,
        real_media,
    )

    media = real_media(spark, 60)
    panel = image_hash_panel(media)
    rows = panel.where(F.col("decode_error").isNull()).collect()
    assert len(rows) > 0
    assert all(
        r["dhash"] is not None and r["ahash"] is not None and r["phash"] is not None
        for r in rows
    )
    # replay one row through the shared python implementations
    blob = media.where(F.col("kind") == "image").select(
        "media_id", "content"
    ).collect()[0]
    _w, _h, gray = decode_bmp(bytes(blob["content"]))
    byid = {r["doc"]: r for r in rows}
    assert byid[blob["media_id"]]["ahash"] == ahash_py(gray)
