"""Spec-implemented PNG + baseline JPEG codecs (imagecodecs.py): exact
PNG roundtrips, all five PNG scanline filters, JPEG roundtrip within
quantization error, DRI/RSTn resync, format sniffing, and the
corruption contract (truncations and byte-flips raise ValueError — the
mapInPandas decode stage turns those into per-row decode_error values,
so any other exception class would kill a 100-TB task)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from xmlschemavalidator_spark.imagecodecs import (
    decode_image,
    decode_jpeg,
    decode_png,
    encode_jpeg,
    encode_png,
    sniff_image_format,
)


def _gradient(h, w, k=1):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((xx * 5 + yy * 3) * k % 256).astype(np.uint8)


def test_png_gray_roundtrip_exact():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (5, 3), (17, 31), (64, 48)]:
        g = rng.integers(0, 256, (h, w), dtype=np.uint8)
        w_, h_, dec = decode_png(encode_png(g))
        assert (w_, h_) == (w, h)
        assert np.array_equal(dec, g)


def _build_png(w, h, nch, ctype, rows_raw, filters):
    """Forward-filtered PNG builder: stores each scanline with the given
    filter type so the decoder's un-filter path is exercised for all 5."""
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = bytearray()
    prev = np.zeros(w * nch, np.int32)
    for y in range(h):
        row = rows_raw[y].astype(np.int32)
        ft = filters[y % len(filters)]
        enc = np.zeros(w * nch, np.int32)
        for x in range(w * nch):
            a = row[x - nch] if x >= nch else 0
            b = prev[x]
            c = prev[x - nch] if x >= nch else 0
            pred = {
                0: 0,
                1: a,
                2: b,
                3: (a + b) >> 1,
            }.get(ft)
            if pred is None:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (row[x] - pred) & 0xFF
        out.append(ft)
        out.extend(enc.astype(np.uint8).tobytes())
        prev = row
    return (
        sig + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def test_png_all_five_filters_rgb_and_rgba():
    rng = np.random.default_rng(11)
    h, w = 9, 7
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    blob = _build_png(w, h, 3, 2, [rgb[y].reshape(-1) for y in range(h)], [0, 1, 2, 3, 4])
    w_, h_, dec = decode_png(blob)
    assert (w_, h_) == (w, h)
    assert np.array_equal(dec, rgb.astype(np.float64).mean(axis=2).astype(np.uint8))
    # RGBA: alpha channel is dropped from the grayscale reduction
    rgba = np.dstack([rgb, np.full((h, w), 7, np.uint8)])
    blob = _build_png(w, h, 4, 6, [rgba[y].reshape(-1) for y in range(h)], [4, 3, 2, 1, 0])
    _, _, dec4 = decode_png(blob)
    assert np.array_equal(dec4, dec)


def test_png_rejects_unsupported_variants():
    g = _gradient(8, 8)
    blob = bytearray(encode_png(g))
    # flip IHDR depth byte to 16 (offset: 8 sig + 8 len/tag + 8 w/h)
    blob[8 + 8 + 8] = 16
    body = bytes(blob[16:16 + 13])
    blob[16 + 13 : 16 + 17] = struct.pack(">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(blob))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"NOPE" + bytes(blob)[4:])


def test_jpeg_gray_roundtrip_within_quant_error():
    for h, w in [(8, 8), (19, 25), (40, 56)]:
        g = _gradient(h, w)
        w_, h_, dec = decode_jpeg(encode_jpeg(g, quality=90))
        assert (w_, h_) == (w, h)
        assert np.abs(dec.astype(int) - g.astype(int)).mean() < 8.0


def test_jpeg_color_decodes_to_bt601_luma():
    h, w = 24, 33
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    rgb[:, :, 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    rgb[:, :, 2] = 128
    w_, h_, dec = decode_jpeg(encode_jpeg(rgb, quality=92))
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    assert (w_, h_) == (w, h)
    assert np.abs(dec.astype(float) - y).mean() < 8.0


def test_jpeg_restart_intervals_resync():
    g = _gradient(33, 47, k=3)
    plain = decode_jpeg(encode_jpeg(g, quality=88))[2]
    for ri in (1, 2, 5):
        blob = encode_jpeg(g, quality=88, restart_interval=ri)
        assert b"\xff\xdd" in blob  # DRI present
        w_, h_, dec = decode_jpeg(blob)
        # restart markers change framing, not the coefficients
        assert np.array_equal(dec, plain)


def test_jpeg_rejects_progressive():
    blob = bytearray(encode_jpeg(_gradient(16, 16)))
    i = blob.index(b"\xff\xc0")
    blob[i + 1] = 0xC2  # SOF0 -> SOF2
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(blob))


def test_sniff_and_decode_image_dispatch():
    g = _gradient(10, 12)
    from xmlschemavalidator_spark.multimodal import encode_bmp

    for blob, fmt in [
        (encode_bmp(g), "bmp"),
        (encode_png(g), "png"),
        (encode_jpeg(g), "jpeg"),
    ]:
        assert sniff_image_format(blob) == fmt
        got_fmt, w, h, gray = decode_image(blob)
        assert got_fmt == fmt and (w, h) == (12, 10)
        if fmt != "jpeg":
            assert np.array_equal(gray, g)
    assert sniff_image_format(b"\x00\x01\x02\x03") is None
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image(b"GIF89a not supported")


@pytest.mark.parametrize("codec", ["png", "jpeg"])
def test_corruption_always_raises_valueerror(codec):
    """Truncations at every stride and 300 random byte-flips: anything
    that fails must fail as ValueError (the decode_error contract)."""
    g = _gradient(30, 40, k=2)
    blob = encode_png(g) if codec == "png" else encode_jpeg(g, 90)
    for cut in range(4, len(blob), max(1, len(blob) // 80)):
        try:
            (decode_png if codec == "png" else decode_jpeg)(blob[:cut])
        except ValueError:
            pass
    rng = np.random.default_rng(5)
    lo = 8 if codec == "png" else 2
    for _ in range(300):
        b = bytearray(blob)
        i = int(rng.integers(lo, len(b)))
        b[i] ^= int(rng.integers(1, 256))
        try:
            (decode_png if codec == "png" else decode_jpeg)(bytes(b))
        except ValueError:
            pass


def test_decode_real_features_reports_formats(spark):
    from pyspark.sql import functions as F

    from xmlschemavalidator_spark.multimodal import (
        decode_real_features,
        real_media,
    )

    media = real_media(spark, 90)
    out = decode_real_features(media)
    img = out.where(F.col("kind") == "image")
    fmts = {r["format"] for r in img.select("format").distinct().collect()}
    assert fmts == {"bmp", "png", "jpeg"}
    assert img.where(F.col("decode_error").isNotNull()).count() == 0
    # pixel parity across codecs: same gradient generator, so bmp and png
    # rows of the same dims decode to close mean intensities
    assert out.where(F.col("kind") == "audio").select(
        F.min(F.col("format"))
    ).collect()[0][0] == "wav"


def test_image_near_dups_on_compressed_formats(spark):
    """(base, exact-copy) pairs land at hamming 0 for BMP, PNG AND JPEG
    fixtures; perturbed copies pair within the threshold."""
    from xmlschemavalidator_spark.imagecodecs import encode_jpeg as ej
    from xmlschemavalidator_spark.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        image_near_dups,
    )

    rows = []
    for g in range(9):
        base = ((np.add.outer(np.arange(16), np.arange(24)) * (2 * g + 1)) % 256).astype(np.uint8)
        enc = (encode_bmp, encode_png, ej)[g % 3]
        rows.append((g * 10, "image", bytearray(enc(base)), None))
        rows.append((g * 10 + 1, "image", bytearray(enc(base)), None))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in image_near_dups(media, hamming_max=4).collect()}
    for g in range(9):
        assert pairs.get((g * 10, g * 10 + 1)) == 0, (g, pairs)
