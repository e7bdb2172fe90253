"""Real compressed-image codecs, spec-implemented (VERDICT r4 item 2):
PNG (ISO/IEC 15948 — zlib is in the stdlib) and baseline sequential JPEG
(ITU-T T.81: Huffman entropy coding + 8×8 DCT, numpy). Real crawl media
is overwhelmingly JPEG/PNG; with these, the multimodal scaffold's
decode / perceptual-hash / near-dup panel runs on genuine compressed
bytes instead of only the uncompressed BMP tier.

Scope (disclosed, validated — unsupported variants raise ValueError and
surface as per-row ``decode_error`` values, never task failures):

* PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA; alpha
  ignored for the grayscale reduction), no interlace (Adam7 rejected).
  All five scanline filters (None/Sub/Up/Average/Paeth) implemented —
  real encoders emit them freely. Encoder writes filter-0 grayscale.
* JPEG: baseline sequential DCT (SOF0), 8-bit, 1- or 3-component scans,
  arbitrary sampling factors (nearest-neighbor chroma upsample),
  restart intervals, byte stuffing. Progressive (SOF2) and arithmetic
  coding are rejected. Decoder returns the LUMA plane as grayscale
  (ITU-R BT.601 Y — the standard grayscale, not the channel mean the
  BMP path uses for its synthetic B=G=R bytes). Encoder writes
  baseline JPEG (grayscale 1×1 or YCbCr 4:4:4) with the T.81 Annex K
  example quantization + Huffman tables — legal, decodable by any
  viewer, and gives the roundtrip fixtures the tests pin.

Performance note: these are PURE-PYTHON entropy loops intended for the
per-blob work inside the Arrow-batched ``mapInPandas`` decode stage —
correct at any scale but constant-heavy; a production deployment swaps
the body of :func:`decode_image` for PIL/turbojpeg without touching any
Spark plumbing (the same swap-point contract as multimodal.resize_stub).
"""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np

# --------------------------------------------------------------------------
# PNG (ISO/IEC 15948)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(gray: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 array as an 8-bit grayscale PNG (color type
    0, filter 0 on every scanline) — readable by any viewer."""
    h, w = gray.shape

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + gray[y].astype(np.uint8).tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: np.ndarray, h: int, w: int, nch: int) -> np.ndarray:
    """Reverse the per-scanline filters (spec §9): each row starts with a
    filter-type byte. Returns (h, w, nch) uint8."""
    stride = w * nch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = int(raw[pos])
        row = raw[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ft == 0:  # None
            cur = row
        elif ft == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ft in (1, 3, 4):  # Sub / Average / Paeth need a left-scan
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0  # left
                b = prev[x]  # up
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) >> 1
                else:  # Paeth
                    c = prev[x - nch] if x >= nch else 0  # upper-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ft}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, nch)


def decode_png(content: bytes) -> tuple[int, int, np.ndarray]:
    """Decode an 8-bit PNG to (width, height, (h, w) uint8 grayscale).
    Gray = the single channel (type 0) or the RGB channel mean (types
    2/6, alpha dropped) — matching decode_bmp's grayscale reduction.
    Chunk CRCs are verified; corruption raises ValueError."""
    if content is None or len(content) < len(_PNG_SIG) + 12:
        raise ValueError("truncated PNG")
    if content[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    w = h = None
    nch = 0
    idat = bytearray()
    seen_end = False
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        tag = content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + length]
        if len(body) < length or pos + 12 + length > len(content):
            raise ValueError("PNG chunk truncated")
        (crc,) = struct.unpack_from(">I", content, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch ({tag!r})")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if interlace != 0:
                raise ValueError("interlaced PNG (Adam7) not supported")
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG compression/filter method")
            nch = {0: 1, 2: 3, 6: 4}.get(ctype, 0)
            if nch == 0:
                raise ValueError(f"unsupported PNG color type {ctype}")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if w is None or not idat or not seen_end:
        raise ValueError("PNG missing IHDR/IDAT/IEND")
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error as e:
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    if len(raw) != h * (1 + w * nch):
        raise ValueError("PNG pixel data length mismatch")
    px = _png_unfilter(raw, h, w, nch)
    if nch == 1:
        gray = px[:, :, 0]
    else:
        gray = px[:, :, :3].mean(axis=2).astype(np.uint8)
    return w, h, gray


# --------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81)
# --------------------------------------------------------------------------

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# T.81 Annex K.1 example quantization tables (luminance, chrominance)
_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# T.81 Annex K.3 example Huffman tables: (bits[1..16], huffval)
_HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II basis: F = C @ f @ C.T, f = C.T @ F @ C
_DCT_C = np.array(
    [
        [
            math.sqrt(1 / 8) if k == 0 else math.sqrt(2 / 8)
            * math.cos((2 * n + 1) * k * math.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) by the canonical T.81 code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol (dict lookup per emitted bit-length)."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 §B.1.1.5)
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    """Entropy-segment bit reader: un-stuffs FF 00, stops at any marker
    (FF xx, xx != 0) leaving position on the FF."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data exhausted")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError("JPEG entropy data hit a marker mid-block")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> None:
        """Drop partial byte; position must sit on an FF marker."""
        self.acc = 0
        self.n = 0


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map the t-bit magnitude code to a signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _mag_bits(v: int) -> tuple[int, int]:
    """Signed value -> (category t, t-bit code) per T.81 F.1.2.1."""
    t = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    code = v if v >= 0 else v + (1 << t) - 1
    return t, code


def _scale_qt(qt: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base table (public libjpeg convention)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * s + 50) // 100, 1, 255).astype(np.int64)


def encode_jpeg(img: np.ndarray, quality: int = 85, restart_interval: int = 0) -> bytes:
    """Encode a (h, w) uint8 grayscale or (h, w, 3) uint8 RGB array as a
    baseline sequential JPEG (T.81): grayscale → one component; RGB →
    YCbCr 4:4:4 (BT.601), Annex K tables scaled by ``quality``.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (real encoders do — it exercises the decoder's resync path)."""
    if img.ndim == 2:
        comps = [img.astype(np.float64) - 128.0]
    elif img.ndim == 3 and img.shape[2] == 3:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y - 128.0, cb - 128.0, cr - 128.0]
    else:
        raise ValueError("encode_jpeg expects (h,w) gray or (h,w,3) RGB")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("degenerate image dimensions")
    nc = len(comps)
    qts = [_scale_qt(_QT_LUMA, quality)]
    if nc == 3:
        qts.append(_scale_qt(_QT_CHROMA, quality))
    dc_tabs = [_huff_encode_table(*_HT_DC_LUMA)]
    ac_tabs = [_huff_encode_table(*_HT_AC_LUMA)]
    if nc == 3:
        dc_tabs.append(_huff_encode_table(*_HT_DC_CHROMA))
        ac_tabs.append(_huff_encode_table(*_HT_AC_CHROMA))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in enumerate(qts):
        zz = qt.reshape(64)[_ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(int(x) for x in zz)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])  # 1x1 sampling
    for cls, tabs in ((0, (_HT_DC_LUMA, _HT_DC_CHROMA)), (1, (_HT_AC_LUMA, _HT_AC_CHROMA))):
        for tid in range(1 if nc == 1 else 2):
            bits, vals = tabs[tid]
            out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
            out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        tid = 0 if ci == 0 else 1
        out += bytes([ci + 1, (tid << 4) | tid])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0

    bw = _BitWriter()
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    padded = []
    for c in comps:
        p = np.zeros((bh * 8, bwid * 8))
        p[:h, :w] = c
        p[h:, :w] = c[h - 1 : h, :]  # edge-replicate padding
        p[:, w:] = p[:, w - 1 : w]
        padded.append(p)
    pred = [0] * nc
    mcu_i = 0
    rst_n = 0
    for by in range(bh):
        for bx in range(bwid):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                out += bw.buf
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) % 8
                pred = [0] * nc
            mcu_i += 1
            for ci in range(nc):
                tid = 0 if ci == 0 else 1
                block = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _DCT_C @ block @ _DCT_C.T
                q = np.round(coef / qts[tid].reshape(8, 8)).astype(np.int64)
                zz = q.reshape(64)[_ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t, code = _mag_bits(diff)
                hc, hl = dc_tabs[tid][t]
                bw.write(hc, hl)
                if t:
                    bw.write(code, t)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        hc, hl = ac_tabs[tid][0xF0]  # ZRL
                        bw.write(hc, hl)
                        run -= 16
                    t, code = _mag_bits(v)
                    hc, hl = ac_tabs[tid][(run << 4) | t]
                    bw.write(hc, hl)
                    bw.write(code, t)
                    run = 0
                if run:
                    hc, hl = ac_tabs[tid][0x00]  # EOB
                    bw.write(hc, hl)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _decode_block(br: _BitReader, dc_tab, ac_tab, pred: int) -> tuple[np.ndarray, int]:
    """One 8×8 block's zigzag coefficients (pre-dequant) + new DC pred."""

    def decode_sym(tab) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | br.bit()
            length += 1
            sym = tab.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG Huffman decode failed (no code ≤ 16 bits)")

    zz = np.zeros(64, dtype=np.int64)
    t = decode_sym(dc_tab)
    if t > 15:  # valid DC categories are 0..11; a corrupt DHT can emit more
        raise ValueError(f"JPEG DC category {t} out of range")
    diff = _extend(br.bits(t), t) if t else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = decode_sym(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        zz[k] = _extend(br.bits(s), s)
        k += 1
    return zz, pred


def decode_jpeg(content: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline sequential JPEG to (width, height, (h, w) uint8
    luma). Rejects progressive/arithmetic variants with ValueError."""
    if content is None or len(content) < 4:
        raise ValueError("truncated JPEG")
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None  # (h, w, comps=[(cid, hi, vi, tq)])
    restart_interval = 0
    planes = None
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length
            continue
        (seglen,) = struct.unpack_from(">H", content, pos + 2)
        body = content[pos + 4 : pos + 2 + seglen]
        if seglen < 2 or len(body) != seglen - 2:
            raise ValueError("JPEG segment truncated")
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type SOF{marker - 0xC0} (baseline only)")
        if marker == 0xDB:  # DQT
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                bp += 1
                need = 64 if pq == 0 else 128
                if bp + need > len(body):
                    raise ValueError("JPEG DQT table truncated")
                if pq == 0:
                    tbl = np.frombuffer(body[bp : bp + 64], dtype=np.uint8).astype(np.int64)
                    bp += 64
                else:
                    tbl = np.frombuffer(body[bp : bp + 128], dtype=">u2").astype(np.int64)
                    bp += 128
                dq = np.zeros(64, dtype=np.int64)
                dq[_ZIGZAG] = tbl  # stored in zigzag order
                qts[tq] = dq
        elif marker == 0xC4:  # DHT
            bp = 0
            while bp < len(body):
                cls, tid = body[bp] >> 4, body[bp] & 0x0F
                bits = list(body[bp + 1 : bp + 17])
                nv = sum(bits)
                if len(bits) < 16 or bp + 17 + nv > len(body):
                    raise ValueError("JPEG DHT table truncated")
                vals = list(body[bp + 17 : bp + 17 + nv])
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _huff_decode_table(bits, vals)
                bp += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                raise ValueError("JPEG SOF0 truncated")
            prec, fh, fw, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if len(body) < 6 + 3 * nc:
                raise ValueError("JPEG SOF0 component list truncated")
            comps = []
            for i in range(nc):
                cid = body[6 + 3 * i]
                hv = body[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * i]))
            frame = (fh, fw, comps)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            fh, fw, comps = frame
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("JPEG SOS header truncated")
            scan = []
            for i in range(ns):
                cid = body[1 + 2 * i]
                tsel = body[2 + 2 * i]
                match = [c for c in comps if c[0] == cid]
                if not match:
                    raise ValueError(f"JPEG scan references unknown component {cid}")
                scan.append((match[0], tsel >> 4, tsel & 0x0F))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (fw + 8 * hmax - 1) // (8 * hmax)
            mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
            planes = {
                c[0]: np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8)) for c in comps
            }
            br = _BitReader(content, pos + 2 + seglen)
            preds = {c[0][0]: 0 for c in scan}
            mcu_count = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                        br.align_to_marker()
                        if (
                            br.pos + 2 <= len(content)
                            and content[br.pos] == 0xFF
                            and 0xD0 <= content[br.pos + 1] <= 0xD7
                        ):
                            br.pos += 2
                            preds = dict.fromkeys(preds, 0)
                        else:
                            raise ValueError("JPEG missing expected restart marker")
                    for (cid, hi, vi, tq), dtid, atid in scan:
                        if tq not in qts or dtid not in dc_tabs or atid not in ac_tabs:
                            raise ValueError("JPEG scan references missing table")
                        for byi in range(vi):
                            for bxi in range(hi):
                                zz, preds[cid] = _decode_block(
                                    br, dc_tabs[dtid], ac_tabs[atid], preds[cid]
                                )
                                deq = np.zeros(64, dtype=np.int64)
                                deq[_ZIGZAG] = zz
                                coef = (deq * qts[tq]).reshape(8, 8)
                                blk = _DCT_C.T @ coef @ _DCT_C
                                y0 = (my * vi + byi) * 8
                                x0 = (mx * hi + bxi) * 8
                                planes[cid][y0 : y0 + 8, x0 : x0 + 8] = blk
                    mcu_count += 1
            # luma = the first frame component, upsampled to full size
            cid0, h0, v0, _ = comps[0]
            luma = planes[cid0]
            if h0 < hmax or v0 < vmax:
                luma = np.kron(luma, np.ones((vmax // v0, hmax // h0)))
            luma = luma[:fh, :fw] + 128.0
            return fw, fh, np.clip(np.round(luma), 0, 255).astype(np.uint8)
        pos += 2 + seglen
    raise ValueError("JPEG missing SOS scan")


# --------------------------------------------------------------------------
# format sniffing — crawl media arrives with unreliable content types
# --------------------------------------------------------------------------


def sniff_image_format(content: bytes) -> str | None:
    """'bmp' | 'png' | 'jpeg' by magic bytes, None if unrecognized."""
    if not content or len(content) < 4:
        return None
    if content[:2] == b"BM":
        return "bmp"
    if content[: len(_PNG_SIG)] == _PNG_SIG:
        return "png"
    if content[:2] == b"\xff\xd8":
        return "jpeg"
    return None


def decode_image(content: bytes) -> tuple[str, int, int, np.ndarray]:
    """Sniff + decode any supported image format to (format, width,
    height, (h, w) uint8 grayscale). The single entry point the
    multimodal decode stage dispatches through — swapping in PIL here
    changes no Spark plumbing."""
    from xmlschemavalidator_spark.multimodal import decode_bmp

    fmt = sniff_image_format(content)
    if fmt == "bmp":
        w, h, gray = decode_bmp(content)
    elif fmt == "png":
        w, h, gray = decode_png(content)
    elif fmt == "jpeg":
        w, h, gray = decode_jpeg(content)
    else:
        raise ValueError("unrecognized image format (not BMP/PNG/JPEG)")
    return fmt, w, h, gray
