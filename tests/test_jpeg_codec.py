"""Roundtrip tests for the pure-python baseline JPEG decoder.

A minimal test-side ENCODER (forward DCT + quantize + canonical Huffman
with the spec's public Annex-K tables) produces real baseline streams —
greyscale 4:4:4, color 4:2:0, byte-stuffing, restart markers — which
``decode_jpeg_pixels`` must decode back within quantization error.
"""

import math
import struct

import pytest

from data2neo_spark.operators import jpeg as J
from data2neo_spark.operators import multimodal

# ---- public Annex K tables ------------------------------------------------

QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_SYMS = list(range(12))
AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_SYMS = [
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
]


def _codes(counts, syms):
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[syms[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


DC_CODES = _codes(DC_COUNTS, DC_SYMS)
AC_CODES = _codes(AC_COUNTS, AC_SYMS)

_FDCT = [
    [(math.sqrt(0.5) if u == 0 else 1.0) * 0.5
     * math.cos((2 * x + 1) * u * math.pi / 16)
     for x in range(8)] for u in range(8)
]


def _fdct_quant(block, qt):
    """block: 64 samples (0..255) -> zigzagged quantized coeffs."""
    shifted = [v - 128 for v in block]
    tmp = [[sum(_FDCT[u][x] * shifted[y * 8 + x] for x in range(8))
            for u in range(8)] for y in range(8)]
    coeffs = [0] * 64
    for u in range(8):
        for v in range(8):
            coeffs[v * 8 + u] = sum(_FDCT[v][y] * tmp[y][u] for y in range(8))
    zz = [0] * 64
    for i in range(64):
        natural = J.ZIGZAG[i]
        zz[i] = int(round(coeffs[natural] / qt[i]))
    return zz


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, length, code):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)      # byte stuffing
                self.acc = 0
                self.n = 0

    def pad(self):
        while self.n:
            self.write(1, 1)                   # pad with 1-bits


def _encode_block(w, zz, dc_pred):
    diff = zz[0] - dc_pred
    t = abs(diff).bit_length()
    w.write(*DC_CODES[t])
    if t:
        bits = diff if diff >= 0 else diff + (1 << t) - 1
        w.write(t, bits & ((1 << t) - 1))
    k = 1
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    while k <= last_nz:
        v = zz[k]
        if v == 0:
            run += 1
            k += 1
            continue
        while run > 15:
            w.write(*AC_CODES[0xF0])           # ZRL
            run -= 16
        s = abs(v).bit_length()
        w.write(*AC_CODES[(run << 4) | s])
        bits = v if v >= 0 else v + (1 << s) - 1
        w.write(s, bits & ((1 << s) - 1))
        run = 0
        k += 1
    if last_nz < 63:
        w.write(*AC_CODES[0x00])               # EOB
    return zz[0]


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _headers(w_, h_, comps, qt, restart=0):
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes(qt))
    sof = bytes([8]) + struct.pack(">HH", h_, w_) + bytes([len(comps)])
    for cid, hs, vs in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_COUNTS) + bytes(DC_SYMS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_COUNTS) + bytes(AC_SYMS))
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(comps)])
    for cid, _hs, _vs in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    return out


def _block_at(pix, w_, h_, ox, oy, stride=1):
    """8x8 block from a greyscale plane with edge replication."""
    blk = []
    for y in range(8):
        for x in range(8):
            sx = min(w_ - 1, ox + x)
            sy = min(h_ - 1, oy + y)
            blk.append(pix[sy * w_ + sx])
    return blk


def encode_gray(pix, w_, h_, qt, restart=0):
    out = bytearray(_headers(w_, h_, [(1, 1, 1)], qt, restart))
    bw = _BitWriter()
    dc = 0
    mcus = 0
    rst = 0
    for oy in range(0, h_, 8):
        for ox in range(0, w_, 8):
            if restart and mcus and mcus % restart == 0:
                bw.pad()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                dc = 0
            zz = _fdct_quant(_block_at(pix, w_, h_, ox, oy), qt)
            dc = _encode_block(bw, zz, dc)
            mcus += 1
    bw.pad()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_color_420(rgb, w_, h_, qt):
    """RGB -> YCbCr 4:2:0 baseline JPEG (all components share table 0)."""
    Y = [0.0] * (w_ * h_)
    Cb = [0.0] * (w_ * h_)
    Cr = [0.0] * (w_ * h_)
    for i in range(w_ * h_):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        Y[i] = 0.299 * r + 0.587 * g + 0.114 * b
        Cb[i] = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
        Cr[i] = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
    yq = [min(255, max(0, int(round(v)))) for v in Y]
    # subsample chroma 2x2 average
    cw, ch_ = (w_ + 1) // 2, (h_ + 1) // 2
    def sub(plane):
        out = []
        for yy in range(ch_):
            for xx in range(cw):
                vals = []
                for dy in range(2):
                    for dx in range(2):
                        sx = min(w_ - 1, 2 * xx + dx)
                        sy = min(h_ - 1, 2 * yy + dy)
                        vals.append(plane[sy * w_ + sx])
                out.append(min(255, max(0, int(round(sum(vals) / 4)))))
        return out
    cbq, crq = sub(Cb), sub(Cr)

    out = bytearray(_headers(w_, h_, [(1, 2, 2), (2, 1, 1), (3, 1, 1)], qt))
    bw = _BitWriter()
    dc = [0, 0, 0]
    for oy in range(0, h_, 16):
        for ox in range(0, w_, 16):
            for by in range(2):
                for bx in range(2):
                    zz = _fdct_quant(
                        _block_at(yq, w_, h_, ox + 8 * bx, oy + 8 * by), qt)
                    dc[0] = _encode_block(bw, zz, dc[0])
            for plane, ci in ((cbq, 1), (crq, 2)):
                zz = _fdct_quant(
                    _block_at(plane, cw, ch_, ox // 2, oy // 2), qt)
                dc[ci] = _encode_block(bw, zz, dc[ci])
    bw.pad()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _texture(w_, h_):
    return [(x * 13 + y * 7 + ((x * y) % 5) * 11) % 200 + 20
            for y in range(h_) for x in range(w_)]


def test_gray_roundtrip_near_lossless():
    """All-ones quant table ⇒ only DCT rounding error: |err| ≤ 2."""
    w_, h_ = 16, 16
    pix = _texture(w_, h_)
    data = encode_gray(pix, w_, h_, [1] * 64)
    gw, gh, ch, got = J.decode_jpeg_pixels(data)
    assert (gw, gh, ch) == (w_, h_, 1)
    assert max(abs(a - b) for a, b in zip(got, pix)) <= 2


def test_gray_roundtrip_annexk_table():
    """Standard luminance table on a smooth gradient: small error."""
    w_, h_ = 24, 16
    pix = [min(255, x * 3 + y * 2) for y in range(h_) for x in range(w_)]
    data = encode_gray(pix, w_, h_, QT_LUMA)
    gw, gh, ch, got = J.decode_jpeg_pixels(data)
    assert (gw, gh, ch) == (w_, h_, 1)
    err = sum(abs(a - b) for a, b in zip(got, pix)) / len(pix)
    assert err < 4.0


def test_gray_restart_markers():
    """DRI=1 ⇒ an RSTn between every MCU; DC predictors reset."""
    w_, h_ = 32, 8
    pix = _texture(w_, h_)
    data = encode_gray(pix, w_, h_, [1] * 64, restart=1)
    assert b"\xff\xd0" in data or b"\xff\xd1" in data
    gw, gh, ch, got = J.decode_jpeg_pixels(data)
    assert (gw, gh, ch) == (w_, h_, 1)
    assert max(abs(a - b) for a, b in zip(got, pix)) <= 2


def test_color_420_solid_exact():
    """A solid color survives the full color pipeline (RGB→YCbCr→DCT→
    Huffman→decode→upsample→RGB) exactly with a unit quant table."""
    w_, h_ = 16, 16
    rgb = [120, 90, 140] * (w_ * h_)
    data = encode_color_420(rgb, w_, h_, [1] * 64)
    gw, gh, ch, got = J.decode_jpeg_pixels(data)
    assert (gw, gh, ch) == (w_, h_, 3)
    assert max(abs(a - b) for a, b in zip(got, rgb)) == 0


def test_color_420_luma_texture():
    """Luma-only variation (r=g=b) keeps chroma constant, so 4:2:0
    subsampling is lossless and every channel tracks Y near-exactly."""
    w_, h_ = 16, 16
    rgb = []
    for y in range(h_):
        for x in range(w_):
            v = (x * 9 + y * 5) % 180 + 30
            rgb += [v, v, v]
    data = encode_color_420(rgb, w_, h_, [1] * 64)
    gw, gh, ch, got = J.decode_jpeg_pixels(data)
    assert (gw, gh, ch) == (w_, h_, 3)
    assert max(abs(a - b) for a, b in zip(got, rgb)) <= 3


def test_color_420_varying_chroma_bounded():
    """Varying chroma incurs genuine 4:2:0 subsampling loss — bounded by
    the neighborhood chroma swing, not unbounded."""
    w_, h_ = 16, 16
    rgb = []
    for y in range(h_):
        for x in range(w_):
            rgb += [(x * 9 + y * 5) % 180 + 30, 90, 140]
    data = encode_color_420(rgb, w_, h_, [1] * 64)
    _, _, _, got = J.decode_jpeg_pixels(data)
    err = sum(abs(a - b) for a, b in zip(got, rgb)) / len(rgb)
    assert err < 12.0


def test_odd_dims_and_errors():
    """Non-multiple-of-8 dims decode at exact size; progressive raises."""
    w_, h_ = 13, 10
    pix = _texture(w_, h_)
    data = encode_gray(pix, w_, h_, [1] * 64)
    gw, gh, ch, got = J.decode_jpeg_pixels(data)
    assert (gw, gh) == (w_, h_) and len(got) == w_ * h_
    assert max(abs(a - b) for a, b in zip(got, pix)) <= 2

    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        J.decode_jpeg_pixels(prog)
    assert J.decode_jpeg_pixels(b"\x89PNG") is None


def test_decode_image_dispatches_jpeg():
    """multimodal.decode_image handles baseline JPEGs now."""
    w_, h_ = 8, 8
    pix = _texture(w_, h_)
    data = encode_gray(pix, w_, h_, [1] * 64)
    gw, gh, ch, got = multimodal.decode_image(data)
    assert (gw, gh, ch) == (w_, h_, 1)
    st = multimodal.pixel_stats(data)
    assert st is not None and st["n_px"] == 64


def test_gray_roundtrip_property():
    """Random textures roundtrip within DCT rounding error at unit
    quantization (hypothesis)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(st.data())
    def _inner(data):
        w_ = data.draw(st.sampled_from([8, 16, 24]))
        h_ = data.draw(st.sampled_from([8, 16]))
        pix = data.draw(st.lists(st.integers(0, 255),
                                 min_size=w_ * h_, max_size=w_ * h_))
        stream = encode_gray(pix, w_, h_, [1] * 64)
        gw, gh, ch, got = J.decode_jpeg_pixels(stream)
        assert (gw, gh, ch) == (w_, h_, 1)
        assert max(abs(a - b) for a, b in zip(got, pix)) <= 2

    _inner()


def test_phash_cross_format(spark):
    """The same texture encoded as PNG and as (near-lossless) JPEG lands
    within a small pHash Hamming distance — cross-format near-dup
    detection works through the shared decode dispatch."""
    import struct
    import zlib

    import pandas as pd

    w_, h_ = 16, 16
    pix = _texture(w_, h_)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    stride = w_
    raw = bytearray()
    for y in range(h_):
        raw.append(0)
        raw += bytes(pix[y * stride:(y + 1) * stride])
    ihdr = struct.pack(">II", w_, h_) + b"\x08\x00\x00\x00\x00"
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))
    jpg = encode_gray(pix, w_, h_, [1] * 64)

    df = spark.createDataFrame(pd.DataFrame({
        "media_id": [1, 2], "kind": ["image", "image"],
        "payload": [bytearray(png), bytearray(jpg)],
        "mime": ["image/png", "image/jpeg"],
    }))
    sig = {r["media_id"]: r["phash"]
           for r in multimodal.with_phash(df).collect()}
    assert sig[1] is not None and sig[2] is not None
    assert bin(sig[1] ^ sig[2]).count("1") <= 4
    pairs = multimodal.phash_near_duplicates(df, max_hamming=8).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
