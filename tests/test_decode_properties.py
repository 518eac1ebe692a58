"""Property-based tests (hypothesis) for the pure-stdlib media decoders
and the GPT-2 pretokenizer: encode→decode roundtrips over RANDOM inputs,
not just the synth fixtures' shapes."""

import struct
import zlib

from hypothesis import given, settings, strategies as st

from data2neo_spark.operators import bpe, multimodal


def _chunk(ctype, data):
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _encode_png(w, h, ch, pixels, filters):
    """Reference encoder (test-side only): apply the given filter type per
    scanline and wrap in a valid PNG."""
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    stride = w * ch
    raw = bytearray()
    for y in range(h):
        line = pixels[y * stride:(y + 1) * stride]
        prev = pixels[(y - 1) * stride:y * stride] if y else [0] * stride
        f = filters[y]
        raw.append(f)
        for x in range(stride):
            left = line[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if f == 0:
                raw.append(line[x])
            elif f == 1:
                raw.append((line[x] - left) & 0xFF)
            elif f == 2:
                raw.append((line[x] - up) & 0xFF)
            elif f == 3:
                raw.append((line[x] - ((left + up) >> 1)) & 0xFF)
            else:
                raw.append((line[x] - paeth(left, up, ul)) & 0xFF)
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">II", w, h) + bytes([8, color, 0, 0, 0])
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_png_roundtrip_any_filters(data):
    """decode(encode(pixels, any per-row filter mix)) == pixels for random
    dims, channel counts, pixel values, and filter choices."""
    w = data.draw(st.integers(1, 9))
    h = data.draw(st.integers(1, 9))
    ch = data.draw(st.sampled_from([1, 2, 3, 4]))
    pixels = data.draw(st.lists(
        st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch))
    filters = data.draw(st.lists(
        st.integers(0, 4), min_size=h, max_size=h))
    png = _encode_png(w, h, ch, pixels, filters)
    got = multimodal.decode_png_pixels(png)
    assert got is not None
    gw, gh, gch, buf = got
    assert (gw, gh, gch) == (w, h, ch)
    assert list(buf) == pixels


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=0, max_size=200),
       st.sampled_from([8000, 16000, 44100]),
       st.sampled_from([1, 2]))
def test_wav_roundtrip(vals, rate, channels):
    """decode(encode(samples)) == samples for random 16-bit PCM."""
    if channels == 2 and len(vals) % 2:
        vals = vals[:-1]
    payload = struct.pack(f"<{len(vals)}h", *vals)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", len(payload)) + payload)
    got = multimodal.decode_wav_samples(wav)
    assert got == (rate, channels, 16, list(vals))


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=80))
def test_gpt2_pretokenizer_lossless(text):
    """Pieces always concatenate back to the input (no character dropped
    or duplicated) and are non-empty."""
    pieces = bpe.pretokenize_gpt2(text)
    assert "".join(pieces) == text
    assert all(pieces)


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=60))
def test_gpt2_byte_remap_bijective(text):
    """gpt2_pieces is losslessly invertible through the byte bijection."""
    b2u = bpe.bytes_to_unicode()
    inv = {v: k for k, v in b2u.items()}
    round_tripped = "".join(
        bytes(inv[c] for c in piece).decode("utf-8")
        for piece in bpe.gpt2_pieces(text)
    )
    assert round_tripped == text


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_phash_brightness_invariant_property(data):
    """For ANY random texture, a constant brightness shift that avoids
    wraparound leaves the pHash unchanged (only the DC coefficient moves),
    and the hash always fits the 63-bit contract."""
    w = data.draw(st.integers(8, 16))
    h = data.draw(st.integers(8, 16))
    pixels = data.draw(st.lists(
        st.integers(0, 200), min_size=w * h, max_size=w * h))
    shift = data.draw(st.integers(0, 55))
    h0 = multimodal.phash_py(w, h, 1, bytes(pixels))
    h1 = multimodal.phash_py(w, h, 1, bytes(v + shift for v in pixels))
    assert h0 == h1
    assert 0 <= h0 < (1 << 63)
