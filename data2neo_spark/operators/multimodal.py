"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery (schemas, Arrow batch shapes, mapInPandas plumbing,
partition sizing) is real and tested. HEADER decode is real too — pure
python PNG / JPEG / WAV container parsing (public file formats), no native
imaging libraries needed — so width/height/sample-rate/duration are
genuine parsed metadata. Only PIXEL/SAMPLE decode (the model-input path)
remains stubbed behind ``fake_feature``: that genuinely needs
libjpeg/ffmpeg-class native code this container does not ship.

``synth_media`` emits payloads with REAL headers, constructed from a hex
string built of pure integer expressions — the DuckDB oracle rebuilds the
identical hex per media_id and hashes it, so the driver query verifies
synth → real bytes → python header parse end-to-end against independent
SQL arithmetic.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("payload", T.BinaryType()),     # opaque bytes
    T.StructField("mime", T.StringType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("format", T.StringType()),      # png | jpeg | wav | null
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def decode_image(payload: bytes):  # pragma: no cover - stub
    """PIXEL decode requires PIL/libjpeg — not in this container. Header
    metadata does not need it: see :func:`parse_header`."""
    raise NotImplementedError(
        "image decode requires an imaging library; use fake_feature=True "
        "for the deterministic test path"
    )


def _be(b: bytes, off: int, n: int) -> int:
    return int.from_bytes(b[off:off + n], "big")


def _le(b: bytes, off: int, n: int) -> int:
    return int.from_bytes(b[off:off + n], "little")


def parse_png(b: bytes):
    """(width, height) from the IHDR chunk; None if not a PNG."""
    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    return _be(b, 16, 4), _be(b, 20, 4)


def parse_jpeg(b: bytes):
    """(width, height) from the first SOF0/SOF1/SOF2 frame header, found
    by walking the marker segments; None if not a JPEG."""
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:          # EOI before any SOF
            return None
        seg_len = _be(b, i + 2, 2)
        if marker in (0xC0, 0xC1, 0xC2) and i + 9 <= len(b):
            return _be(b, i + 7, 2), _be(b, i + 5, 2)
        i += 2 + seg_len
    return None


def parse_wav(b: bytes):
    """(sample_rate, n_channels, bits, duration_ms) from the RIFF/fmt/data
    headers (duration from the DECLARED data size — header-only payloads
    parse fine); None if not a WAV."""
    if len(b) < 44 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    data_size = None
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        clen = _le(b, i + 4, 4)
        if cid == b"fmt " and i + 24 <= len(b):
            fmt = (_le(b, i + 10, 2), _le(b, i + 12, 4), _le(b, i + 22, 2))
        elif cid == b"data":
            data_size = clen
        i += 8 + clen
        if cid == b"data":
            break
    if fmt is None or data_size is None:
        return None
    channels, rate, bits = fmt
    byte_rate = rate * channels * (bits // 8)
    duration_ms = (data_size * 1000) // byte_rate if byte_rate else 0
    return rate, channels, bits, duration_ms


def parse_header(b: bytes) -> dict:
    """Dispatch on magic bytes → dict of parsed metadata (missing keys
    null): format, width, height, sample_rate, n_channels, duration_ms."""
    out = {"format": None, "width": None, "height": None,
           "sample_rate": None, "n_channels": None, "duration_ms": None}
    b = b or b""
    png = parse_png(b)
    if png is not None:
        out["format"] = "png"
        out["width"], out["height"] = png
        return out
    jpg = parse_jpeg(b)
    if jpg is not None:
        out["format"] = "jpeg"
        out["width"], out["height"] = jpg
        return out
    wav = parse_wav(b)
    if wav is not None:
        out["format"] = "wav"
        (out["sample_rate"], out["n_channels"], _bits,
         out["duration_ms"]) = wav
        return out
    return out


def _fake_feature(payload: bytes, dim: int = 8):
    """Deterministic fake embedding: sha256-seeded byte statistics."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_features(
    media: DataFrame, dim: int = 8, fake_feature: bool = True
) -> DataFrame:
    """mapInPandas feature + header extraction over binary payloads.

    Arrow moves the binary column in batches; per-batch python parses the
    REAL container headers (PNG/JPEG/WAV — :func:`parse_header`) and
    computes the feature vector. Header metadata is genuine; only the
    pixel/sample decode behind the feature is stubbed (``fake_feature``) —
    the batch shape, schema, and partitioning are exactly what a real
    CLIP/whisper extractor would use, swap ``_fake_feature`` for the
    model call.
    """
    out_cols = [f.name for f in FEATURE_SCHEMA.fields]
    feat_dim = dim
    do_fake = fake_feature
    parse = parse_header

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import pandas as _pd

        for pdf in batches:
            out = []
            for rec in pdf.to_dict("records"):
                payload = rec["payload"] or b""
                if not do_fake:
                    raise NotImplementedError(
                        "pixel/sample decode requires an imaging/audio "
                        "library; use fake_feature=True for the "
                        "deterministic test path (headers parse either way)"
                    )
                hdr = parse(payload)
                # sha256: oracle-reproducible (DuckDB has sha256, not sha1)
                digest = _hashlib.sha256(payload).digest()
                out.append({
                    "media_id": rec["media_id"],
                    "kind": rec["kind"],
                    "n_bytes": len(payload),
                    "sha256": digest.hex(),
                    "format": hdr["format"],
                    "width": hdr["width"],
                    "height": hdr["height"],
                    "sample_rate": hdr["sample_rate"],
                    "duration_ms": hdr["duration_ms"],
                    "feature": [b / 255.0 for b in digest[:feat_dim]],
                })
            yield _pd.DataFrame(out, columns=out_cols)

    return media.mapInPandas(_run, schema=FEATURE_SCHEMA)


def _hx(col, digits: int):
    """Zero-padded UPPERCASE hex of a non-negative int Column — identical
    output to DuckDB's lpad(hex(x), n, '0')."""
    return F.lpad(F.hex(col.cast("long")), digits, "0")


def _byte(col, i: int):
    return F.shiftrightunsigned(col.cast("long"), 8 * i).bitwiseAND(F.lit(255))


def _le16(col):
    return F.concat(_hx(_byte(col, 0), 2), _hx(_byte(col, 1), 2))


def _le32(col):
    return F.concat(*[_hx(_byte(col, i), 2) for i in range(4)])


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table with REAL container headers.

    Payloads are built as hex strings of pure integer expressions and
    unhex'd to binary, so the DuckDB oracle reconstructs the identical hex
    per media_id with the same arithmetic and verifies byte length,
    parsed dimensions, and a hash of the exact bytes:

    * ``image`` rows alternate a minimal PNG (IHDR with formula-derived
      width/height) and a minimal JPEG (SOF0 frame header);
    * ``audio`` rows are a 44-byte WAV header (RIFF/fmt/data) with
      formula-derived sample rate / channels / declared data size;
    * ``video`` rows are opaque bytes (the sha256 digest of seed‖id) —
      the unknown-format path stays exercised.
    """
    rows = spark.range(n).select(F.col("id").alias("media_id"))
    mid = F.col("media_id")
    w = (F.lit(16) + (mid * 7) % 240).cast("long")
    h = (F.lit(16) + (mid * 11) % 240).cast("long")
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A0000000D49484452"),
        _hx(w, 8), _hx(h, 8),
        F.lit("080600000000000000"),
    )
    jpeg_hex = F.concat(
        F.lit("FFD8FFC0001108"), _hx(h, 4), _hx(w, 4),
        F.lit("03"), F.lit("00" * 9), F.lit("FFD9"),
    )
    rate = (F.lit(8000) + (mid % 5) * 4000).cast("long")
    ch = (F.lit(1) + mid % 2).cast("long")
    data_size = ((mid % 50 + 1) * 1000).cast("long")
    byte_rate = rate * ch * 2
    block_align = ch * 2
    wav_hex = F.concat(
        F.lit("52494646"), _le32(data_size + 36), F.lit("57415645"),
        F.lit("666D7420"), F.lit("10000000"), F.lit("0100"),
        _le16(ch), _le32(rate), _le32(byte_rate), _le16(block_align),
        F.lit("1000"), F.lit("64617461"), _le32(data_size),
    )
    opaque_hex = F.upper(
        F.sha2(F.concat(F.lit(str(seed)), mid.cast("string")), 256)
    )
    hex_expr = (
        F.when((mid % 3 == 0) & ((mid / 3).cast("long") % 2 == 0), png_hex)
        .when(mid % 3 == 0, jpeg_hex)
        .when(mid % 3 == 1, wav_hex)
        .otherwise(opaque_hex)
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (mid % 3 + 1).cast("int"),
    )
    mime = (
        F.when((mid % 3 == 0) & ((mid / 3).cast("long") % 2 == 0),
               F.lit("image/png"))
        .when(mid % 3 == 0, F.lit("image/jpeg"))
        .when(mid % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("application/octet-stream"))
    )
    return rows.select(
        "media_id",
        kind.alias("kind"),
        F.unhex(hex_expr).alias("payload"),
        mime.alias("mime"),
    )
