"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery (schemas, Arrow batch shapes, mapInPandas plumbing,
partition sizing) is real and tested; the actual media decode is STUBBED —
this container has no image/audio libraries. Decoders raise
NotImplementedError unless a deterministic fake is requested, which lets the
pipeline shape be exercised end-to-end.
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
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real decode requires PIL/libjpeg — not in this container."""
    raise NotImplementedError(
        "image decode requires an imaging library; use fake_feature=True "
        "for the deterministic test path"
    )


def _fake_feature(payload: bytes, dim: int = 8):
    """Deterministic fake embedding: sha256-seeded byte statistics."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_features(
    media: DataFrame, dim: int = 8, fake_feature: bool = True
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow moves the binary column in batches; per-batch python computes the
    (stubbed) feature vector. The batch shape, schema, and partitioning are
    exactly what a real CLIP/whisper extractor would use — swap
    ``_fake_feature`` for the model call.
    """

    # NOTE: the closure must be self-contained (stdlib-only references) —
    # executor python workers in a foreign harness may not have this package
    # on sys.path, and cloudpickle resolves module globals by import.
    out_cols = ["media_id", "kind", "n_bytes", "sha256", "feature"]
    feat_dim = dim
    do_fake = fake_feature

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import pandas as _pd

        for pdf in batches:
            out = []
            for rec in pdf.to_dict("records"):
                payload = rec["payload"] or b""
                if not do_fake:
                    raise NotImplementedError(
                        "image decode requires an imaging library; use "
                        "fake_feature=True for the deterministic test path"
                    )
                # sha256: oracle-reproducible (DuckDB has sha256, not sha1)
                digest = _hashlib.sha256(payload).digest()
                out.append({
                    "media_id": rec["media_id"],
                    "kind": rec["kind"],
                    "n_bytes": len(payload),
                    "sha256": digest.hex(),
                    "feature": [b / 255.0 for b in digest[:feat_dim]],
                })
            yield _pd.DataFrame(out, columns=out_cols)

    return media.mapInPandas(_run, schema=FEATURE_SCHEMA)


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table matching MEDIA_SCHEMA."""
    rows = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
    )
    payload = F.sha2(F.concat(F.lit(str(seed)), F.col("media_id").cast("string")), 256)
    return rows.select(
        "media_id",
        "kind",
        F.encode(payload, "utf-8").cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        (F.col("media_id") * 100).cast("long").alias("duration_ms"),
    )
