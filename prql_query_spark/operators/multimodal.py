"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container has no image/audio decode libraries, so the decode kernels are
STUBBED (clearly marked below) behind a deterministic fake — but the
Spark-side contract is real and tested: schemas, Arrow batch shapes,
mapInPandas signatures, partition sizing.  Swapping the fake for PIL/ffmpeg
is a one-function change that doesn't touch the plan.

Scale notes: binary payloads ride in Arrow record batches; keep
`spark.sql.files.maxPartitionBytes` at default 128 MB so a partition of
payloads fits executor memory, and use mapInPandas (iterator form) so one
task never materializes more than one batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("payload", BinaryType()),     # opaque encoded bytes
    StructField("mime", StringType()),
    StructField("width", IntegerType()),      # metadata (nullable)
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("feature", ArrayType(FloatType())),  # fixed 8-dim descriptor
])


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a deterministic fake media table from any table (payload =
    utf-8 bytes of the text column) — the test fixture for the plumbing."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _decode_image(payload: bytes) -> "object":
    """STUB: real implementation would be PIL.Image.open(io.BytesIO(payload)).

    The image/audio libraries are not in this container; raise exactly like
    an optional dependency would."""
    raise NotImplementedError(
        "image decode requires PIL/pillow which is not installed; "
        "extract_features uses the deterministic fake descriptor instead"
    )


def _fake_descriptor(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: byte-histogram
    moments.  Pure-python, stable across runs/machines."""
    if not payload:
        return [0.0] * dim
    out = []
    n = len(payload)
    for i in range(dim):
        s = sum(payload[i::dim]) if i < n else 0
        out.append(round(s / max(1, len(payload[i::dim])) / 255.0, 6))
    return out


def extract_features(df: DataFrame, use_real_decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Iterator form: one Arrow batch in flight per task.  Output schema is
    fixed (FEATURE_SCHEMA) so downstream plans are stable regardless of the
    decode implementation.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                if use_real_decode:
                    _decode_image(b)  # raises NotImplementedError by design
                feats.append(_fake_descriptor(b))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                "feature": feats,
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' on the fake payloads: take every Nth byte as a
    'frame' marker — exercises the explode/resample plan shape a real video
    pipeline needs (explode is JVM-side; no Python here)."""
    return df.select(
        "media_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.length("payload") / every_n_bytes).cast("int") - 1, F.lit(0)
                    ),
                ),
                lambda i: i * every_n_bytes,
            )
        ).alias("frame_idx", "byte_offset"),
    )
