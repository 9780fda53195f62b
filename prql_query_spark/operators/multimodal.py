"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Decode has two tiers:

* `use_real_decode=True` — a REAL stdlib container-header decoder
  (PNG/JPEG/GIF signatures, big/little-endian dimension fields, JPEG
  marker scan) parses format/width/height from the payload bytes.  No
  external libraries needed; full pixel decode (PIL/ffmpeg) remains an
  optional swap-in at `_decode_pixels` and raises a clear error.
* fake path — `_fake_descriptor` byte-histogram moments, kept for
  determinism tests and as the stand-in for learned embeddings.

The Spark-side contract is identical either way: schemas, Arrow batch
shapes, mapInPandas iterator signatures, partition sizing.

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
    StructField("format", StringType()),      # png|jpeg|gif|unknown (real decode)
    StructField("width", IntegerType()),      # parsed from header (real decode)
    StructField("height", IntegerType()),
    StructField("feature", ArrayType(FloatType())),  # fixed 8-dim descriptor
])

# PNG container pieces for the synthetic fixture: 8-byte signature,
# 13-byte IHDR length + tag, then width/height as big-endian u32 and the
# bit-depth/color/compression/filter/interlace quintet (CRC zeroed — the
# header parser doesn't validate CRCs, like most fast-path scanners).
_PNG_SIG_IHDR = "89504E470D0A1A0A0000000D49484452"
_PNG_TAIL = "0806000000" + "00000000"


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic media fixture: each row becomes a VALID-HEADER PNG
    whose IHDR dimensions derive from the id (width = id%640+1,
    height = (id*7)%480+1) and whose 'pixel data' is the utf-8 text bytes.
    Header parsing therefore has real work to do, while every field stays
    reproducible in plain SQL for the correctness oracle.  Assembly is
    JVM-side (hex/unhex/concat) — no Python in the synthesis path."""
    w = (F.col(id_col) % 640 + 1).cast("int")
    h = ((F.col(id_col) * 7) % 480 + 1).cast("int")
    be32 = lambda c: F.unhex(F.lpad(F.hex(c), 8, "0"))  # noqa: E731
    payload = F.concat(
        F.unhex(F.lit(_PNG_SIG_IHDR)),
        be32(w), be32(h),
        F.unhex(F.lit(_PNG_TAIL)),
        F.encode(F.col(text_col), "utf-8"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.lit("image/png").alias("mime"),
        w.alias("width"),
        h.alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def decode_image_meta(payload: bytes) -> tuple[str, int | None, int | None]:
    """Real stdlib container-header decode: (format, width, height) from
    the leading bytes of PNG / JPEG / GIF payloads, (\"unknown\", None,
    None) otherwise.  This is the metadata tier a 100 TB ingest pipeline
    runs on every object; full pixel decode stays optional."""
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return "png", w, h
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return "jpeg", w, h
            i += 2 + seg_len
        return "jpeg", None, None
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return "gif", w, h
    return "unknown", None, None


def _decode_pixels(payload: bytes) -> "object":
    """Full pixel decode needs PIL/pillow (not in this container); the
    header tier above is dependency-free.  Raise exactly like an optional
    dependency would."""
    raise NotImplementedError(
        "pixel decode requires PIL/pillow which is not installed; "
        "decode_image_meta provides the header tier without it"
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
    decode implementation.  With `use_real_decode` the format/width/height
    columns carry real header-parsed values (decode_image_meta); without
    it they are null and only the deterministic fake descriptor is
    produced.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, fmts, ws, hs, nbs = [], [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                if use_real_decode:
                    fmt, w, h = decode_image_meta(b)
                else:
                    fmt, w, h = None, None, None
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
                nbs.append(len(b))
                feats.append(_fake_descriptor(b))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": nbs,
                "format": fmts,
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
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
