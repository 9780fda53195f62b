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

Audio/video get the same treatment (bottom of this module): stdlib
RIFF/WAV chunk walking and ISO-BMFF (MP4) box walking extract
sample-rate/duration/dimensions from real container bytes, with
JVM-side synthesized fixtures whose id-derived fields the SQL oracle
recomputes independently (`x_multimodal_av`).

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

from prql_query_spark.engine.session import barrier

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


def _decode_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Full pixel decode: (width, height, channels, row-major bytes).

    PNG decodes for REAL with zero dependencies (stdlib zlib inflate +
    unfilter — decode_png_pixels below); other formats fall back to
    PIL/pillow when importable, else raise like an optional dependency."""
    try:
        return decode_png_pixels(payload)
    except ValueError:
        pass
    try:
        from io import BytesIO

        from PIL import Image  # optional dependency
    except ImportError as e:
        raise NotImplementedError(
            "non-PNG pixel decode requires PIL/pillow which is not "
            "installed; PNG decodes natively via decode_png_pixels and "
            "decode_image_meta provides the header tier for all formats"
        ) from e
    img = Image.open(BytesIO(payload))
    ch = len(img.getbands())
    return img.width, img.height, ch, img.tobytes()


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


# --- audio / video header tier ---------------------------------------------

AV_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("format", StringType()),      # wav|mp4|unknown
    StructField("sample_rate", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])


def decode_audio_meta(payload: bytes) -> tuple[str, int | None, int | None]:
    """Real stdlib WAV/RIFF chunk walk: (format, sample_rate, duration_ms).
    Walks fmt /data chunks (word-aligned) rather than assuming the
    canonical 44-byte layout, like a real ingest scanner must."""
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        i, sr, byte_rate, data_size = 12, None, None, None
        while i + 8 <= len(payload):
            tag = payload[i : i + 4]
            size = int.from_bytes(payload[i + 4 : i + 8], "little")
            if tag == b"fmt " and i + 20 <= len(payload):
                sr = int.from_bytes(payload[i + 12 : i + 16], "little")
                byte_rate = int.from_bytes(payload[i + 16 : i + 20], "little")
            elif tag == b"data":
                data_size = size
            i += 8 + size + (size & 1)
        dur = (int(data_size * 1000 // byte_rate)
               if byte_rate and data_size is not None else None)
        return "wav", sr, dur
    return "unknown", None, None


def _iter_boxes(p: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        size = int.from_bytes(p[i : i + 4], "big")
        if size < 8:
            break
        yield p[i + 4 : i + 8], i + 8, min(i + size, end)
        i += size


def decode_video_meta(
    payload: bytes,
) -> tuple[str, int | None, int | None, int | None]:
    """Real stdlib ISO-BMFF (MP4) box walk: (format, width, height,
    duration_ms) from moov/mvhd (timescale+duration) and moov/trak/tkhd
    (16.16 fixed-point dimensions)."""
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        w = h = dur = None
        for tag, s, e in _iter_boxes(payload, 0, len(payload)):
            if tag != b"moov":
                continue
            for t2, s2, e2 in _iter_boxes(payload, s, e):
                if t2 == b"mvhd" and e2 - s2 >= 20:
                    ts = int.from_bytes(payload[s2 + 12 : s2 + 16], "big")
                    d = int.from_bytes(payload[s2 + 16 : s2 + 20], "big")
                    dur = int(d * 1000 // ts) if ts else None
                elif t2 == b"trak":
                    for t3, s3, e3 in _iter_boxes(payload, s2, e2):
                        if t3 == b"tkhd" and e3 - s3 >= 84:
                            w = int.from_bytes(payload[s3 + 76 : s3 + 80], "big") >> 16
                            h = int.from_bytes(payload[s3 + 80 : s3 + 84], "big") >> 16
        return "mp4", w, h, dur
    return "unknown", None, None, None


def _le32(c):
    h = F.lpad(F.hex(c.cast("bigint")), 8, "0")
    return F.unhex(F.concat(F.substring(h, 7, 2), F.substring(h, 5, 2),
                            F.substring(h, 3, 2), F.substring(h, 1, 2)))


def _le16(c):
    h = F.lpad(F.hex(c.cast("bigint")), 4, "0")
    return F.unhex(F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2)))


def _be32(c):
    return F.unhex(F.lpad(F.hex(c.cast("bigint")), 8, "0"))


# id-derived synthesis rules, shared with the SQL oracle (the parser must
# recover exactly these values from the assembled container bytes)
WAV_SR = "8000 + (id % 8) * 1000"           # mono 16-bit -> byte_rate = sr*2
MP4_DUR = "(id * 37) % 5000 + 250"
MP4_W = "id % 1920 + 16"
MP4_H = "(id * 3) % 1080 + 16"


def synthesize_wav(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic audio fixture: a VALID canonical-layout WAV whose
    fmt-chunk fields derive from the id and whose data chunk is the utf-8
    text bytes.  JVM-side hex/unhex assembly — no Python."""
    i = F.col(id_col)
    sr = (i % 8) * 1000 + 8000
    data = F.encode(F.col(text_col), "utf-8")
    ds = F.octet_length(data)
    payload = F.concat(
        F.encode(F.lit("RIFF"), "utf-8"), _le32(ds + 36),
        F.encode(F.lit("WAVEfmt "), "utf-8"), _le32(F.lit(16)),
        _le16(F.lit(1)), _le16(F.lit(1)),              # PCM, mono
        _le32(sr), _le32(sr * 2),                      # sample rate, byte rate
        _le16(F.lit(2)), _le16(F.lit(16)),             # block align, bits
        F.encode(F.lit("data"), "utf-8"), _le32(ds), data,
    )
    return df.select(
        i.alias("media_id"), F.lit("audio").alias("kind"),
        payload.alias("payload"), F.lit("audio/wav").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.floor(ds * 1000 / (sr * 2)).cast("int").alias("duration_ms"),
    )


def synthesize_mp4(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic video fixture: minimal ISO-BMFF with ftyp, a moov
    carrying mvhd (timescale 1000, id-derived duration) and trak/tkhd
    (id-derived 16.16 dimensions), and the text bytes as mdat."""
    i = F.col(id_col)
    dur = (i * 37) % 5000 + 250
    w = i % 1920 + 16
    h = (i * 3) % 1080 + 16
    data = F.encode(F.col(text_col), "utf-8")
    ds = F.octet_length(data)
    zeros = lambda n: F.unhex(F.lit("00" * n))  # noqa: E731
    mvhd = F.concat(                      # size 108 = 8 hdr + 100 body
        _be32(F.lit(108)), F.encode(F.lit("mvhd"), "utf-8"),
        zeros(12), _be32(F.lit(1000)), _be32(dur), zeros(80),
    )
    tkhd = F.concat(                      # size 92 = 8 hdr + 84 body
        _be32(F.lit(92)), F.encode(F.lit("tkhd"), "utf-8"),
        zeros(76), _be32(w * 65536), _be32(h * 65536),
    )
    trak = F.concat(_be32(F.lit(100)), F.encode(F.lit("trak"), "utf-8"), tkhd)
    moov = F.concat(_be32(F.lit(216)), F.encode(F.lit("moov"), "utf-8"), mvhd, trak)
    ftyp = F.concat(_be32(F.lit(16)), F.encode(F.lit("ftypisom"), "utf-8"),
                    _be32(F.lit(0)))
    mdat = F.concat(_be32(ds + 8), F.encode(F.lit("mdat"), "utf-8"), data)
    payload = F.concat(ftyp, moov, mdat)
    return df.select(
        i.alias("media_id"), F.lit("video").alias("kind"),
        payload.alias("payload"), F.lit("video/mp4").alias("mime"),
        w.cast("int").alias("width"), h.cast("int").alias("height"),
        dur.cast("int").alias("duration_ms"),
    )


def extract_av_features(df: DataFrame) -> DataFrame:
    """mapInPandas header extraction for audio/video payloads (iterator
    form, one Arrow batch in flight).  Dispatches on the `kind` column;
    always real decode — there is no fake tier for containers because the
    stdlib parsers have no dependencies to stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, srs, ws, hs, durs, nbs = [], [], [], [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                nbs.append(len(b))
                if kind == "audio":
                    fmt, sr, dur = decode_audio_meta(b)
                    w = h = None
                else:
                    fmt, w, h, dur = decode_video_meta(b)
                    sr = None
                fmts.append(fmt)
                srs.append(sr)
                ws.append(w)
                hs.append(h)
                durs.append(dur)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": nbs,
                "format": fmts,
                "sample_rate": pd.array(srs, dtype="Int32"),
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "duration_ms": pd.array(durs, dtype="Int32"),
            })

    return df.mapInPandas(run, schema=AV_FEATURE_SCHEMA)


# --- pixel tier: real PNG decode, zero dependencies -------------------------
#
# The reference treats media as opaque bytes; a training-data pipeline needs
# at least one REAL sample-level decode path.  PNG is fully decodable with
# the stdlib (zlib inflate + per-scanline unfilter), so the pixel tier is
# implemented here for real — PIL/pillow remains the swap-in for JPEG and
# friends via _decode_pixels' fallback.

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png(width: int, height: int, pixels: bytes,
               color_type: int = 0) -> bytes:
    """Minimal REAL PNG encoder (stdlib zlib + crc32): 8-bit depth, filter
    type 0 on every scanline, one IDAT.  `pixels` is row-major
    width*height*channels bytes.  Fixture builder for the pixel-decode
    tests — any standards-compliant reader decodes its output."""
    import struct
    import zlib
    from binascii import crc32

    ch = _PNG_CHANNELS[color_type]
    if len(pixels) != width * height * ch:
        raise ValueError(
            f"pixels length {len(pixels)} != {width}x{height}x{ch}")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * ch
    raw = b"".join(
        b"\x00" + pixels[y * stride:(y + 1) * stride] for y in range(height)
    )
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def decode_png_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL stdlib PNG pixel decode: (width, height, channels, pixel bytes).

    Walks chunks, inflates the concatenated IDAT stream, and reverses all
    five scanline filters (None/Sub/Up/Average/Paeth).  Supports 8-bit
    depth, color types 0/2/3/4/6 (palette resolved through PLTE), no
    interlacing.  Raises ValueError on anything else — the caller decides
    whether to fall back to PIL."""
    import zlib

    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    i, w = 8, None
    idat, plte = [], None
    while i + 8 <= len(payload):
        size = int.from_bytes(payload[i:i + 4], "big")
        tag = payload[i + 4:i + 8]
        data = payload[i + 8:i + 8 + size]
        if tag == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, color, _comp, _filt, interlace = data[8:13]
            if depth != 8 or color not in _PNG_CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color}, "
                    f"interlace={interlace})")
        elif tag == b"PLTE":
            plte = data
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        i += 12 + size
    if w is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    raw = zlib.decompress(b"".join(idat))
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel payload size mismatch")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ftype == 1:      # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ftype == 2:    # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:    # Average
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:    # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    if color == 3:
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        rgb = bytearray(h * w * 3)
        for j, idx in enumerate(out):
            rgb[j * 3:j * 3 + 3] = plte[idx * 3:idx * 3 + 3]
        return w, h, 3, bytes(rgb)
    return w, h, ch, bytes(out)


PIXEL_STATS_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("n_pixels", LongType()),
    StructField("px_sum", LongType()),
    StructField("px_min", IntegerType()),
    StructField("px_max", IntegerType()),
])


def synthesize_png_images(df: DataFrame, id_col: str = "doc_id",
                          max_dim: int = 32,
                          pattern: str = "gradient") -> DataFrame:
    """Deterministic REAL-PNG fixture: each row becomes a grayscale PNG
    with width = id % max_dim + 8, height = (id * 7) % max_dim + 8 and an
    id-derived pixel rule plain SQL can recompute per cell, so
    sample-level decode is value-checkable end to end.

    ``pattern="gradient"``: pixel(x, y) = (id + x + 7y) % 256 — the
    x_multimodal_pixels rule (every image shares the same diagonal
    structure, which makes global stats interesting but perceptual
    hashes degenerate).  ``pattern="mixed"``: pixel(x, y) =
    ((id+1)(x + 3y) + xy) % 256 — per-id slopes, so images are
    perceptually DIVERSE and only ids congruent mod 256 (identical
    payloads) plus a small true near-dup tail collide under dHash.
    Assembly needs zlib, hence mapInPandas (Python) — this is a fixture
    generator, not a production scan path."""

    def px_val(i: int, x: int, y: int) -> int:
        if pattern == "mixed":
            return ((i + 1) * (x + 3 * y) + x * y) % 256
        return (i + x + 7 * y) % 256

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf[id_col]:
                i = int(i)
                w = i % max_dim + 8
                h = (i * 7) % max_dim + 8
                px = bytes((px_val(i, x, y)
                            for y in range(h) for x in range(w)))
                ids.append(i)
                payloads.append(encode_png(w, h, px, color_type=0))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(
        run, schema="media_id long, payload binary")


def pixel_stats(df: DataFrame) -> DataFrame:
    """Sample-level image statistics via REAL pixel decode (mapInPandas,
    iterator form — one Arrow batch of payloads in flight per task):
    (media_id, width, height, channels, n_pixels, px_sum, px_min,
    px_max).  Integer-exact outputs so the cross-engine oracle compares
    without float-rounding conventions.  Uses the stdlib PNG decoder;
    non-PNG payloads raise into _decode_pixels' PIL fallback."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "width", "height",
                                    "channels", "n_pixels", "px_sum",
                                    "px_min", "px_max")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                w, h, ch, px = decode_png_pixels(b)
                rows["media_id"].append(int(mid))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(ch)
                rows["n_pixels"].append(w * h)
                rows["px_sum"].append(sum(px))
                rows["px_min"].append(min(px))
                rows["px_max"].append(max(px))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=PIXEL_STATS_SCHEMA)


def image_dhash(df: DataFrame, grid: int = 7) -> DataFrame:
    """(media_id, dhash): perceptual difference-hash over REAL decoded
    pixels — the image-space member of the dedup family.

    The decoded image is box-pooled onto a (grid+1) x grid brightness
    grid with integer cell assignment (col = x*(grid+1)//w, row =
    y*grid//h), and bit (r, c) is set when cell (r, c+1) is brighter
    than cell (r, c).  The comparison is done on cross-multiplied
    integer sums (s_right * n_left > s_left * n_right) so there is no
    float rounding anywhere — the cross-engine oracle recomputes the
    identical hash from the synthesis rule.  grid=7 packs 49 bits into
    a BIGINT and needs min dim >= 8, which the fixture guarantees.

    Perceptual property: brightness shifts and mild noise leave most
    gradient signs unchanged, so near-identical images land within a
    few hamming bits — pair them with image_neardup_pairs.
    """
    cols = grid + 1

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, px = decode_png_pixels(bytes(payload))
                a = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                if ch > 1:
                    a = a.reshape(h, w, ch).sum(axis=2).reshape(-1)
                x = np.arange(w * h) % w
                y = np.arange(w * h) // w
                cell = (y * grid // h) * cols + (x * cols // w)
                s = np.bincount(cell, weights=a, minlength=grid * cols)
                n = np.bincount(cell, minlength=grid * cols)
                s = s.reshape(grid, cols).astype(np.int64)
                n = n.reshape(grid, cols).astype(np.int64)
                bits = (s[:, 1:] * n[:, :-1]) > (s[:, :-1] * n[:, 1:])
                dh = 0
                for r in range(grid):
                    for c in range(grid):
                        if bits[r, c]:
                            dh |= 1 << (r * grid + c)
                ids.append(int(mid))
                hashes.append(dh)
            yield pd.DataFrame({"media_id": ids, "dhash": hashes})

    return df.mapInPandas(run, schema="media_id long, dhash long")


def image_neardup_pairs(
    df: DataFrame, max_hamming: int = 4, grid: int = 7, blocks: int = 7,
) -> DataFrame:
    """(a, b, hamming): near-duplicate image pairs by dHash with
    pigeonhole block joins — split the grid*grid-bit hash into `blocks`
    segments; pairs within max_hamming <= blocks-1 share at least one
    exact segment, so the join is an equi-join on (segment, value) and
    recall at the threshold is EXACT, never probabilistic (same blocking
    as simhash_pairs)."""
    if max_hamming > blocks - 1:
        raise ValueError("blocking is exhaustive only for "
                         "max_hamming <= blocks - 1")
    total_bits = grid * grid
    seg_bits = (total_bits + blocks - 1) // blocks
    mask = (1 << seg_bits) - 1
    dh = image_dhash(df, grid).transform(barrier, eager=False)
    seg = dh.select(
        F.col("media_id").alias("_id"), "dhash",
        F.posexplode(F.expr(
            f"transform(sequence(0, {blocks - 1}), "
            f"b -> shiftright(`dhash`, b * {seg_bits}) & {mask}L)"
        )).alias("_seg", "_segval"),
    )
    l, r = seg.alias("l"), seg.alias("r")
    cand = (
        l.join(r, on=["_seg", "_segval"])
        .filter(F.col("l._id") < F.col("r._id"))
        .select(F.col("l._id").alias("a"), F.col("r._id").alias("b"),
                F.col("l.dhash").alias("_da"), F.col("r.dhash").alias("_db"))
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("_da").bitwiseXOR(F.col("_db"))).cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def resize_image(df: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """(media_id, width, height, thumb): box-average downscale of REAL
    decoded pixels to out_w x out_h — the thumbnail/normalize step of an
    image-training pipeline (vision encoders consume fixed grids).

    Deterministic integer arithmetic end to end: cell value =
    floor(sum / count) over the box x*out_w//w, y*out_h//h, so the
    cross-engine oracle reproduces every thumb byte exactly from the
    synthesis rule.  Decode + pool is one Arrow stage (mapInPandas,
    iterator form), no shuffle at all; at scale this pipelines with the
    media scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, ws, hs, thumbs = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, px = decode_png_pixels(bytes(payload))
                a = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                if ch > 1:
                    a = a.reshape(h, w, ch).sum(axis=2).reshape(-1) // ch
                x = np.arange(w * h) % w
                y = np.arange(w * h) // w
                cell = (y * out_h // h) * out_w + (x * out_w // w)
                s = np.bincount(cell, weights=a, minlength=out_w * out_h)
                n = np.bincount(cell, minlength=out_w * out_h)
                ids.append(int(mid))
                ws.append(w)
                hs.append(h)
                thumbs.append((s.astype(np.int64) // n).tolist())
            yield pd.DataFrame({"media_id": ids, "width": ws, "height": hs,
                                "thumb": thumbs})

    return df.mapInPandas(
        run, schema="media_id long, width int, height int, thumb array<long>")


def audio_fingerprint(df: DataFrame, windows: int = 16) -> DataFrame:
    """(media_id, n_samples, fp): energy-delta fingerprint over REAL
    decoded WAV samples — the audio member of the perceptual-dedup
    family (dHash's 1-D twin).

    The RIFF chunks are walked to the data chunk, samples decode as
    16-bit little-endian PCM (trailing odd byte dropped), sample k maps
    to window k*windows//n, and bit w of the fingerprint is set when
    window w+1 carries more energy (sum of squared samples — exact
    int64) than window w.  fp is NULL when n_samples < windows (not
    enough signal to window).  Identical audio payloads produce
    identical fingerprints, so exact dedup is a groupBy on fp."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, ns, fps = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                data = _wav_data_chunk(b)
                n = len(data) // 2
                ids.append(int(mid))
                ns.append(n)
                if n < windows:
                    fps.append(None)
                    continue
                s = np.frombuffer(data[: 2 * n], dtype="<i2").astype(np.int64)
                w = np.arange(n) * windows // n
                # int64 accumulate (np.add.at), not float bincount weights:
                # energy sums must stay exact past 2^53 for long audio
                e = np.zeros(windows, dtype=np.int64)
                np.add.at(e, w, s * s)
                fp = 0
                for i in range(windows - 1):
                    if e[i + 1] > e[i]:
                        fp |= 1 << i
                fps.append(fp)
            yield pd.DataFrame({"media_id": ids, "n_samples": ns, "fp": fps})

    return df.mapInPandas(
        run, schema="media_id long, n_samples long, fp long")


def _wav_data_chunk(payload: bytes) -> bytes:
    """Raw bytes of the first RIFF 'data' chunk (real chunk walk, not a
    fixed-offset assumption)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    while i + 8 <= len(payload):
        tag = payload[i:i + 4]
        size = int.from_bytes(payload[i + 4:i + 8], "little")
        if tag == b"data":
            return payload[i + 8:i + 8 + size]
        i += 8 + size + (size & 1)
    raise ValueError("no data chunk")


def video_fingerprint(df: DataFrame, frame_bytes: int = 16,
                      windows: int = 16) -> DataFrame:
    """(media_id, n_frames, fp): temporal brightness-delta fingerprint
    over a REAL ISO-BMFF walk — the video member of the perceptual-dedup
    family (image dHash = spatial gradient signs; audio = windowed
    energy deltas; this = frame-brightness deltas over time).

    The mdat box is located by walking the box tree (never a fixed
    offset), its payload splits into frame_bytes-sized 'frames'
    (trailing partial frame dropped), each frame's brightness is the
    exact integer sum of its bytes, frames pool onto `windows` temporal
    windows (f*windows//n), and bit w is set when window w+1 is
    brighter than window w — with exact cross-multiplied integer means
    since windows can hold different frame counts.  fp is NULL when
    n_frames < windows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, ns, fps = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                data = _mdat_payload(b)
                n = len(data) // frame_bytes
                ids.append(int(mid))
                ns.append(n)
                if n < windows:
                    fps.append(None)
                    continue
                a = np.frombuffer(data[: n * frame_bytes], dtype=np.uint8)
                bright = a.reshape(n, frame_bytes).sum(axis=1,
                                                       dtype=np.int64)
                w = np.arange(n) * windows // n
                s = np.zeros(windows, dtype=np.int64)
                c = np.zeros(windows, dtype=np.int64)
                np.add.at(s, w, bright)
                np.add.at(c, w, 1)
                fp = 0
                for i in range(windows - 1):
                    if s[i + 1] * c[i] > s[i] * c[i + 1]:
                        fp |= 1 << i
                fps.append(fp)
            yield pd.DataFrame({"media_id": ids, "n_frames": ns, "fp": fps})

    return df.mapInPandas(
        run, schema="media_id long, n_frames long, fp long")


def _mdat_payload(payload: bytes) -> bytes:
    """Raw bytes of the first top-level mdat box (real box walk)."""
    for tag, s, e in _iter_boxes(payload, 0, len(payload)):
        if tag == b"mdat":
            return payload[s:e]
    raise ValueError("no mdat box")


def build_dhash_index(corpus: DataFrame, grid: int = 7,
                      blocks: int = 7) -> DataFrame:
    """Persistable perceptual index over a media corpus:
    (corpus_id, _seg, _segval, _dh) — each image's dHash split into
    pigeonhole segments, the image-space twin of
    dedup.build_minhash_index.  Write it bucketed by (_seg, _segval) and
    append each day's batch so tomorrow's probe joins co-located."""
    total_bits = grid * grid
    seg_bits = (total_bits + blocks - 1) // blocks
    mask = (1 << seg_bits) - 1
    return image_dhash(corpus, grid).select(
        F.col("media_id").alias("corpus_id"),
        F.col("dhash").alias("_dh"),
        F.posexplode(F.expr(
            f"transform(sequence(0, {blocks - 1}), "
            f"b -> shiftright(`dhash`, b * {seg_bits}) & {mask}L)"
        )).alias("_seg", "_segval"),
    )


def image_dedup_against_corpus(
    new_media: DataFrame,
    index: DataFrame,
    max_hamming: int = 4,
    grid: int = 7,
    blocks: int = 7,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Rows of `new_media` that are NOT perceptual near-duplicates
    (dHash hamming <= max_hamming) of any indexed corpus image.

    Scale shape mirrors dedup.probe_minhash_index: the (small) batch
    side's segments broadcast and the corpus-scale index is probed in
    place; recall at the threshold is exact by pigeonhole
    (max_hamming <= blocks-1).  Pass broadcast_batch=False for
    backfill-sized batches."""
    if max_hamming > blocks - 1:
        raise ValueError("blocking is exhaustive only for "
                         "max_hamming <= blocks - 1")
    nb = build_dhash_index(new_media, grid, blocks).select(
        F.col("corpus_id").alias("_new_id"),
        F.col("_dh").alias("_ndh"), "_seg", "_segval")
    probe = index.join(
        F.broadcast(nb) if broadcast_batch else nb, ["_seg", "_segval"])
    dupes = (
        probe.withColumn(
            "_ham", F.bit_count(F.col("_dh").bitwiseXOR(F.col("_ndh"))))
        .filter(F.col("_ham") <= max_hamming)
        .select(F.col("_new_id").alias("media_id"))
        .distinct()
    )
    return new_media.join(dupes, "media_id", "left_anti")
