"""Pure-Python Avro object-container codec: the connector-less path for
`.avro` sources (and a writer for round-trip tests / small sinks).

The reference CLI declares Avro support but panics `unimplemented!` on
use (/root/reference/src/backends/datafusion.rs:47-49); Spark reads it
only with the spark-avro jar, absent here.  The format itself (Avro
1.11 spec, public) is small: a header (`Obj\\x01` magic, a string->bytes
metadata map carrying the writer schema JSON and codec, a 16-byte sync
marker) followed by blocks of `count, byte-size, payload, sync`, where
the payload is records binary-encoded in writer-schema field order —
zigzag-varint ints/longs, little-endian float/double, length-prefixed
bytes/strings, index-prefixed unions/enums, block-encoded arrays/maps.

Scale shape: `read_avro` decodes ON THE EXECUTORS — one task per file
via Spark's binaryFile source feeding `mapInPandas` (Arrow batches out),
so a directory of Avro part-files parallelizes exactly like the jar
path.  The driver never materializes rows.  Supported codecs: null and
deflate (stdlib zlib), plus snappy when python-snappy is importable;
schema resolution is writer-schema-only (no reader-schema evolution) —
the honest subset, loudly enforced.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType, BinaryType, BooleanType, DataType, DateType, DoubleType,
    FloatType, IntegerType, LongType, MapType, StringType, StructField,
    StructType, TimestampType,
)

MAGIC = b"Obj\x01"


class AvroError(ValueError):
    pass


# ---------------------------------------------------------------------------
# binary primitives


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (Avro int and long share the encoding)."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise AvroError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1 | 1)
    # equivalent zigzag for arbitrary python ints:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise AvroError("truncated bytes")
    return data


# ---------------------------------------------------------------------------
# schema-driven decode/encode


def _decode(schema, buf: io.BytesIO):
    if isinstance(schema, list):  # union: index-prefixed
        idx = _read_long(buf)
        return _decode(schema[idx], buf)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: _decode(f["type"], buf) for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:  # block with byte size (skippable form)
                    _read_long(buf)
                    n = -n
                out.extend(_decode(schema["items"], buf) for _ in range(n))
            return out
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = _decode(schema["values"], buf)
            return out
        if t == "enum":
            return schema["symbols"][_read_long(buf)]
        if t == "fixed":
            return buf.read(schema["size"])
        return _decode(t, buf)  # {"type": "string", ...} primitive wrapper
    # primitive by name
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode("utf-8")
    raise AvroError(f"unsupported avro type {schema!r}")


def _encode(schema, value, out: bytearray) -> None:
    if isinstance(schema, list):
        # union: pick the first branch the value fits ("null" for None)
        for i, branch in enumerate(schema):
            if (value is None) == (branch == "null"):
                _write_long(out, i)
                _encode(branch, value, out)
                return
        raise AvroError(f"no union branch for {value!r} in {schema!r}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode(f["type"], value[f["name"]], out)
            return
        if t == "array":
            if value:
                _write_long(out, len(value))
                for v in value:
                    _encode(schema["items"], v, out)
            _write_long(out, 0)
            return
        if t == "map":
            if value:
                _write_long(out, len(value))
                for k, v in value.items():
                    kb = k.encode("utf-8")
                    _write_long(out, len(kb))
                    out.extend(kb)
                    _encode(schema["values"], v, out)
            _write_long(out, 0)
            return
        if t == "enum":
            _write_long(out, schema["symbols"].index(value))
            return
        if t == "fixed":
            out.extend(value)
            return
        return _encode(t, value, out)
    if schema == "null":
        return
    if schema == "boolean":
        out.append(1 if value else 0)
        return
    if schema in ("int", "long"):
        _write_long(out, int(value))
        return
    if schema == "float":
        out.extend(struct.pack("<f", value))
        return
    if schema == "double":
        out.extend(struct.pack("<d", value))
        return
    if schema == "bytes":
        _write_long(out, len(value))
        out.extend(value)
        return
    if schema == "string":
        b = value.encode("utf-8")
        _write_long(out, len(b))
        out.extend(b)
        return
    raise AvroError(f"unsupported avro type {schema!r}")


# ---------------------------------------------------------------------------
# container files


def _decompress(codec: str, payload: bytes) -> bytes:
    if codec in ("null", ""):
        return payload
    if codec == "deflate":
        return zlib.decompress(payload, -15)  # raw deflate per spec
    if codec == "snappy":
        try:
            import snappy  # optional

            return snappy.decompress(payload[:-4])  # 4-byte CRC suffix
        except ImportError as e:
            raise AvroError(
                "avro block uses snappy; python-snappy is not installed"
            ) from e
    raise AvroError(f"unsupported avro codec {codec!r}")


def _read_header(buf) -> tuple[dict, str, bytes]:
    """(writer schema, codec, sync marker) from an Avro object-container
    stream, parsing ONLY the header — stops before the first data block.

    Works on any file-like (open file handle or BytesIO), so the driver
    can learn the schema of a multi-GB part-file by reading a few KB
    instead of decompressing every block (round-3 ADVICE: read_avro used
    to decode_container() the whole first file driver-side)."""
    if buf.read(4) != MAGIC:
        raise AvroError("not an avro object container (bad magic)")
    meta = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    return schema, codec, sync


def decode_container(data: bytes) -> tuple[dict, list]:
    """(writer schema, records) from one Avro object-container file."""
    buf = io.BytesIO(data)
    schema, codec, sync = _read_header(buf)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        count = _read_long(buf)
        size = _read_long(buf)
        block = io.BytesIO(_decompress(codec, buf.read(size)))
        records.extend(_decode(schema, block) for _ in range(count))
        if buf.read(16) != sync:
            raise AvroError("sync marker mismatch (corrupt block)")
    return schema, records


def encode_container(schema: dict, records: list, codec: str = "deflate") -> bytes:
    """One Avro object-container file for ``records`` under ``schema``."""
    import os as _os

    sync = _os.urandom(16)
    out = bytearray()
    out.extend(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_long(out, len(kb))
        out.extend(kb)
        _write_long(out, len(v))
        out.extend(v)
    _write_long(out, 0)
    out.extend(sync)
    payload = bytearray()
    for r in records:
        _encode(schema, r, payload)
    body = bytes(payload)
    if codec == "deflate":
        co = zlib.compressobj(wbits=-15)
        body = co.compress(body) + co.flush()
    elif codec != "null":
        raise AvroError(f"writer supports null/deflate, not {codec!r}")
    _write_long(out, len(records))
    _write_long(out, len(body))
    out.extend(body)
    out.extend(sync)
    return bytes(out)


# ---------------------------------------------------------------------------
# Avro schema -> Spark schema


def _spark_type(schema) -> tuple[DataType, bool]:
    """(spark type, nullable) for an Avro type."""
    if isinstance(schema, list):
        branches = [b for b in schema if b != "null"]
        if len(branches) != 1:
            raise AvroError(f"only 2-branch null unions supported: {schema!r}")
        t, _ = _spark_type(branches[0])
        return t, True
    if isinstance(schema, dict):
        t = schema["type"]
        lt = schema.get("logicalType")
        if lt == "date":
            return DateType(), False
        if lt in ("timestamp-millis", "timestamp-micros"):
            return TimestampType(), False
        if t == "record":
            return StructType([
                StructField(f["name"], *_spark_type(f["type"]))
                for f in schema["fields"]
            ]), False
        if t == "array":
            it, n = _spark_type(schema["items"])
            return ArrayType(it, containsNull=n), False
        if t == "map":
            vt, n = _spark_type(schema["values"])
            return MapType(StringType(), vt, valueContainsNull=n), False
        if t == "enum":
            return StringType(), False
        if t == "fixed":
            return BinaryType(), False
        return _spark_type(t)
    return {
        "boolean": BooleanType(), "int": IntegerType(), "long": LongType(),
        "float": FloatType(), "double": DoubleType(),
        "bytes": BinaryType(), "string": StringType(),
    }[schema], schema == "null"


def _convert(schema, value):
    """Post-decode conversion for logical types (epoch ints -> datetime)."""
    import datetime

    if value is None:
        return None
    if isinstance(schema, list):
        branches = [b for b in schema if b != "null"]
        return _convert(branches[0], value)
    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        if lt == "date":
            return datetime.date(1970, 1, 1) + datetime.timedelta(days=value)
        if lt == "timestamp-millis":
            return datetime.datetime.utcfromtimestamp(value / 1000)
        if lt == "timestamp-micros":
            return datetime.datetime.utcfromtimestamp(value / 1_000_000)
        t = schema["type"]
        if t == "record":
            return {f["name"]: _convert(f["type"], value[f["name"]])
                    for f in schema["fields"]}
        if t == "array":
            return [_convert(schema["items"], v) for v in value]
        if t == "map":
            return {k: _convert(schema["values"], v) for k, v in value.items()}
        if t in ("enum", "fixed"):
            return value
        return _convert(t, value)
    return value


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro scan without the spark-avro jar: one task per
    file (binaryFile source), pure-Python block decode inside
    mapInPandas, Arrow batches out."""
    import glob
    import os

    # schema comes from the first file (all part-files share it)
    first = path
    if os.path.isdir(path):
        cands = sorted(glob.glob(os.path.join(path, "*.avro"))) or sorted(
            glob.glob(os.path.join(path, "part-*")))
        if not cands:
            raise AvroError(f"no avro files under {path}")
        first = cands[0]
    # header-only read: schema lives in the container metadata, so the
    # driver never decompresses a data block (a part-file can be GBs)
    with open(first, "rb") as fh:
        schema, _codec, _sync = _read_header(fh)
    spark_schema, _n = _spark_type(schema)
    if not isinstance(spark_schema, StructType):
        raise AvroError("top-level avro schema must be a record")

    files = spark.read.format("binaryFile").load(
        path if os.path.isdir(path) else first)

    def decode_files(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                s, recs = decode_container(bytes(content))
                rows.extend(_convert(s, r) for r in recs)
            yield pd.DataFrame(
                {f.name: [r.get(f.name) for r in rows]
                 for f in spark_schema.fields}
            )

    return files.select("content").mapInPandas(decode_files, spark_schema)


def _avro_type_of(t: DataType, nullable: bool):
    base: object
    if isinstance(t, BooleanType):
        base = "boolean"
    elif isinstance(t, IntegerType):
        base = "int"
    elif isinstance(t, LongType):
        base = "long"
    elif isinstance(t, FloatType):
        base = "float"
    elif isinstance(t, DoubleType):
        base = "double"
    elif isinstance(t, StringType):
        base = "string"
    elif isinstance(t, BinaryType):
        base = "bytes"
    elif isinstance(t, DateType):
        base = {"type": "int", "logicalType": "date"}
    elif isinstance(t, TimestampType):
        base = {"type": "long", "logicalType": "timestamp-micros"}
    elif isinstance(t, ArrayType):
        base = {"type": "array",
                "items": _avro_type_of(t.elementType, t.containsNull)}
    else:
        raise AvroError(f"avro writer cannot map spark type {t}")
    return ["null", base] if nullable else base


def _df_avro_schema(df: DataFrame) -> dict:
    return {
        "type": "record", "name": "row",
        "fields": [
            {"name": f.name, "type": _avro_type_of(f.dataType, f.nullable)}
            for f in df.schema.fields
        ],
    }


def _plain_value(v):
    """Spark/pandas cell -> avro-encodable plain python (epoch logicals)."""
    import datetime

    import numpy as _np

    if v is None or (isinstance(v, float) and v != v):
        return None
    if isinstance(v, _np.generic):
        v = v.item()
    if isinstance(v, datetime.datetime):
        return int((v.replace(tzinfo=None)
                    - datetime.datetime(1970, 1, 1)).total_seconds()
                   * 1_000_000)
    if isinstance(v, datetime.date):
        return (v - datetime.date(1970, 1, 1)).days
    if isinstance(v, (list, tuple, _np.ndarray)):
        return [_plain_value(x) for x in v]
    return v


def write_avro(df: DataFrame, path: str, codec: str = "deflate") -> None:
    """Small-sink Avro writer (collects to the driver — CLI single-file
    parity; use `write_avro_distributed` for the parallel directory
    layout)."""
    schema = _df_avro_schema(df)
    records = [
        {k: _plain_value(v) for k, v in row.asDict().items()}
        for row in df.collect()
    ]
    with open(path, "wb") as fh:
        fh.write(encode_container(schema, records, codec=codec))


def write_avro_distributed(df: DataFrame, path: str,
                           codec: str = "deflate") -> None:
    """Directory-of-part-files Avro sink, executors writing in parallel
    (one container file per partition via mapInPandas) — the scale twin
    of the single-file `write_avro`, mirroring how the jar's writer lays
    out output.  Readable back by `read_avro`'s directory scan."""
    import os

    os.makedirs(path, exist_ok=True)
    schema = _df_avro_schema(df)
    fields = [f.name for f in df.schema.fields]

    def write_parts(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        records = []
        for pdf in batches:
            for _, row in pdf.iterrows():
                records.append({k: _plain_value(row[k]) for k in fields})
        if records:
            with open(os.path.join(path, f"part-{pid:05d}.avro"), "wb") as fh:
                fh.write(encode_container(schema, records, codec=codec))
        yield pd.DataFrame({"n": [len(records)]})

    df.mapInPandas(write_parts, "n long").agg({"n": "sum"}).collect()
