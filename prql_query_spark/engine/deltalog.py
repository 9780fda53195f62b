"""Pure-Python Delta Lake table reader: the connector-less fallback.

The Delta connector jars are not deployable in every environment (this
container included), but the Delta transaction log is an open, stable
format (delta.io PROTOCOL.md): `_delta_log/%020d.json` commit files of
JSON-line actions (`metaData`, `add`, `remove`, `protocol`), optionally
compacted into `%020d.checkpoint.parquet` files referenced by
`_last_checkpoint`.  A snapshot is: latest checkpoint's state + replay
of the JSON commits after it; the active file set is adds minus removes
keyed by path; `metaData.schemaString` is a Spark StructType JSON.

So, mirroring the `pgwire.py` philosophy (reference attaches live
engines; we stay live in every environment), this module materializes a
Delta snapshot with stdlib json + `spark.read.parquet`:

* resolve the snapshot's active files (checkpoint-aware, optional time
  travel via ``version=``),
* read them with the schema the LOG declares (never inference),
* recover partition columns from the hive-style paths Delta writes
  (`basePath` trick), or from `partitionValues` literals when a
  partition produced no hive directory.

Honest limits, enforced loudly: reader protocol v1 tables only —
deletion vectors / column mapping (minReaderVersion >= 2 or
readerFeatures) raise a clear error instead of silently wrong rows.
"""

from __future__ import annotations

import json
import os
import re
import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class DeltaProtocolError(RuntimeError):
    pass


_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CHECKPOINT_RE = re.compile(r"^(\d{20})\.checkpoint(\.\d+\.\d+)?\.parquet$")


def _snapshot_actions(spark: SparkSession, log_dir: str, version: int | None):
    """Yield (metaData, protocol, {path: add}) replayed to ``version``."""
    entries = os.listdir(log_dir)
    commits = sorted(
        (int(m.group(1)), f) for f in entries if (m := _COMMIT_RE.match(f))
    )
    if not commits and not any(_CHECKPOINT_RE.match(f) for f in entries):
        raise DeltaProtocolError(f"no delta commits found in {log_dir}")

    ckpt_version = -1
    ckpt_files: list[str] = []
    lc = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(lc):
        with open(lc) as fh:
            v = json.load(fh)["version"]
        if version is None or v <= version:
            ckpt_version = v
            ckpt_files = [
                os.path.join(log_dir, f)
                for f in entries
                if (m := _CHECKPOINT_RE.match(f)) and int(m.group(1)) == v
            ]

    meta = None
    protocol = None
    adds: dict[str, dict] = {}

    if ckpt_files:
        # a checkpoint is ordinary parquet of action structs
        cp = spark.read.parquet(*ckpt_files)
        cols = set(cp.columns)
        rows = cp.select(
            *[c for c in ("metaData", "protocol", "add", "remove") if c in cols]
        ).collect()
        for r in rows:
            d = r.asDict(recursive=True)
            if d.get("metaData"):
                meta = d["metaData"]
            if d.get("protocol"):
                protocol = d["protocol"]
            if d.get("add"):
                adds[d["add"]["path"]] = d["add"]
            if d.get("remove"):
                adds.pop(d["remove"]["path"], None)

    for v, fname in commits:
        if v <= ckpt_version:
            continue
        if version is not None and v > version:
            break
        with open(os.path.join(log_dir, fname)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    meta = action["metaData"]
                elif "protocol" in action:
                    protocol = action["protocol"]
                elif "add" in action:
                    adds[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    adds.pop(action["remove"]["path"], None)
    if meta is None:
        raise DeltaProtocolError(f"delta log {log_dir} has no metaData action")
    return meta, protocol, adds


def read_delta_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a Delta table directory as a DataFrame at the latest (or a
    time-travel ``version``) snapshot — no connector jar required."""
    log_dir = os.path.join(path, "_delta_log")
    meta, protocol, adds = _snapshot_actions(spark, log_dir, version)

    if protocol:
        reader_v = protocol.get("minReaderVersion", 1) or 1
        features = protocol.get("readerFeatures") or []
        if reader_v > 1 or features:
            raise DeltaProtocolError(
                f"delta table {path} needs reader protocol v{reader_v} "
                f"(features: {features}) — deletion vectors / column mapping "
                "are not supported by the pure-Python fallback; deploy the "
                "Delta connector (--packages io.delta:delta-spark_2.13:<ver>)"
            )

    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = meta.get("partitionColumns") or []
    if not adds:
        return spark.createDataFrame([], schema)

    files = [
        os.path.join(path, urllib.parse.unquote(p)) for p in sorted(adds)
    ]
    if not part_cols:
        return spark.read.schema(schema).parquet(*files)

    # Partitioned: Delta stores partition values in the LOG, not the
    # files.  Delta's writers use hive-style `col=val/` layout, which
    # Spark's basePath option parses back into columns — with the full
    # log schema supplied, so types come from the log, not inference.
    hive_style = all(
        all(f"{c}=" in p for c in part_cols) for p in adds
    )
    if hive_style:
        return (
            spark.read.schema(schema)
            .option("basePath", path)
            .parquet(*files)
        )
    # Fallback for non-hive layouts: group files by their partition
    # values and attach them as typed literals.
    by_vals: dict[tuple, list[str]] = {}
    for p, add in adds.items():
        key = tuple((add.get("partitionValues") or {}).get(c) for c in part_cols)
        by_vals.setdefault(key, []).append(
            os.path.join(path, urllib.parse.unquote(p))
        )
    data_schema = StructType(
        [f for f in schema.fields if f.name not in part_cols]
    )
    parts = []
    for key, fs in sorted(by_vals.items()):
        df = spark.read.schema(data_schema).parquet(*fs)
        for c, raw in zip(part_cols, key):
            typ = schema[c].dataType
            df = df.withColumn(
                c, F.lit(raw).cast(typ) if raw is not None else F.lit(None).cast(typ)
            )
        parts.append(df.select([f.name for f in schema.fields]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
