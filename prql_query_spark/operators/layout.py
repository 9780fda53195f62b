"""Data-layout operators: multi-dimensional clustering (Z-order).

Sorting a table by one column gives parquet row-group min/max stats that
prune scans on THAT column only; a query filtering on a second column reads
everything.  Z-ordering interleaves the bits of several normalized columns
into one sort key so each file covers a small hyper-rectangle of the value
space — min/max stats then prune on EVERY clustered column (the same trick
Delta's OPTIMIZE ZORDER BY applies).

Everything is expression-level: the per-column ranges come from one scalar
aggregate broadcast back into the plan (no driver collect), normalization
and bit interleaving are built-in integer ops, and the write is
repartitionByRange + sortWithinPartitions so each output file holds one
contiguous z-range.  At 100 TB this is the compaction job that makes ad-hoc
slicing on (lang, source, date) cheap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(norms: list[Column], bits: int) -> Column:
    """Interleave `bits` low bits of each normalized int column (morton
    code). Built as a chain of shift/or — pure JVM integer ops."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, n in enumerate(norms):
            bit = F.shiftright(n, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(norms) + j))
    return z


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 12, key_col: str = "_zkey"
) -> DataFrame:
    """Add a morton z-key over `cols` (numeric). Ranges are computed by one
    global aggregate and broadcast — the whole thing is one extra reduce,
    no collect, no UDF."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast("double").alias(f"_zmin_{c}"),
            F.max(c).cast("double").alias(f"_zmax_{c}"),
        ]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    top = (1 << bits) - 1
    norms = []
    for c in cols:
        lo, hi = F.col(f"_zmin_{c}"), F.col(f"_zmax_{c}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        norms.append(
            F.least(
                F.lit(top),
                F.floor((F.col(c).cast("double") - lo) / span * top).cast("long"),
            )
        )
    return out.withColumn(key_col, _interleave(norms, bits)).drop(
        *[f"_zmin_{c}" for c in cols], *[f"_zmax_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 12,
) -> None:
    """Cluster by z-key and write parquet: range-partition on the key so
    each file owns a contiguous z-range (a tile of the value space), sort
    within partitions so row groups inside a file are tight too."""
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_for_parallelism(
    spark,
    src: str,
    dst: str,
    target_partitions: int | None = None,
) -> str:
    """Rewrite a parquet source into `target_partitions` files so scans
    parallelize.

    Spark splits parquet at ROW-GROUP granularity: a file written as one
    big row group (pandas/pyarrow default for small tables) is forever a
    single scan task no matter how many cores the cluster has — measured
    at sf0.1 this serializes a 3-column lineitem scan at 87 ms where the
    32-file layout runs it in 47 ms, and the whole Q5 join pipeline drops
    ~15% (SCALING.md round 3).  This is the compaction/layout job every
    real warehouse runs (Delta OPTIMIZE, Iceberg rewrite_data_files); at
    100 TB the same operator bounds file count per partition instead.

    Round-robin repartition — no ordering contract on the output; use
    write_zordered when downstream pruning wants clustering.  Returns
    `dst` for chaining into a re-register.
    """
    from prql_query_spark.engine.sources import load_parquet

    n = target_partitions or spark.sparkContext.defaultParallelism
    df = load_parquet(spark, src)
    df.repartition(n).write.mode("overwrite").parquet(dst)
    return dst


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    content_cols: dict[str, str],
    docs_per_shard: int = 1000,
) -> DataFrame:
    """WebDataset-style tar shards: the delivery format sequential
    training loaders actually stream (one `shard-%06d.tar` per task, each
    sample a group of `{key}.{ext}` members in insertion order).

    ``content_cols`` maps column -> member extension (`{"text": "txt",
    "image_bytes": "png"}`); string columns are UTF-8 encoded, binary
    columns written as-is, NULLs skipped.  Sharding is deterministic:
    samples are range-partitioned by the key, sorted within shards, and
    shard ids derive from the partition id — same input, same shards,
    any cluster size.  Each EXECUTOR writes its own tar via mapInPandas
    (the driver never sees sample bytes); the returned manifest
    DataFrame (shard, n_samples, n_bytes) is tiny.
    """
    import math
    import os

    os.makedirs(path, exist_ok=True)
    n = df.count()
    n_shards = max(1, math.ceil(n / docs_per_shard))
    cols = [key_col, *content_cols]
    prepped = (
        df.select(*cols)
        .repartitionByRange(n_shards, F.col(key_col))
        .sortWithinPartitions(key_col)
    )

    exts = dict(content_cols)

    def write_shards(batches):
        import io
        import tarfile

        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        shard_path = os.path.join(path, f"shard-{pid:06d}.tar")
        buf = io.BytesIO()
        n_samples = 0
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for pdf in batches:
                for _, row in pdf.iterrows():
                    key = str(row[key_col])
                    for col, ext in exts.items():
                        v = row[col]
                        if v is None:
                            continue
                        data = v.encode("utf-8") if isinstance(v, str) \
                            else bytes(v)
                        info = tarfile.TarInfo(name=f"{key}.{ext}")
                        info.size = len(data)
                        info.mtime = 0  # deterministic archives
                        tar.addfile(info, io.BytesIO(data))
                    n_samples += 1
        payload = buf.getvalue()
        if n_samples:
            with open(shard_path, "wb") as fh:
                fh.write(payload)
            yield pd.DataFrame({"shard": [os.path.basename(shard_path)],
                                "n_samples": [n_samples],
                                "n_bytes": [len(payload)]})

    return prepped.mapInPandas(
        write_shards, "shard string, n_samples long, n_bytes long")


def read_webdataset(
    spark, path: str, exts: dict[str, str], key_name: str = "key"
) -> DataFrame:
    """Ingest WebDataset tar shards back into a DataFrame: one task per
    shard (binaryFile source), members grouped by sample key, each
    requested extension a column (`exts` maps extension -> column name;
    missing members yield NULL).  Text-ish extensions (txt/json) decode
    to string, everything else stays binary.  The inverse of
    `write_webdataset`, and the ingest path for shards produced by any
    other WebDataset writer."""
    import io
    import tarfile

    text_exts = {"txt", "json", "html", "md", "csv"}
    fields = ", ".join(
        f"{col} {'string' if ext in text_exts else 'binary'}"
        for ext, col in exts.items()
    )
    schema = f"{key_name} string, {fields}"

    files = spark.read.format("binaryFile").load(
        path.rstrip("/") + "/*.tar")

    def untar(batches):
        import pandas as pd

        for pdf in batches:
            samples: dict[str, dict] = {}
            for content in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    for m in tar.getmembers():
                        if "." not in m.name:
                            continue
                        key, ext = m.name.rsplit(".", 1)
                        if ext not in exts:
                            continue
                        data = tar.extractfile(m).read()
                        col = exts[ext]
                        samples.setdefault(key, {})[col] = (
                            data.decode("utf-8") if ext in text_exts else data
                        )
            keys = sorted(samples)
            out = {key_name: keys}
            for ext, col in exts.items():
                out[col] = [samples[k].get(col) for k in keys]
            yield pd.DataFrame(out)

    return files.select("content").mapInPandas(untar, schema)
