"""Deduplication operators for large-scale text corpora.

All operators are DataFrame-native and shuffle-aware:

* exact dedup — one hash-shuffle on the dedup key (window, no join-back).
* MinHash+LSH — the classic shingle -> minhash -> band -> bucket-join
  pipeline.  The only shuffle is on (band, bucket-hash); candidate
  verification joins happen *within* buckets, so cost scales with bucket
  sizes, not |corpus|^2.  All hashing is JVM-side (`xxhash64`), no Python
  UDFs anywhere.
* SimHash — 64-bit sign-aggregated token hashes, computed with
  higher-order SQL functions (transform/aggregate), also fully JVM-side.
* n-gram Jaccard — exact verification on candidate pairs via
  array_intersect/array_union over distinct shingle sets.
* embedding near-dup — random-hyperplane LSH bucketing + within-bucket
  cosine (see similarity.py for the primitives).

At 100 TB: every stage is a narrow map except the band-bucket exchange,
which partitions by a high-cardinality synthetic key — no skew (bucket
explosions are capped by `max_bucket`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shingles(text_col: Column, k: int = 5) -> Column:
    """Distinct character k-shingles of a string, JVM-side."""
    t = F.lower(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))),
            lambda i: t.substr(i, F.lit(k)),
        )
    )


def dedup_exact(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Keep the first row (by order_col) per key — deterministic distinct-on.

    Single hash shuffle; Spark's window exec does a partial sort within
    partitions, no join-back needed.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_pq_rn", F.row_number().over(w))
        .filter(F.col("_pq_rn") == 1)
        .drop("_pq_rn")
    )


def minhash_signature(text_col: Column, num_perm: int = 64, k: int = 5) -> Column:
    """num_perm-wide MinHash signature over character k-shingles.

    One pass over the shingle array per permutation seed; xxhash64(s, seed)
    stays inside whole-stage codegen.
    """
    sh = shingles(text_col, k)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda p: F.array_min(F.transform(sh, lambda s: F.xxhash64(s, p))),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs (a < b) via banded MinHash LSH.

    rows_per_band = num_perm // bands; two docs collide if any band of their
    signatures matches exactly.  Returns (a, b, n_bands) distinct pairs.
    """
    rows_per_band = num_perm // bands
    sig = df.select(
        F.col(id_col).alias("_id"),
        minhash_signature(F.col(text_col), num_perm, k).alias("_sig"),
    )
    banded = sig.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",", F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band)
                    )
                ),
            )
        ).alias("_band", "_bucket"),
    )
    # cap pathological buckets (boilerplate-heavy corpora) to avoid |B|^2 blowup
    wb = Window.partitionBy("_band", "_bucket").orderBy("_id")
    banded = banded.withColumn("_bn", F.row_number().over(wb)).filter(
        F.col("_bn") <= max_bucket
    ).drop("_bn")
    l = banded.alias("l")
    r = banded.alias("r")
    pairs = (
        l.join(r, on=["_band", "_bucket"], how="inner")
        .filter(F.col("l._id") < F.col("r._id"))
        .groupBy(F.col("l._id").alias("a"), F.col("r._id").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )
    return pairs


def ngram_jaccard(
    df_pairs: DataFrame, docs: DataFrame,
    id_col: str = "doc_id", text_col: str = "text", k: int = 5,
) -> DataFrame:
    """Exact Jaccard similarity over k-shingle sets for candidate pairs.

    docs is joined twice; at scale the pair table is much smaller than the
    corpus, so both joins are plain shuffled hash joins on the id.
    """
    sh = docs.select(
        F.col(id_col).alias("_jid"), shingles(F.col(text_col), k).alias("_sh")
    )
    out = (
        df_pairs.join(sh.withColumnRenamed("_jid", "a").withColumnRenamed("_sh", "_sha"), "a")
        .join(sh.withColumnRenamed("_jid", "b").withColumnRenamed("_sh", "_shb"), "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sha", "_shb"))
            / F.size(F.array_union("_sha", "_shb")),
        )
        .drop("_sha", "_shb")
    )
    return out


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
) -> DataFrame:
    """Fuzzy dedup: drop the higher-id member of every verified near-dup pair.

    (Greedy single-pass; a connected-components pass is the round-2 upgrade
    for transitive clusters.)
    """
    pairs = minhash_lsh_pairs(df, id_col, text_col, num_perm, bands, k)
    verified = ngram_jaccard(pairs, df, id_col, text_col, k).filter(
        F.col("jaccard") >= threshold
    )
    losers = verified.select(F.col("b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def simhash(text_col_name: str, bits: int = 64) -> Column:
    """SimHash over whitespace tokens: sign of per-bit vote sums, packed into
    a bigint.  Pure higher-order-function SQL (one expr, JVM-side); the
    Python `F.shiftright` wrapper demands literal shift amounts, so the bit
    loop is spelled as SQL where shift counts can be expressions.
    """
    toks = f"split(trim(lower(`{text_col_name}`)), '\\\\s+')"
    votes = (
        f"transform(sequence(0, {bits - 1}), b -> "
        f"aggregate(transform({toks}, t -> xxhash64(t)), 0L, "
        f"(acc, h) -> acc + CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END))"
    )
    packed = (
        f"aggregate(zip_with({votes}, sequence(0, {bits - 1}), "
        f"(v, b) -> CASE WHEN v > 0 THEN shiftleft(1L, CAST(b AS INT)) ELSE 0L END), "
        f"0L, (acc, x) -> acc | x)"
    )
    return F.expr(packed)


def simhash_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    max_hamming: int = 3, blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash with block-permutation blocking: split the
    64-bit hash into `blocks` segments; by pigeonhole, pairs within
    max_hamming <= blocks-1 share at least one exact segment — join on it.
    """
    seg_bits = 64 // blocks
    sh = df.select(
        F.col(id_col).alias("_id"), simhash(text_col).alias("_sh")
    )
    mask = (1 << seg_bits) - 1
    seg = sh.select(
        "_id", "_sh",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {blocks - 1}), "
                f"b -> (`_sh` >> (b * {seg_bits})) & {mask}L)"
            )
        ).alias("_seg", "_segval"),
    )
    l, r = seg.alias("l"), seg.alias("r")
    cand = (
        l.join(r, on=["_seg", "_segval"], how="inner")
        .filter(F.col("l._id") < F.col("r._id"))
        .select(
            F.col("l._id").alias("a"), F.col("r._id").alias("b"),
            F.col("l._sh").alias("_sha"), F.col("r._sh").alias("_shb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("_sha").bitwiseXOR(F.col("_shb")))
    return cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("a", "b", "hamming")
