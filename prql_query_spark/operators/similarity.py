"""Similarity search over embedding columns (array<float>).

Two tiers, per the scale plan:

* ``cosine_topk`` — brute-force exact top-k.  The query set is broadcast
  (small side), the corpus streams through one narrow map + one shuffle for
  the per-query top-k window.  Exact baseline for recall measurement.
* ``cosine_topk_lsh`` — random-hyperplane LSH: sign-bit bucket per vector,
  candidates restricted to matching buckets (with optional multi-probe via
  fewer bits).  The bucket join replaces the full cross product, which is
  what survives at 10^9 vectors.

Dot products use zip_with + aggregate (JVM higher-order functions): no
Python in the hot path.  Hyperplanes are generated with a fixed seed on the
driver (numpy) and shipped as literal arrays — deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from prql_query_spark.engine.session import barrier


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    # cast to double before arithmetic so results match a float64 oracle
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return dot(ad, bd) / (norm(ad) * norm(bd))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k neighbours for every query vector.

    queries is broadcast — at 100 TB the corpus never moves except for the
    final per-query top-k exchange (tiny: k rows per query per partition
    after the window's partial rank pushdown).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    joined = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
    ).join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    scored = joined.withColumn("cosine", cosine(F.col("_cvec"), F.col("_qvec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("_rk").alias("rank"))
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).tolist()


def lsh_buckets_vec(dim: int | None, n_bits: int, n_tables: int,
                    seed_base: int = 42):
    """Arrow-vectorized multi-table bucketing: pandas_udf mapping an
    embedding column to array<long> of `n_tables` bucket ids.

    Bit-identical to `lsh_bucket` chained per table (same seeds 42+t, same
    >=0 sign convention, plane 0 = MSB) — pinned by
    tests::test_lsh_buckets_vec_matches_expr.  One BLAS matmul per Arrow
    batch replaces n_tables*n_bits interpreted HOF array-dots per row:
    the expression form builds a ~2,000-literal Catalyst tree whose
    analyze+codegen alone costs seconds per plan, and measured 10.2 s for
    2,000 vectors at sf0.1 vs 0.7 s for this UDF.  At 10^9 vectors the
    matmul amortizes even better (batch_size x dim @ dim x bits).

    ``dim=None`` derives the hyperplanes from the first batch's vector
    width inside the kernel — _hyperplanes is seed-deterministic, so
    every task builds the identical matrix, and callers no longer need a
    ``corpus.select(vec).first()`` probe, which was a whole Spark JOB
    (collect + scan) run at query-construction time (guide §5: driver
    work in the query path).  Vector conversion per batch is one
    np.vstack over the Arrow-backed cells, not a row-wise list loop
    (guide §4.2 — same fix as cosine_topk_arrow, measured ~4x on
    100k-row batches)."""
    from pyspark.sql.functions import pandas_udf

    def _planes(d: int):
        return np.concatenate(
            [np.asarray(_hyperplanes(d, n_bits, seed=seed_base + t)).T
             for t in range(n_tables)], axis=1)  # (dim, n_tables*n_bits)

    planes = _planes(dim) if dim is not None else None
    weights = (1 << np.arange(n_bits - 1, -1, -1, dtype=np.int64))

    @pandas_udf("array<long>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = np.vstack(vecs.to_numpy()).astype(np.float64, copy=False)
        p = planes if planes is not None else _planes(x.shape[1])
        bits = (x @ p) >= 0  # (n, n_tables*n_bits)
        b = bits.reshape(len(x), n_tables, n_bits).astype(np.int64)
        ids = (b * weights).sum(axis=2)  # (n, n_tables)
        return pd.Series(list(ids))

    return _buckets


def cosine_pairs_vec(a: Column, b: Column) -> Column:
    """Arrow-vectorized pair cosine: numpy einsum per batch instead of
    three interpreted HOF aggregates per row.  Same float64 math as
    `cosine` up to summation order (parallel reduce vs left fold) — use
    the expression form when an oracle twin must match bit-for-bit."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype=float)
        # np.vstack over the Arrow-backed cells, not a row-wise list loop
        # (guide §4.2; same fix as cosine_topk_arrow, ~4x per batch)
        x = np.vstack(va.to_numpy()).astype(np.float64, copy=False)
        y = np.vstack(vb.to_numpy()).astype(np.float64, copy=False)
        num = np.einsum("ij,ij->i", x, y)
        den = np.linalg.norm(x, axis=1) * np.linalg.norm(y, axis=1)
        return pd.Series(num / den)

    return _cos(a, b)


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from random hyperplanes (deterministic, seed=42)."""
    bits = [
        F.when(dot(F.transform(vec, lambda x: x.cast("double")),
                   F.array(*[F.lit(float(v)) for v in plane])) >= 0, 1).otherwise(0)
        for plane in planes
    ]
    bucket = F.lit(0).cast("long")
    for b in bits:
        bucket = F.shiftleft(bucket, 1).bitwiseOR(b.cast("long"))
    return bucket


def _normalize(vec: Column) -> Column:
    d = F.transform(vec, lambda x: x.cast("double"))
    n = norm(d)
    return F.transform(d, lambda x: x / n)


def _ivf_centers(corpus: DataFrame, vec_col: str, n_cells: int,
                 train_fraction: float, centroids: list | None) -> list:
    """Cell centers for an IVF index: the provided ``centroids``, or
    k-means trained on (a sample of) the normalized corpus — the driver
    holds only n_cells x dim floats either way."""
    if centroids is not None:
        return [list(map(float, c)) for c in centroids]
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(_normalize(F.col(vec_col))).alias("features")
    )
    if train_fraction < 1.0:
        train = train.sample(fraction=train_fraction, seed=42)
    model = KMeans(k=n_cells, seed=42, maxIter=20).fit(train)
    return [c.tolist() for c in model.clusterCenters()]


def _pack_cells(spark, centers: list) -> DataFrame:
    """1-row broadcastable DataFrame holding all cell centroids sorted by
    cell id — the kmeans broadcast-data pattern (never literal trees)."""
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cell int, c array<double>",
    )
    return cent_df.agg(
        F.array_sort(F.collect_list(F.struct("cell", "c"))).alias("_cells")
    )


def _cell_dists(vec: Column) -> Column:
    """Sorted (negative-dot, cell) structs against the broadcast `_cells`
    column: element 1 is the nearest cell.  Unnormalized dot is used as
    the sort key — dividing by the row-constant |v| cannot reorder it."""
    vd = F.transform(vec, lambda x: x.cast("double"))
    return F.array_sort(F.transform(
        F.col("_cells"),
        lambda s: F.struct((-dot(vd, s["c"])).alias("d"),
                           s["cell"].alias("cell")),
    ))


def embedding_neardup_ivf(
    corpus: DataFrame,
    threshold: float = 0.4,
    n_cells: int = 32,
    n_probe: int = 2,
    train_fraction: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list | None = None,
) -> DataFrame:
    """Near-duplicate pairs (a < b, cosine >= threshold) via IVF cells —
    the scale path for LOW-threshold semantic dedup, where hyperplane
    LSH cannot prune (at cos 0.4 the sign-bit agreement rate is 0.63, so
    any band construction either keeps ~half of all pairs or loses most
    true ones; measured on the sf0.1 embeddings: 4-bit/8-table LSH
    retains 814k of 2M possible pairs for 76% recall).

    Each vector is assigned to its ``n_probe`` nearest cells (one
    broadcast of n_cells x dim centroids, JVM dot-product ranking);
    candidate pairs share >= 1 cell, so the join is an equi-join on cell
    id and cost scales with cell sizes, never |corpus|^2.  Survivors are
    exactly verified with an Arrow/BLAS cosine.

    Measured recall of the 920 exact >=0.4 pairs on the sf0.1 embeddings
    (2,000 vecs, 64-dim, of 2M possible pairs):

        n_cells=32 n_probe=2: 244k candidates, recall 0.51
        n_cells=32 n_probe=4: 847k candidates, recall 0.87
        n_cells=16 n_probe=4: 1.45M candidates, recall 0.97
        n_cells=32 n_probe=8: 1.84M candidates, recall 1.00
        (4-bit/8-table hyperplane LSH: 814k candidates, recall 0.76)

    The honest reading: at cos 0.4 the "near-dups" sit on cluster
    BOUNDARIES, so any geometric index needs nearly all pairs to reach
    high recall — low-threshold semantic similarity is effectively
    exhaustive, and approximate pruning only pays above ~0.7 where pairs
    concentrate inside cells.  Use this operator with the threshold that
    matches the corpus' true near-dup mass, and ``centroids=`` to reuse
    offline-trained cells (training here is per-call).  At 10^9
    vectors: n_cells ~ sqrt(n), train on a sample (train_fraction).
    """
    spark = corpus.sparkSession
    centers = _ivf_centers(corpus, vec_col, n_cells, train_fraction, centroids)
    cells_packed = _pack_cells(spark, centers)
    assigned = corpus.crossJoin(F.broadcast(cells_packed)).select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.transform(F.slice(_cell_dists(F.col(vec_col)), 1, n_probe),
                        lambda s: s["cell"])
        ).alias("_cell"),
    )
    # both sides of the candidate self-join consume the assignment; a lazy
    # localCheckpoint stops the broadcast+rank stage running twice
    assigned = assigned.transform(barrier, eager=False)
    pairs = (
        assigned.alias("l")
        .join(assigned.alias("r"), "_cell")
        .select(F.col("l._id").alias("a"), F.col("r._id").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    va = corpus.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
    vb = corpus.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
    return (
        pairs.join(va, "a").join(vb, "b")
        .withColumn("cosine", cosine_pairs_vec(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    train_fraction: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: k-means cells
    trained on a corpus sample, each corpus vector assigned to its nearest
    cell, each query probing its ``n_probe`` nearest cells.

    Scale shape: the index build is one ML fit over a SAMPLE (driver holds
    only n_cells × dim centroids, shipped back as literals); assignment and
    probing are pure JVM expressions; the candidate join is an equi-join on
    cell id.  Versus LSH the cells adapt to the data distribution, so
    recall at equal candidate count is higher on clustered corpora.

    ``centroids`` (list of dim-length float lists) skips training and uses
    the given cell centers — the common production shape where cells are
    trained once offline (or anchors are picked by rule) and reused across
    index builds.  Everything downstream of training is identical.
    """
    centers = _ivf_centers(corpus, vec_col, n_cells, train_fraction, centroids)

    # Round-3 assignment rewrite, measured 32 s -> ~1 s at sf0.1 without
    # moving a single cell assignment:
    #
    # 1. Centroids ride as broadcast DATA (1-row packed DataFrame, the
    #    kmeans pattern), not as ~n_cells x dim literal expression trees —
    #    the literal form re-constructed every CreateArray per evaluation,
    #    which dominated the old 11.9 s corpus-assignment stage.
    # 2. The per-row normalize is GONE from the ranking: cells are sorted
    #    by struct(-dot(v, c), cell), and -dot(normalize(v), c) =
    #    -dot(v, c) / |v| with |v| a positive row-constant — dividing
    #    every element of a sort key by the same positive scalar cannot
    #    reorder it, so the chosen cells (and every tie-break) are
    #    IDENTICAL to the normalized form.  (|v| = 0 degenerates the same
    #    way too: all-NaN sort keys before vs all-zero now, both fall
    #    through to the `cell` tie-break.)  The old form re-evaluated the
    #    captured normalize inside every cell's lambda — higher-order
    #    lambdas re-run captured outer expressions per invocation.
    spark = corpus.sparkSession
    cells_packed = _pack_cells(spark, centers)

    c = corpus.crossJoin(F.broadcast(cells_packed)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        F.element_at(_cell_dists(F.col(vec_col)), 1)["cell"].alias("_cell"),
    )
    q = queries.crossJoin(F.broadcast(cells_packed)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.explode(
            F.transform(
                F.slice(_cell_dists(F.col(vec_col)), 1, n_probe),
                lambda s: s["cell"],
            )
        ).alias("_cell"),
    )
    joined = c.join(F.broadcast(q), on="_cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.withColumn("cosine", cosine(F.col("_cvec"), F.col("_qvec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("_rk").alias("rank"))
    )


def embedding_neardup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_bits: int = 4,
    n_tables: int = 8,
    exact: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs (a < b, cosine >= threshold) over an embedding
    column — the embedding-space member of the dedup family.

    ``exact=True`` scores every pair (O(n²): only for oracles and small
    corpora); the default restricts candidates to shared LSH buckets like
    `cosine_topk_lsh`, which is the shape that survives at 10^9 vectors.
    """
    c = corpus.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
    q = corpus.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
    if exact:
        cand = c.join(F.broadcast(q), F.col("a") < F.col("b"))
        return (
            cand.withColumn("cosine", cosine(F.col("_va"), F.col("_vb")))
            .filter(F.col("cosine") >= threshold)
            .select("a", "b", "cosine")
        )
    # LSH path, round-3 shape: (1) bucket ids via ONE Arrow/BLAS matmul per
    # batch (lsh_buckets_vec) instead of a ~2,000-literal HOF expression
    # tree; (2) the candidate join and dedup move BARE (t, bucket, id)
    # rows — vectors re-join only for the surviving unique pairs, so the
    # dedup exchange doesn't carry two dim-length arrays per candidate.
    # Measured at sf0.1 (2,000 vecs, 64-dim): 10.2 s -> 0.7 s warm.
    # dim=None: hyperplanes derive in-kernel from the batch width — the
    # former select(vec).first() probe was a full collect JOB at query-
    # construction time (guide §5), one corpus-scan task per invocation.
    # Candidate generation (round 12, guide §2.4): the bucket SELF-JOIN +
    # dropDuplicates shape (shuffle bucketed twice for the join, then a
    # third exchange for the dedup, plus a checkpoint barrier so the
    # matmul didn't run twice) is replaced by the minhash pair shape —
    # ONE bucket-keyed shuffle, ids collected per (table, bucket),
    # i<j pairs generated JVM-side, then the (a, b) dedup.  Uncapped
    # (max_bucket=None) so the candidate set is EXACTLY the self-join's.
    # The barrier disappears with the second consumer.
    from prql_query_spark.operators.dedup import _band_pairs_exploded

    bud = lsh_buckets_vec(None, n_bits, n_tables)
    banded = corpus.select(
        F.col(id_col).alias("_id"),
        F.posexplode(bud(F.col(vec_col))).alias("_band", "_bucket"))
    pairs = (_band_pairs_exploded(banded, None)
             .dropDuplicates(["a", "b"]))
    va = corpus.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
    vb = corpus.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
    return (
        pairs.join(va, "a").join(vb, "b")
        .withColumn("cosine", cosine_pairs_vec(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 4,
    n_tables: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    ``n_tables`` independent hyperplane sets; a corpus vector is a candidate
    for a query if they share a bucket in ANY table (classic OR-construction
    — recall grows with n_tables, candidate count stays bounded by bucket
    size × tables, never the full cross product).

    Tuning (measured on a 12-cluster unit-sphere corpus, n=1200, dim=24,
    recall@10 vs brute force): 6 bits / 8 tables -> 0.82, 8/12 -> 0.85,
    10/16 -> 0.77 (buckets too fine).  Pick n_bits ~ log2(n / target bucket
    size) and grow n_tables for recall; on clustered corpora prefer
    ``cosine_topk_ivf`` (measured 1.00 at n_cells=#clusters, n_probe=2 —
    cells adapt to the distribution, sign bits don't).
    """
    # bucket ids via one Arrow/BLAS matmul per batch (bit-identical to the
    # lsh_bucket expression chain — see lsh_buckets_vec); candidate join +
    # dedup move bare ids, vectors re-join for survivors only.  Scoring
    # stays on the expression-form cosine so the DuckDB oracle twin
    # (x_cosine_lsh) matches to the last ulp.  dim=None -> in-kernel
    # hyperplanes; an explicitly passed dim keeps the old eager path.
    bud = lsh_buckets_vec(dim, n_bits, n_tables)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(bud(F.col(vec_col))).alias("_t", "_b"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(bud(F.col(vec_col))).alias("_t", "_b"),
    )
    joined = (
        c.join(F.broadcast(q), on=["_t", "_b"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("_cvec"))
    qv = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("_qvec"))
    joined = joined.join(cv, "neighbor_id").join(F.broadcast(qv), "query_id")
    scored = joined.withColumn("cosine", cosine(F.col("_cvec"), F.col("_qvec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("_rk").alias("rank"))
    )


def embedding_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Per-group centroid in long format (group, pos, avg_v), pos 1-based.

    posexplode → groupBy(group, pos) → avg: the element rows partial-
    aggregate map-side, so the shuffle carries ≤ groups×dim rows per task —
    at 100 TB this is the distributed-safe shape (collect_list of whole
    vectors would buffer entire groups in executor memory).  Long output
    also makes the result directly SQL-comparable; reassemble with
    collect_list over pos downstream if an array is wanted.
    """
    exploded = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col)).alias("pos0", "v")
    )
    return (
        exploded.groupBy(group_col, (F.col("pos0") + 1).alias("pos"))
        .agg(F.round(F.avg("v"), round_to).alias("avg_v"))
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    col: str,
    max_dist: int = 3,
    block=None,
):
    """Blocked edit-distance join for entity resolution: equi-join on a
    blocking key (hash join — NEVER a cross product), then exact
    levenshtein verification inside blocks.  Returns (a, b, dist) with
    a < b.

    Default blocking key is the last whitespace token (surname/type-word
    blocking); pass `block` (Column -> Column) to change it.  At 100 TB
    the block key is the unit of skew: Catalyst's AQE skew-join splits
    oversized blocks, and a second cheap key (e.g. length band) can be
    added to the same equi-join to tighten blocks without changing the
    plan shape.
    """
    from pyspark.sql import functions as F

    if block is None:
        def block(c):
            return F.element_at(F.split(c, " "), -1)

    l = left.select(F.col(col).alias("a"), block(F.col(col)).alias("_blk"))
    r = right.select(F.col(col).alias("b"), block(F.col(col)).alias("_blk"))
    return (
        l.join(r, "_blk")
        .filter(F.col("a") < F.col("b"))
        .withColumn("dist", F.levenshtein("a", "b"))
        .filter(F.col("dist") <= max_dist)
        .select("a", "b", "dist")
    )


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k like `cosine_topk`, but the dot products run
    as one BLAS matmul per Arrow batch (mapInPandas) instead of interpreted
    JVM higher-order functions — 5-10x faster on wide embeddings, and the
    right physical shape for brute-force ANN (matrix multiply, not
    per-element lambdas).

    Each batch emits only its LOCAL top-k per query (k rows x queries x
    batches reach the final exchange, never the corpus), then one window
    pass merges partials — same two-phase shape as TakeOrderedAndProject.
    The query set is collected + broadcast: small by contract (use LSH/IVF
    when the query side is itself corpus-sized).  Ties broken by
    neighbor_id ascending in both phases, so results are bit-stable and
    identical to `cosine_topk`.
    """
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qm = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    sc = corpus.sparkSession.sparkContext
    b_ids, b_qm = sc.broadcast(q_ids), sc.broadcast(qm)

    def part(batches):
        qi, Q = b_ids.value, b_qm.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            # np.vstack over the Arrow-backed array cells is ~4x faster
            # than the row-wise list() loop (measured 0.28 s vs 1.06 s
            # per 100k x 64 batch) — this conversion is the scorer's
            # per-batch hot path at corpus scale
            C = np.vstack(pdf[vec_col].to_numpy()).astype(
                np.float64, copy=False)
            C = C / np.linalg.norm(C, axis=1, keepdims=True)
            S = C @ Q.T
            out_q, out_n, out_c = [], [], []
            for j in range(len(qi)):
                s = S[:, j]
                idx = np.flatnonzero(ids != qi[j])
                order = np.lexsort((ids[idx], -s[idx]))[:k]
                sel = idx[order]
                out_q.append(np.full(len(sel), qi[j]))
                out_n.append(ids[sel])
                out_c.append(s[sel])
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "cosine": np.concatenate(out_c),
            })

    partial = corpus.select(id_col, vec_col).mapInPandas(
        part, "query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("_rk").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory tier of ANN at 100 TB.  IVF/LSH
# shrink the CANDIDATE count; PQ shrinks the BYTES PER VECTOR — a
# dim-double vector becomes m uint8 codes (64 doubles = 512 B -> 8 B),
# so the compressed corpus scan stays in memory/cache where the raw
# vectors cannot.  Classic IVF-PQ pairing (Jegou et al., "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011).


def pq_codebooks_from_anchors(anchors: list, m: int) -> list:
    """Split ``n_codes`` full-dimension anchor vectors into ``m``
    sub-codebooks: codebook[j][c] = anchors[c][j*sub : (j+1)*sub].

    The provided-anchor path mirrors `cosine_topk_ivf(centroids=...)` —
    production trains codebooks offline once (or picks anchor rows by
    rule) and ships them to every index build; it is also the
    value-checkable configuration, since an oracle can rebuild the same
    sub-codebooks in SQL."""
    dim = len(anchors[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return [
        [[float(x) for x in a[j * sub:(j + 1) * sub]] for a in anchors]
        for j in range(m)
    ]


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    train_fraction: float = 1.0,
    seed: int = 42,
) -> list:
    """Train per-subspace k-means codebooks (the PQ fit step).

    One ML fit per subspace over (a sample of) the corpus slices; the
    driver holds only m x n_codes x (dim/m) doubles — constant in corpus
    size, exactly like `_ivf_centers`.  Returns
    ``codebooks[j][code] = list[dim/m floats]``."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dim = len(corpus.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    base = corpus.select(F.col(vec_col).alias("v"))
    if train_fraction < 1.0:
        base = base.sample(fraction=train_fraction, seed=seed)
    base = base.cache()
    try:
        books = []
        for j in range(m):
            train = base.select(
                array_to_vector(
                    F.transform(
                        F.slice("v", j * sub + 1, sub),
                        lambda x: x.cast("double"),
                    )
                ).alias("features")
            )
            model = KMeans(k=n_codes, seed=seed + j, maxIter=20).fit(train)
            books.append([c.tolist() for c in model.clusterCenters()])
        return books
    finally:
        base.unpersist()


def _pack_codebooks(spark, codebooks: list) -> DataFrame:
    """1-row broadcastable DataFrame `_cbs`: array over subspaces j (in
    order) of struct(j, cents: array over codes (in order) of
    struct(code, c)) — broadcast DATA, never literal expression trees
    (the `_pack_cells` lesson: literals re-materialize per evaluation)."""
    rows = [
        (j, [(c, [float(x) for x in cent]) for c, cent in enumerate(book)])
        for j, book in enumerate(codebooks)
    ]
    cb = spark.createDataFrame(
        rows, "j int, cents array<struct<code:int, c:array<double>>>"
    )
    return cb.agg(
        F.array_sort(F.collect_list(F.struct("j", "cents"))).alias("_cbs")
    )


def _sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 via the inner-product identity |a|^2 + |b|^2 - 2ab.
    Composed purely from `dot`, whose sequential fold both engines
    reproduce bit-for-bit — so an oracle writing
    ip(a,a) + ip(b,b) - 2*ip(a,b) gets the identical double."""
    return dot(a, a) + dot(b, b) - 2.0 * dot(a, b)


def pq_encode(
    df: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector to m uint8-range codes + its true norm.

    Per subspace j: code = argmin_c |v_sub - codebook[j][c]|^2 (ties to
    the smallest code).  One narrow projection against the broadcast
    packed codebooks — no shuffle, no UDF; output is (id, codes
    array<int>, vnorm double), the compressed representation that
    replaces the raw vector in the scan."""
    spark = df.sparkSession
    sub = len(codebooks[0][0])
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def code_for(s):
        subv = F.slice(vd, s["j"] * sub + 1, sub)
        return F.array_min(
            F.transform(
                s["cents"],
                lambda c: F.struct(
                    _sq_dist(subv, c["c"]).alias("d"), c["code"].alias("code")
                ),
            )
        )["code"]

    return df.crossJoin(F.broadcast(_pack_codebooks(spark, codebooks))).select(
        F.col(id_col),
        F.transform(F.col("_cbs"), code_for).alias("codes"),
        norm(vd).alias("vnorm"),
    )


def cosine_topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    codebooks: list | None = None,
    train_fraction: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encoded: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) over PQ
    codes: `approx_cos(q, x) = (sum_j LUT_q[j][codes_x[j]]) / (|q||x|)`
    where `LUT_q[j][c] = <q_sub_j, codebook[j][c]>` is computed once per
    query and broadcast with it.

    Scale shape: the corpus is touched once to encode (narrow, no
    shuffle), then the ranking scan reads m ints per row instead of dim
    floats — the compressed-domain scan that fits in cache at 10^9
    vectors.  Queries ride broadcast with their LUTs (m x n_codes doubles
    each); the only exchange is the final per-query top-k window, with
    the same tie rules (score desc, neighbor_id asc) as every other topk
    op here.  Compose with IVF cells to also cut the candidate count —
    PQ shrinks bytes/row, IVF shrinks rows."""
    if codebooks is None:
        codebooks = pq_train(
            corpus, m=m, n_codes=n_codes, vec_col=vec_col,
            train_fraction=train_fraction,
        )
    spark = corpus.sparkSession
    sub = len(codebooks[0][0])
    packed = _pack_codebooks(spark, codebooks)
    # ``encoded``: a persisted output of `pq_encode` (id, codes, vnorm).
    # Production encodes the corpus ONCE and serves many queries from the
    # stored codes — passing it skips the per-query encode pass, which
    # otherwise dominates wall time (the codes table is the index).
    enc = (
        encoded
        if encoded is not None
        else pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col)
    )

    qd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q = queries.crossJoin(F.broadcast(packed)).select(
        F.col(id_col).alias("query_id"),
        F.transform(
            F.col("_cbs"),
            lambda s: F.transform(
                s["cents"], lambda c: dot(F.slice(qd, s["j"] * sub + 1, sub), c["c"])
            ),
        ).alias("_lut"),
        norm(qd).alias("qnorm"),
    )

    adc = F.aggregate(
        F.zip_with(
            F.col("codes"), F.col("_lut"),
            lambda code, dots: F.element_at(dots, code + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        enc.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
        .withColumn("approx_cosine", adc / (F.col("qnorm") * F.col("vnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            "approx_cosine",
            F.col("_rk").alias("rank"),
        )
    )


def ivfpq_index(
    corpus: DataFrame,
    centroids: list,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Build the IVF-PQ index rows: (neighbor_id, _cell, codes, vnorm) —
    one narrow pass over the corpus against the broadcast centers and
    codebooks.  Persist/bucket this table (by _cell) and hand it to
    `cosine_topk_ivfpq(index=...)`: the corpus is touched once, queries
    read m-byte codes forever after."""
    spark = corpus.sparkSession
    sub = len(codebooks[0][0])
    cells_packed = _pack_cells(spark, centroids)
    cbs_packed = _pack_codebooks(spark, codebooks)
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def code_for(s):
        subv = F.slice(vd, s["j"] * sub + 1, sub)
        return F.array_min(
            F.transform(
                s["cents"],
                lambda c: F.struct(
                    _sq_dist(subv, c["c"]).alias("d"), c["code"].alias("code")
                ),
            )
        )["code"]

    return (
        corpus.crossJoin(F.broadcast(cells_packed))
        .crossJoin(F.broadcast(cbs_packed))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.element_at(_cell_dists(F.col(vec_col)), 1)["cell"].alias("_cell"),
            F.transform(F.col("_cbs"), code_for).alias("codes"),
            norm(vd).alias("vnorm"),
        )
    )


def ann_index_health(
    index: DataFrame,
    batch: DataFrame,
    centroids: list,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-row health report for a persisted IVF(-PQ) index against an
    arriving batch — the monitoring step that keeps build-once/
    probe-forever honest: the index's cell centers are FIXED at build
    time, so when the data distribution drifts the new rows crowd into
    few cells and probe recall decays silently.  Detect it from cell
    OCCUPANCY alone, no recall evaluation needed:

    - ``psi``: Population Stability Index between the index's cell
      histogram and the batch's (assigned against the SAME centers via
      `ivfpq_index` — the exact machinery the index itself used);
      < 0.1 stable, > 0.25 re-train the centers.  Laplace smoothing
      (n_i + 1)/(N + cells), identical in the DuckDB oracle — the
      psi_drift convention.
    - ``hot_cell_share``: the batch's max single-cell occupancy
      fraction — the probe-cost skew indicator (a hot cell's posting
      list is what every drifted query will scan).
    - ``empty_index_cells`` / ``empty_batch_cells``: dead centers.

    Cost: one column-pruned pass over each side aggregated to
    <= n_cells rows (the index scan reads only `_cell`), then a
    broadcast join of two n_cells-row histograms — runs at any index
    size.  Gate row x_ann_health drifts the batch to one label cluster.

    Raises ValueError when either side is empty: an empty batch would
    otherwise yield hot_cell_share = NULL (0/0) and a PSI computed
    against a pure-smoothing distribution — a silent degenerate row
    from an operator whose whole purpose is alerting.  The emptiness
    probes are `isEmpty()` (limit-1 jobs), cheap at any index size.
    """
    n_cells = len(centroids)
    if batch.isEmpty():
        raise ValueError(
            "ann_index_health: batch is empty — no occupancy histogram "
            "to compare; upstream ingest produced zero rows")
    if index.isEmpty():
        raise ValueError(
            "ann_index_health: index is empty — build the index before "
            "monitoring it")
    enc = ivfpq_index(batch, centroids, codebooks,
                      id_col=id_col, vec_col=vec_col)
    ia = index.groupBy("_cell").agg(F.count(F.lit(1)).alias("na"))
    ib = enc.groupBy("_cell").agg(F.count(F.lit(1)).alias("nb"))
    base = index.sparkSession.range(n_cells).select(
        F.col("id").cast("int").alias("_cell"))
    j = (
        base.join(ia, "_cell", "left").join(ib, "_cell", "left")
        .fillna(0, ["na", "nb"])
    )
    tot = j.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    jt = j.crossJoin(F.broadcast(tot))
    p = (F.col("na") + 1) / (F.col("ta") + F.lit(n_cells))
    q = (F.col("nb") + 1) / (F.col("tb") + F.lit(n_cells))
    return jt.agg(
        F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"),
        F.round(F.max("nb") / F.max("tb"), 6).alias("hot_cell_share"),
        F.sum((F.col("na") == 0).cast("long")).alias("empty_index_cells"),
        F.sum((F.col("nb") == 0).cast("long")).alias("empty_batch_cells"),
    )


def probed_cells(
    queries: DataFrame,
    centroids: list,
    n_probe: int,
    vec_col: str = "embedding",
) -> list[int]:
    """The union of every query's ``n_probe`` nearest cell ids, as plain
    ints — the literal prefilter for a PERSISTED IVF-PQ index: filter the
    cell-sorted index parquet with ``_cell IN (...)`` BEFORE the
    candidate join and the predicate reaches the scan (PushedFilters ->
    row-group pruning), so query-time IO is proportional to the probed
    posting lists, not the corpus — the dense twin of
    retrieval.build_bm25_index's term-sorted pruning.

    Cell choice runs THROUGH the same `_cell_dists` expressions the
    probe plan evaluates (queries are small by contract — the collect is
    the serving pattern, similarity.py cosine_topk_arrow:553), so the
    literal set provably covers every cell the join would touch; a
    driver-side numpy re-derivation could drift by an ulp on near-ties
    and silently drop a probed cell."""
    spark = queries.sparkSession
    cells_packed = _pack_cells(spark, centroids)
    rows = (
        queries.crossJoin(F.broadcast(cells_packed))
        .select(F.explode(F.transform(
            F.slice(_cell_dists(F.col(vec_col)), 1, n_probe),
            lambda s: s["cell"],
        )).alias("_cell"))
        .distinct().collect()
    )
    return sorted(r["_cell"] for r in rows)


def cosine_topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    centroids: list | None = None,
    codebooks: list | None = None,
    train_fraction: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ: the two ANN tiers composed the way a production index pairs
    them — IVF cells shrink the CANDIDATE count (each query scans only its
    ``n_probe`` nearest cells), PQ codes shrink the BYTES per candidate
    (ADC over m codes instead of dim floats).  This is the shape that
    serves 10^9-vector search: the per-cell posting lists hold 8-byte
    codes, and a query touches n_probe/n_cells of them.

    Index build = one pass over the corpus producing (cell, codes, norm)
    — narrow, no shuffle; both cell centers and codebooks are either
    provided (offline-trained, the oracle-checkable configuration) or
    k-means-fit on a sample.  The candidate restriction is an equi-join
    on cell id against the broadcast probe set; scoring and ranking
    mirror `cosine_topk_pq` exactly (same ADC fold, same tie rules), so
    at n_probe = n_cells this degrades to precisely `cosine_topk_pq`'s
    answer — pinned by a pytest property."""
    centers = _ivf_centers(corpus, vec_col, n_cells, train_fraction, centroids)
    if codebooks is None:
        codebooks = pq_train(
            corpus, m=m, n_codes=n_codes, vec_col=vec_col,
            train_fraction=train_fraction,
        )
    spark = corpus.sparkSession
    sub = len(codebooks[0][0])
    cells_packed = _pack_cells(spark, centers)
    cbs_packed = _pack_codebooks(spark, codebooks)

    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    # ``index``: a persisted output of `ivfpq_index` — encode once, query
    # many times (the production serving shape; per-query encode
    # otherwise dominates wall time).
    enc = (
        index
        if index is not None
        else ivfpq_index(corpus, centers, codebooks, id_col=id_col, vec_col=vec_col)
    )
    q = (
        queries.crossJoin(F.broadcast(cells_packed))
        .crossJoin(F.broadcast(cbs_packed))
        .select(
            F.col(id_col).alias("query_id"),
            F.explode(
                F.transform(
                    F.slice(_cell_dists(F.col(vec_col)), 1, n_probe),
                    lambda s: s["cell"],
                )
            ).alias("_cell"),
            F.transform(
                F.col("_cbs"),
                lambda s: F.transform(
                    s["cents"],
                    lambda c: dot(F.slice(vd, s["j"] * sub + 1, sub), c["c"]),
                ),
            ).alias("_lut"),
            norm(vd).alias("qnorm"),
        )
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"), F.col("_lut"),
            lambda code, dots: F.element_at(dots, code + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        enc.join(F.broadcast(q), on="_cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("approx_cosine", adc / (F.col("qnorm") * F.col("vnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "approx_cosine", F.col("_rk").alias("rank"))
    )


# ---------------------------------------------------------------------------
# PCA over embedding columns: the whitening/compression step of embedding
# pipelines (reduce dim before ANN, drop anisotropy before cosine).  The
# fit is one pass of per-partition numpy partial sums -> a dim x dim
# covariance on the driver (4 KB at dim=64) -> numpy eigh; the transform
# is a broadcast matrix of HOF dot products.  Nothing corpus-sized ever
# reaches the driver.


def embedding_mean_cov(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """(mean vector, covariance matrix) in ONE corpus pass: mapInPandas
    emits per-batch partials (n, sum x, sum x^T x — dim + dim^2 doubles
    per PARTITION, not per row), the driver reduces a handful of rows.
    The 100 TB-safe moment computation (treeAggregate shape)."""
    import pandas as pd

    dim = len(df.select(vec_col).first()[0])

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # vstack, not a row-wise list() loop — see cosine_topk_arrow
            X = np.vstack(pdf[vec_col].to_numpy()).astype(
                np.float64, copy=False)
            yield pd.DataFrame({
                "n": [len(X)],
                "s": [X.sum(axis=0).tolist()],
                "ss": [(X.T @ X).reshape(-1).tolist()],
            })

    rows = df.select(vec_col).mapInPandas(
        partials, "n long, s array<double>, ss array<double>"
    ).collect()
    n = sum(r.n for r in rows)
    s = np.sum([np.array(r.s) for r in rows], axis=0)
    ss = np.sum([np.array(r.ss).reshape(dim, dim) for r in rows], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return mean, cov


def pca_fit(
    df: DataFrame, k: int = 16, vec_col: str = "embedding"
) -> dict:
    """Top-k principal components of the embedding corpus.  Returns
    {mean, components (k x dim, orthonormal rows, variance-descending),
    explained_variance, explained_ratio}.  Sign convention: each
    component's largest-|coefficient| entry is positive, so fits are
    deterministic across runs/partitionings up to float reduction."""
    mean, cov = embedding_mean_cov(df, vec_col)
    vals, vecs = np.linalg.eigh(cov)           # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T                   # k x dim
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    ev = vals[order]
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance": ev.tolist(),
        "explained_ratio": (ev / vals.sum()).tolist(),
    }


def pca_transform(
    df: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "projected",
) -> DataFrame:
    """Project embeddings onto the fitted components: centered dot
    product per component, via the packed-broadcast pattern (components
    ride as 1-row DATA, the projection is a narrow HOF projection — no
    shuffle, no Python)."""
    spark = df.sparkSession
    rows = [(i, [float(x) for x in c])
            for i, c in enumerate(model["components"])]
    packed = spark.createDataFrame(rows, "i int, c array<double>").agg(
        F.array_sort(F.collect_list(F.struct("i", "c"))).alias("_comps")
    )
    mean = F.array(*[F.lit(float(m)) for m in model["mean"]])
    centered = F.zip_with(
        F.transform(F.col(vec_col), lambda x: x.cast("double")), mean,
        lambda x, m: x - m,
    )
    return df.crossJoin(F.broadcast(packed)).select(
        F.col(id_col),
        F.transform(
            F.col("_comps"), lambda s: dot(centered, s["c"])
        ).alias(out_col),
    )


def random_projection(
    df: DataFrame,
    out_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "projected",
    seed: int = 7,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project onto a
    seeded gaussian matrix scaled by 1/sqrt(out_dim), which preserves
    pairwise distances within (1 +- eps) w.h.p. — the data-independent
    alternative to `pca_fit` when no fit pass is affordable (or the
    distribution drifts).  Deterministic: same seed, same matrix, any
    cluster; rows ride as packed broadcast data into a narrow HOF
    projection, like every other matrix op here."""
    dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((out_dim, dim)) / np.sqrt(out_dim)
    spark = df.sparkSession
    packed = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "i int, r array<double>",
    ).agg(F.array_sort(F.collect_list(F.struct("i", "r"))).alias("_rows"))
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.crossJoin(F.broadcast(packed)).select(
        F.col(id_col),
        F.transform(F.col("_rows"), lambda s: dot(vd, s["r"])).alias(out_col),
    )
