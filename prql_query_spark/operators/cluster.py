"""Pure-DataFrame k-means (Lloyd iterations) over embedding columns.

Corpus clustering — topic/domain discovery, IVF cell training, dedup
blocking — without leaving the relational plan: assignment is a
broadcast of the k packed centroids into a narrow HOF projection
(argmin over k sequential squared-distance folds), the update is one
explode + grouped average per (cluster, dim).  No pyspark.ml, no UDFs,
no driver-side math; per iteration exactly ONE shuffle (the update
aggregate — map-side combined, at most k x dim groups at any corpus
size) plus the k-row centroid repack.

Determinism contract (what makes the DuckDB oracle exact):
* init = the k lowest-id vectors, clusters numbered in id order;
* distances fold dims sequentially from 0.0 (left-associated adds), so
  both engines produce bit-identical doubles given identical centroids;
* updated centroids are decimal-rounded HALF_UP to 9 digits (the repo's
  cross-engine float convention) — the ~1e-16 summation-order noise of
  a grouped AVG can never survive into the next assignment;
* argmin ties resolve to the lowest cluster index (array_position finds
  the FIRST minimum).
`kmeans_oracle_sql` unrolls the same fixed iterations as a CTE chain
with explicitly expanded per-dim sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prql_query_spark.engine.session import barrier

ROUND_DIGITS = 9


def _round9(c):
    return F.round(c.cast("decimal(38,12)"), ROUND_DIGITS).cast("double")


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iters: int = 3,
) -> DataFrame:
    """(cluster, pos, c, n_members) — final centroids in long format plus
    each cluster's member count after `iters` Lloyd iterations."""
    base = df.select(
        F.col(id_col).alias("_kid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    ).transform(barrier)
    cent = (
        base.orderBy("_kid")
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("_kid")) - 1).alias("cluster"),
            F.col("_v").alias("_c"),
        )
    )

    def assign(centroids: DataFrame) -> DataFrame:
        # keep the cluster LABEL inside the packed structs: an empty
        # cluster drops out of `centroids`, and an array-position argmin
        # would silently renumber the survivors (diverging from the
        # oracle, which carries original labels)
        packed = centroids.agg(
            F.array_sort(F.collect_list(F.struct("cluster", "_c"))).alias("_cs")
        )
        scored = F.transform(
            F.col("_cs"),
            lambda s: F.struct(
                F.aggregate(
                    F.zip_with(F.col("_v"), s["_c"], lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                s["cluster"].alias("cluster"),
            ),
        )
        # struct comparison is lexicographic -> min by (dist, cluster),
        # the same tie-break as the oracle's ORDER BY dist, cluster
        return (
            base.crossJoin(F.broadcast(packed))
            .withColumn("_best", F.array_min(scored))
            .select("_kid", "_v", F.col("_best.cluster").alias("cluster"))
        )

    for _ in range(iters):
        assigned = assign(cent)
        cent = (
            assigned.select("cluster", F.posexplode("_v").alias("pos", "_x"))
            .groupBy("cluster", "pos")
            .agg(_round9(F.avg("_x")).alias("_val"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_val"))),
                    lambda s: s["_val"],
                ).alias("_c")
            )
        )
    sizes = assign(cent).groupBy("cluster").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        cent.select("cluster", F.posexplode("_c").alias("pos", "c"))
        .join(sizes, "cluster")
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            F.col("pos").cast("long").alias("pos"),
            "c", "n_members",
        )
    )


def kmeans_oracle_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iters: int = 3,
    dim: int = 64,
) -> str:
    """DuckDB twin: the same iterations unrolled, distances as explicitly
    expanded left-associated per-dim sums (bit-identical to the Spark
    fold), centroids decimal-rounded to the same 9 digits."""

    def dist(e: str, c: str) -> str:
        return " + ".join(
            f"({e}.v[{i}] - {c}.c[{i}]) * ({e}.v[{i}] - {c}.c[{i}])"
            for i in range(1, dim + 1)
        )

    r9 = "CAST(ROUND(CAST(AVG(val) AS DECIMAL(38,12)), 9) AS DOUBLE)"
    parts = [
        f"emb AS (SELECT {id_col} AS kid, CAST({vec_col} AS DOUBLE[]) AS v "
        f"FROM {table})",
        f"c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY kid) - 1 AS cluster, "
        f"v AS c FROM (SELECT kid, v FROM emb ORDER BY kid LIMIT {k}))",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"a{t} AS (SELECT kid, v, cluster FROM ("
            f"SELECT e.kid, e.v, c.cluster, ROW_NUMBER() OVER ("
            f"PARTITION BY e.kid ORDER BY {dist('e', 'c')}, c.cluster) AS rk "
            f"FROM emb e CROSS JOIN c{t-1} c) WHERE rk = 1)"
        )
        parts.append(
            f"c{t} AS (SELECT cluster, list(cv ORDER BY pos) AS c FROM ("
            f"SELECT cluster, pos, {r9} AS cv FROM ("
            f"SELECT cluster, i AS pos, v[i] AS val "
            f"FROM a{t}, generate_series(1, {dim}) s(i)) "
            f"GROUP BY cluster, pos) GROUP BY cluster)"
        )
    final = (
        f"SELECT f.cluster, f.pos - 1 AS pos, f.c, s.n_members FROM "
        f"(SELECT cluster, i AS pos, c[i] AS c FROM c{iters}, "
        f"generate_series(1, {dim}) s(i)) f JOIN "
        f"(SELECT cluster, COUNT(*) AS n_members FROM (SELECT kid, cluster "
        f"FROM (SELECT e.kid, c.cluster, ROW_NUMBER() OVER (PARTITION BY e.kid "
        f"ORDER BY {dist('e', 'c')}, c.cluster) AS rk "
        f"FROM emb e CROSS JOIN c{iters} c) WHERE rk = 1) GROUP BY cluster) s "
        f"USING (cluster)"
    )
    return "WITH " + ",\n".join(parts) + "\n" + final
