"""Graph operators over edge-list DataFrames (iterative, DataFrame-only).

PageRank here is the link-analysis tool a corpus pipeline reaches for —
ranking documents in a similarity/citation graph, products in a
co-occurrence graph, domains in a hyperlink graph — expressed as the
classic synchronous power iteration with teleport, entirely in
DataFrame ops.

Scale shape: the degree-annotated edge table is built once and
checkpointed; every iteration is one shuffle (contributions grouped by
destination) plus a co-keyed left join back to the node set, both of
which AQE co-plans; `localCheckpoint()` truncates lineage per round
(swap for `checkpoint()` on durable storage at cluster scale — same
note as operators/dedup.py connected_components).  No driver-side
collect anywhere: even N (node count) stays a broadcast scalar.

Fixed iteration count (not convergence-tested) keeps the computation
deterministic and lets the DuckDB oracle replicate it exactly as an
unrolled chain of CTEs (`pagerank_oracle_sql`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prql_query_spark.engine.session import barrier


def cooccurrence_edges(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Distinct directed co-occurrence edges (src, dst): items sharing a
    group, both directions, no self-loops.  One shuffle for the per-group
    item set (map-side combined), pair expansion via array HOFs — no
    self-join of the fact table.  Symmetric edges mean every node has
    out-degree >= 1, so PageRank needs no dangling-mass handling."""
    sets = df.groupBy(group_col).agg(
        F.array_sort(F.collect_set(F.col(item_col))).alias("_items")
    )
    pairs = F.filter(
        F.flatten(
            F.transform(
                F.col("_items"),
                lambda x: F.transform(
                    F.col("_items"), lambda y: F.struct(x.alias("src"), y.alias("dst"))
                ),
            )
        ),
        lambda p: p["src"] != p["dst"],
    )
    return (
        sets.select(F.explode(pairs).alias("_p"))
        .select(F.col("_p.src").alias("src"), F.col("_p.dst").alias("dst"))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    round_digits: int = 8,
    checkpoint_interval: int = 8,
) -> DataFrame:
    """(node, rank) after `iters` synchronous power iterations:

        r'(v) = (1-d)/N + d * Σ_{(u,v) ∈ E} r(u) / out_deg(u)

    Nodes are edge endpoints; teleport constant (1-d) is computed in
    Python once so the oracle embeds the identical double.  Final ranks
    are decimal-rounded (HALF_UP) to `round_digits` — the cross-engine
    float convention, far above the ~1e-14 iteration noise floor.

    Dangling-node caveat: sink nodes (in-edges only) ABSORB mass — their
    rank is not redistributed, so on a general directed edge list ranks
    do NOT sum to 1 (matching the oracle twin, which makes the same
    choice).  On symmetric graphs — e.g. cooccurrence_edges output, the
    intended input here — every node has out-edges and mass is conserved.
    For general webgraph-style inputs add a dangling-mass redistribution
    term before trusting rank magnitudes (relative ordering is still
    meaningful in most uses).
    """
    teleport = 1.0 - damping
    # nodes and N are reused by EVERY iteration's rank rebuild — checkpoint
    # both once or each round re-derives them from the raw edge source
    # (measured 5x slower at sf0.1 before this was pinned down)
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .transform(barrier)
    )
    n_df = nodes.agg(F.count(F.lit(1)).alias("_n")).transform(barrier)
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("_deg"))
    ed = (
        edges.join(deg, src)
        .select(F.col(src).alias("_esrc"), F.col(dst).alias("_edst"), "_deg")
        .transform(barrier)
    )
    ranks = (
        nodes.crossJoin(F.broadcast(n_df))
        .select("node", (F.lit(1.0) / F.col("_n")).alias("rank"))
    )
    for it in range(iters):
        contrib = (
            ed.join(ranks, ed._esrc == ranks.node)
            .groupBy("_edst")
            .agg(F.sum(F.col("rank") / F.col("_deg")).alias("_s"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib._edst, "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                (
                    F.lit(teleport) / F.col("_n")
                    + F.lit(damping) * F.coalesce("_s", F.lit(0.0))
                ).alias("rank"),
            )
        )
        # each rank generation has exactly ONE consumer (the next
        # iteration), so an un-checkpointed chain executes in a single
        # pass; checkpointing every round re-materializes every
        # generation and measured ~2x slower.  Truncate lineage only
        # every `checkpoint_interval` rounds to bound plan depth on
        # long runs.
        if (it + 1) % checkpoint_interval == 0:
            ranks = ranks.transform(barrier)
    r = F.round(F.col("rank").cast("decimal(38,12)"), round_digits).cast("double")
    return ranks.select("node", r.alias("rank"))


def pagerank_oracle_sql(
    edges_sql: str,
    iters: int = 5,
    damping: float = 0.85,
    round_digits: int = 8,
    node_alias: str = "node",
) -> str:
    """DuckDB twin: the same fixed-iteration power iteration unrolled as a
    CTE chain (no recursive aggregation needed), generated from the same
    constants as `pagerank` — teleport is embedded as the repr() of the
    identical Python double.  `node_alias` renames the node column in the
    final projection (callers whose Spark-side output uses a different
    name pass it here instead of post-editing the generated SQL)."""
    teleport = repr(1.0 - damping)
    d = repr(damping)
    parts = [
        f"WITH edges AS ({edges_sql})",
        "deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src)",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"r{k} AS (SELECT nodes.node, "
            f"{teleport} / nn.n + {d} * COALESCE(c.s, 0.0) AS r "
            "FROM nodes CROSS JOIN nn LEFT JOIN "
            f"(SELECT e.dst AS node, SUM(p.r / deg.d) AS s FROM edges e "
            f"JOIN r{k-1} p ON e.src = p.node JOIN deg ON deg.src = e.src "
            "GROUP BY e.dst) c USING (node))"
        )
    alias = "node" if node_alias == "node" else f"node AS {node_alias}"
    final = (
        f"SELECT {alias}, CAST(ROUND(CAST(r AS DECIMAL(38,12)), {round_digits}) "
        f"AS DOUBLE) AS rank FROM r{iters}"
    )
    return ",\n".join(parts) + "\n" + final
