"""Ranked retrieval over the document corpus: BM25 top-k search.

Completes the retrieval tier next to tf-idf term EXTRACTION (text.py
`tfidf_top_terms`) and embedding ANN (similarity.py): given a keyword
query, rank documents by Okapi BM25 and return the top k — the lexical
half of a hybrid (BM25 + dense) retrieval stack, and the standard
relevance baseline for corpus curation ("which training docs look like
this benchmark prompt?").

Scale plan (the part that matters at 100 TB):
- The corpus is tokenized ONCE and immediately filtered to the query's
  terms — a broadcast hash semi-join against a literal array of at most
  a few dozen terms — so everything downstream (tf counts, df counts,
  scoring, top-k) runs over only the matching (doc, term) pairs, never
  the corpus vocabulary.
- N and avgdl come from a narrow one-pass aggregate over per-doc token
  counts (no explode), cross-joined as a broadcast scalar row.
- Top-k is ORDER BY + LIMIT -> Catalyst TakeOrderedAndProject, no global
  sort materialization.
Shuffles: one for the (doc, matched-term) tf aggregate (candidate-set
sized, not corpus sized), one candidate-set-sized one for the per-term
df window; the scalar stats row broadcasts.  The corpus text is scanned
once for scoring plus one narrow no-explode pass for N/avgdl — df comes
from a window over the tf aggregate, NOT a second tokenize (Catalyst
does not dedupe common subplans, so the join formulation would scan and
explode the corpus twice).  No UDFs anywhere — whole-stage codegen end
to end.

Tokenization is the repo's whitespace convention (split on \\s+ of the
lower-trimmed text), identical to the x_sentiment oracle, so the DuckDB
twin can mirror it exactly; scores ROUND to 6 decimals on both sides
before ranking so libm's 1-ulp ln() divergence can't flip the ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for `query` by Okapi BM25.

    score(D,Q) = sum over distinct query terms t of
        idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))  (the Robertson-
    Sparck Jones form with the +1 that keeps idf positive).

    Returns (id_col, score) ordered by score desc, id desc ties-last —
    deterministic and oracle-mirrorable.
    """
    terms = sorted({t for t in query.strip().lower().split() if t})
    if not terms:
        raise ValueError("bm25_topk: query has no terms")

    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.select(F.col(id_col), toks.alias("_toks"))

    # N and avgdl: one narrow pass, no explode
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg(F.size("_toks")).alias("_avgdl"),
    )

    # explode, keep ONLY query terms (broadcast literal semi-filter)
    hits = (
        base.select(
            F.col(id_col),
            F.size("_toks").alias("_dl"),
            F.explode("_toks").alias("_t"),
        )
        .filter(F.col("_t").isin(terms))
    )
    tf = hits.groupBy(id_col, "_t").agg(
        F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl"))
    # document frequency as a window count OVER the tf table (one row per
    # (doc, term), so rows-per-term IS df).  A groupBy+join would re-derive
    # the whole tokenize/explode subtree a second time — Catalyst does not
    # dedupe common subplans — turning one corpus scan into two; the
    # window is one candidate-set-sized exchange by term instead.
    from pyspark.sql import Window

    scored = (
        tf.withColumn("_df", F.count(F.lit(1)).over(Window.partitionBy("_t")))
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(1.0 + (F.col("_n") - F.col("_df") + 0.5)
                  / (F.col("_df") + 0.5)),
        )
        .withColumn(
            "_s",
            F.col("_idf") * F.col("_tf") * (k1 + 1.0)
            / (F.col("_tf")
               + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("_s"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def bm25_topk_oracle_sql(
    query: str,
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of bm25_topk — same tokenization, same formula, same
    6-decimal rounding, same tie-break — generated from the same
    parameters so the two engines cannot drift."""
    terms = sorted({t for t in query.strip().lower().split() if t})
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH tok AS (
    SELECT {id_col},
           unnest(regexp_split_to_array(trim(lower({text_col})), '\\s+')) AS t,
           len(regexp_split_to_array(trim(lower({text_col})), '\\s+')) AS dl
    FROM {table}
), stats AS (
    SELECT COUNT(*) AS n,
           AVG(len(regexp_split_to_array(trim(lower({text_col})), '\\s+'))) AS avgdl
    FROM {table}
), tf AS (
    SELECT {id_col}, t, COUNT(*) AS tf, MIN(dl) AS dl
    FROM tok WHERE t IN ({in_list})
    GROUP BY {id_col}, t
), dfreq AS (
    SELECT t, COUNT(*) AS df FROM tf GROUP BY t
)
SELECT {id_col}, ROUND(SUM(
    LN(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
    * tf.tf * ({k1} + 1.0)
    / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl / stats.avgdl))
), 6) AS score
FROM tf JOIN dfreq USING (t) CROSS JOIN stats
GROUP BY {id_col}
ORDER BY score DESC, {id_col} ASC
LIMIT {k}
"""
