"""Hashing-trick text classification (fastText-style NB baseline).

A quality/domain classifier you can train AND score entirely with
relational operators: tokens are hashed into `dim` buckets with the
repo's portable md5 bucket (operators/sampling.py — bit-identical in
Spark, DuckDB, Python), per-bucket Naive-Bayes log-odds weights come
from one grouped aggregation, and scoring is one explode + one
broadcast join + one per-doc sum.  No UDFs, no driver-side math, and
every step is SQL-expressible, so the full train→score pipeline is
value-checked against the DuckDB oracle.

Scale shape: training is a single shuffle (explode → groupBy bucket —
map-side combine applies, dim bounds the result at any corpus size);
the model is `dim` rows, so scoring joins it BROADCAST — the corpus is
never shuffled to score, and the per-doc sum groups on the id.  This is
the standard architecture for corpus-scale quality filters (the
"educational value" / fastText gates of public LLM-data pipelines),
with the classifier deliberately linear so 100 TB scoring stays in
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from prql_query_spark.engine.session import barrier

from .sampling import hash_bucket, hash_bucket_sql
from .text import tokens


def hashed_token_buckets(text_col: Column, dim: int = 256, seed: int = 7) -> Column:
    """Array of per-token feature ids in [0, dim) (hashing trick).
    Blank docs yield an EMPTY array — split('') produces a phantom ''
    token that would otherwise score every empty document on md5('')'s
    bucket."""
    toks = F.filter(tokens(text_col), lambda t: t != "")
    return F.transform(toks, lambda t: hash_bucket(t, seed, dim))


def train_nb_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    dim: int = 256,
    seed: int = 7,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-bucket NB log-odds weights from a boolean label column:

        w_b = ln((cnt_pos_b + alpha) / (tot_pos + alpha*dim))
            - ln((cnt_neg_b + alpha) / (tot_neg + alpha*dim))

    Returns exactly `dim` rows (bucket, w) — unseen buckets get the
    smoothed prior weight, so scoring never needs an outer join.

    Scale shape (round-11 re-plan): ONE pass over the training corpus.
    The bucket counts and the corpus totals used to be independent
    aggregates of the exploded-occurrence subtree, and Catalyst has no
    CSE below exchange boundaries, so the corpus was scanned+tokenized
    twice; the totals are EXACTLY the column sums of the per-bucket
    counts (every occurrence lands in exactly one bucket — plain
    integer identity), so they now derive from the lazily checkpointed
    <= dim-row counts table instead of re-deriving the corpus subtree.
    """
    spark = df.sparkSession
    ex = df.select(
        F.col(label_col).cast("boolean").alias("_y"),
        F.explode(hashed_token_buckets(F.col(text_col), dim, seed)).alias("bucket"),
    )
    counts = ex.groupBy("bucket").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(F.col("_y"), 0).otherwise(1)).alias("c_neg"),
    ).transform(barrier, eager=False)
    totals = counts.agg(
        F.sum("c_pos").alias("t_pos"),
        F.sum("c_neg").alias("t_neg"),
    )
    grid = spark.range(dim).select(F.col("id").cast("bigint").alias("bucket"))
    full = (
        grid.join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("c_pos", F.lit(0)).alias("c_pos"),
            F.coalesce("c_neg", F.lit(0)).alias("c_neg"),
        )
        .crossJoin(F.broadcast(totals))
    )
    w = (
        F.log((F.col("c_pos") + alpha) / (F.col("t_pos") + alpha * dim))
        - F.log((F.col("c_neg") + alpha) / (F.col("t_neg") + alpha * dim))
    )
    return full.select("bucket", w.alias("w"))


def score_nb_classifier(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 256,
    seed: int = 7,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """score = Σ_tokens w[bucket(token)], decimal-rounded to 6 digits
    (cross-engine float convention); pred = score > 0.  Docs with no
    tokens score 0.0.  Model joins broadcast — the corpus never shuffles
    for the join, only the per-doc sum groups on the id.

    Scale shape (round-11 re-plan): ONE pass over the scored corpus.
    Token-less docs used to be restored by a second corpus scan
    left-joined onto the per-doc sums; `explode_outer` keeps them in
    the occurrence stream as a single null-bucket row instead (every
    real token hashes into [0, dim) and the model grid is complete, so
    null is the only bucket the LEFT model join can miss).  A token-less
    doc therefore reaches the aggregate as exactly ONE all-null row, and
    `F.sum` over zero non-null values yields null (sum skips nulls — it
    is the absence of any non-null `w`, not the null row "nulling" the
    sum), which the coalesce maps to the same 0.0.

    ``passthrough`` (round-12, guide §2.4): extra ``df`` columns carried
    through the scoring pass and returned after ``pred``.  They ride the
    per-doc id shuffle as additional grouping keys (functionally
    dependent on the id, so the groups are unchanged), which lets
    evaluation callers keep their label column WITHOUT a second corpus
    scan + id join back onto the scores — the former
    ``scored.join(labeled, id)`` pattern cost every evaluation query an
    extra scan and shuffle."""
    passthrough = passthrough or []
    ex = df.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        F.explode_outer(
            hashed_token_buckets(F.col(text_col), dim, seed)).alias("bucket"),
    )
    scored = (
        ex.join(F.broadcast(model), "bucket", "left")
        .groupBy(id_col, *passthrough)
        .agg(F.sum("w").alias("_s"))
    )
    s6 = F.round(F.coalesce("_s", F.lit(0.0)).cast("decimal(38,12)"), 6).cast("double")
    return scored.select(id_col, s6.alias("score"), (s6 > 0).alias("pred"),
                         *passthrough)


def nb_oracle_sql(
    table: str,
    label_expr: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 256,
    seed: int = 7,
    alpha: float = 1.0,
) -> str:
    """DuckDB twin of train_nb_classifier + score_nb_classifier, generated
    from the same constants (true-twin oracle convention)."""
    bucket = hash_bucket_sql("t.tok", seed, dim)
    return f"""
WITH toks AS (
    SELECT {id_col}, ({label_expr}) AS y,
           unnest(regexp_split_to_array(trim(lower({text_col})), '\\s+')) AS tok
    FROM {table}
), b AS (
    SELECT {id_col}, y, {bucket} AS bucket FROM toks t WHERE t.tok <> ''
), counts AS (
    SELECT bucket,
           SUM(CASE WHEN y THEN 1 ELSE 0 END) AS c_pos,
           SUM(CASE WHEN y THEN 0 ELSE 1 END) AS c_neg
    FROM b GROUP BY bucket
), totals AS (
    SELECT SUM(CASE WHEN y THEN 1 ELSE 0 END) AS t_pos,
           SUM(CASE WHEN y THEN 0 ELSE 1 END) AS t_neg
    FROM b
), model AS (
    SELECT g.bucket,
           ln((COALESCE(c.c_pos, 0) + {alpha}) / (t.t_pos + {alpha} * {dim}))
         - ln((COALESCE(c.c_neg, 0) + {alpha}) / (t.t_neg + {alpha} * {dim})) AS w
    FROM (SELECT unnest(range(0, {dim})) AS bucket) g
    LEFT JOIN counts c USING (bucket), totals t
), scored AS (
    SELECT b.{id_col}, SUM(m.w) AS s
    FROM b JOIN model m USING (bucket)
    GROUP BY b.{id_col}
)
SELECT d.{id_col},
       CAST(ROUND(CAST(COALESCE(s.s, 0.0) AS DECIMAL(38,12)), 6) AS DOUBLE) AS score,
       CAST(ROUND(CAST(COALESCE(s.s, 0.0) AS DECIMAL(38,12)), 6) AS DOUBLE) > 0 AS pred
FROM {table} d LEFT JOIN scored s USING ({id_col})
"""


def classifier_report(
    scored: DataFrame,
    label_col: str = "label",
    pred_col: str = "pred",
) -> DataFrame:
    """Binary-classifier evaluation in ONE map-side-combined aggregate:
    confusion counts plus accuracy/precision/recall/F1 (6-decimal,
    DECIMAL-rounded per the cross-engine float convention; ratios of
    exact integer counts, so any SQL twin matches bit-for-bit).  The
    missing half of the train/score pair: the quality-gate loop is
    label -> train_nb_classifier -> score -> classifier_report ->
    threshold decision."""
    l_ = F.col(label_col).cast("boolean")
    p_ = F.col(pred_col).cast("boolean")
    agg = scored.agg(
        F.sum((l_ & p_).cast("long")).alias("tp"),
        F.sum((~l_ & p_).cast("long")).alias("fp"),
        F.sum((l_ & ~p_).cast("long")).alias("fn"),
        F.sum((~l_ & ~p_).cast("long")).alias("tn"),
    )

    def r6(c):
        return F.round(c.cast("decimal(38,12)"), 6).cast("double")

    tp, fp, fn, tn = (F.col(x) for x in ("tp", "fp", "fn", "tn"))
    return agg.select(
        "tp", "fp", "fn", "tn",
        r6((tp + tn) / (tp + fp + fn + tn)).alias("accuracy"),
        r6(tp / (tp + fp)).alias("precision"),
        r6(tp / (tp + fn)).alias("recall"),
        r6(2 * tp / (2 * tp + fp + fn)).alias("f1"),
    )


def calibration_bins(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Reliability-curve bins over a score: per fixed-width bin
    (out-of-range scores clamp to the edge bins), row count, exact-sum
    mean score, and positive fraction — what a threshold decision for a
    quality gate actually reads.  Mean uses the repo's exact-decimal
    convention (sum in DECIMAL once, divide by the exact count), so a
    SQL twin matches despite float partial-aggregation order."""
    width = (hi - lo) / bins
    b = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(score_col) - lo) / width)
                   .cast("int"))).alias("bin")
    g = scored.select(b, F.col(score_col).alias("_s"),
                      F.col(label_col).cast("boolean").alias("_y")) \
        .groupBy("bin").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_s").cast("decimal(28,6)")).alias("_ssum"),
            F.sum(F.col("_y").cast("long")).alias("_pos"))

    def r6(c):
        return F.round(c.cast("decimal(38,12)"), 6).cast("double")

    return g.select(
        "bin", "n",
        r6(F.col("_ssum").cast("double") / F.col("n")).alias("mean_score"),
        r6(F.col("_pos") / F.col("n")).alias("frac_pos"),
    ).orderBy("bin")
