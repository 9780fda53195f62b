"""Text-analysis operators for training-data pipelines.

Everything here is built-in-function SQL (split/regexp/higher-order
functions) — JVM-side, whole-stage-codegen friendly, no UDFs.  Each operator
has a deterministic definition so the DuckDB oracle can replicate it where
the function surface allows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Deliberately small + deterministic (not a library): the point is
# the Spark plumbing, not lexicography.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "y", "es", "no", "un", "una", "en", "por"],
}


def tokens(text_col: Column) -> Column:
    return F.split(F.trim(F.lower(text_col)), r"\s+")


def token_count(text_col: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    t = F.trim(text_col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


BPE_PIECE_RE = "[A-Za-z0-9_]+|[^\\sA-Za-z0-9_]"


def bpe_ish_token_count(text_col: Column) -> Column:
    """BPE-ish proxy: word-piece runs + individual punctuation marks.

    Uses regexp_extract_all with an RE2-compatible pattern (no lookarounds)
    so the DuckDB oracle can evaluate the identical regex."""
    return F.size(F.regexp_extract_all(text_col, F.lit(BPE_PIECE_RE), F.lit(0)))


def punct_ratio(text_col: Column) -> Column:
    total = F.length(text_col)
    punct = F.length(F.regexp_replace(text_col, r"[^\p{Punct}]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(punct / total)


def stopword_ratio(text_col: Column, lang: str = "en") -> Column:
    toks = tokens(text_col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(hits / F.size(toks))


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 20,
    max_chars: int = 100_000,
    min_tokens: int = 5,
    max_punct: float = 0.25,
) -> DataFrame:
    """The composite cleaning pass of a training-data pipeline in ONE plan:
    content-hash dedup (first doc per md5) then length / token-count /
    punctuation-ratio gates.  One window shuffle + one narrow filter-project;
    every metric is SQL-expressible, so the whole pipeline is value-checked
    against the DuckDB oracle (unlike the heuristic lang-ID/fingerprint
    profile ops).
    """
    from prql_query_spark.operators.dedup import dedup_exact

    t = F.col(text_col)
    deduped = dedup_exact(
        df.withColumn("_h", F.md5(t)), ["_h"], id_col
    ).drop("_h")
    return (
        deduped
        .withColumn("n_tokens", token_count(t).cast("long"))
        .withColumn("punct_ratio", F.round(punct_ratio(t), 4))
        .filter(
            (F.length(t) >= min_chars) & (F.length(t) <= max_chars)
            & (F.col("n_tokens") >= min_tokens)
            & (F.col("punct_ratio") <= max_punct)
        )
    )


def lang_id(text_col: Column) -> Column:
    """Stopword-vote language ID over the 4 built-in languages ('und' if no
    stopword hits at all)."""
    toks = tokens(text_col)
    scores = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        scores.append(
            (lang, F.size(F.filter(toks, lambda t: F.array_contains(sw, t))))
        )
    best_score = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    # reversed so earlier languages win ties (stable order: en de fr es)
    for lang, s in reversed(scores):
        expr = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(text_col: Column) -> Column:
    """Composite quality heuristic in [0,1]: length band + low punctuation +
    healthy stopword ratio.  Deterministic; thresholds follow common
    web-corpus filtering folklore (C4-style)."""
    n_tok = token_count(text_col)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), 1.0).otherwise(0.0)
    p = punct_ratio(text_col)
    punct_ok = F.when(p <= 0.3, 1.0 - p).otherwise(0.0)
    sw = stopword_ratio(text_col)
    sw_ok = F.when(sw >= 0.05, F.least(sw * 2, F.lit(1.0))).otherwise(sw * 4)
    return F.round((len_ok + punct_ok + sw_ok) / 3.0, 4)


def doc_fingerprint(text_col: Column) -> Column:
    """Order-insensitive content fingerprint: xxhash64 over the sorted
    distinct token set (canonicalized).  Robust to whitespace/word order."""
    toks = F.array_sort(F.array_distinct(tokens(text_col)))
    return F.xxhash64(F.concat_ws("", toks))


# PII patterns: RE2-compatible (no lookarounds/backrefs) so the DuckDB
# oracle evaluates the IDENTICAL regex.  Order matters: emails before IPs
# (an email's dotted domain must not be half-eaten by the IP rule).
PII_PATTERNS: list[tuple[str, str]] = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("PHONE", r"\+\d[\d() -]{7,}\d"),
]


def scrub_pii(text_col: Column) -> Column:
    """Redact emails / IPv4s / international-format phones to <TYPE> tags.

    Pure regexp_replace chain — JVM-side, codegen'd, no UDF; at 100 TB this
    pipelines into the scan with zero shuffle."""
    out = text_col
    for tag, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{tag}>")
    return out


def pii_counts(text_col: Column) -> dict[str, Column]:
    """Per-type match counts (for audit dashboards / drop-thresholds)."""
    return {
        tag.lower() + "_n": F.size(F.regexp_extract_all(text_col, F.lit(pat), F.lit(0)))
        for tag, pat in PII_PATTERNS
    }


def dup_token_fraction(text_col: Column, sep: str = r"\s+") -> Column:
    """Fraction of repeated units (lines with sep='\\n', words by default) —
    the Gopher/MassiveText repetition filter.  Computed entirely in one
    projection: 1 - distinct_units/units via array functions, no explode and
    no shuffle."""
    units = F.split(F.trim(text_col), sep)
    n = F.size(units)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        F.round(1.0 - F.size(F.array_distinct(units)) / n, 4)
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf.

    Plan shape (scale-minded): tokenize+explode → groupBy(doc,term) for tf
    [shuffle 1] → document frequency aggregated FROM the tf table, not the
    raw corpus [shuffle 2, vocabulary-sized] → join tf⋈df on term (small
    side broadcastable) → per-doc top-k window [shuffle 3].  The corpus
    text is read once; N(docs) comes from a scalar aggregate cross-join,
    not a driver-side count, so the whole thing is one submitted plan.

    idf = ln(N/df); ties broken by term for determinism.
    """
    from pyspark.sql import Window

    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0)
    )
    exploded = df.select(F.col(id_col), F.explode(toks).alias("term"))
    tf = exploded.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "rnk", "term", "tfidf")
    )


# Tiny deterministic valence lexicon (SURVEY §7.2 M6 "sentiment-lexicon").
# Like STOPWORDS: the point is the distributed scoring plumbing, not
# lexicography — swap in AFINN/VADER terms in production.
SENTIMENT_LEXICON = {
    "good": 1, "great": 2, "excellent": 3, "love": 2, "best": 2,
    "fast": 1, "happy": 2, "win": 1, "nice": 1, "clean": 1,
    "bad": -1, "terrible": -3, "awful": -2, "hate": -2, "worst": -2,
    "slow": -1, "sad": -2, "fail": -1, "dirty": -1, "broken": -2,
}


def sentiment_score(text_col: Column) -> Column:
    """Mean lexicon valence over tokens (0.0 when nothing matches).

    Pure built-in functions: the lexicon becomes a literal map column and
    each token is a map lookup inside one aggregate() pass — JVM-side,
    no UDF, no join, so it pipelines into the scan at any scale.
    """
    kv = []
    for w, v in SENTIMENT_LEXICON.items():
        kv += [F.lit(w), F.lit(v)]
    lex = F.create_map(*kv)
    toks = tokens(text_col)
    total = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.coalesce(lex[t], F.lit(0))
    )
    hits = F.size(F.filter(toks, lambda t: lex[t].isNotNull()))
    return F.when(hits == 0, F.lit(0.0)).otherwise(
        F.round(total.cast("double") / hits, 4)
    )


def ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    top_k: int | None = None,
) -> DataFrame:
    """Corpus-level n-gram frequency table (vocabulary building / contamination
    scans).  Tokens come from the same `[a-z0-9]+` extraction as tf-idf.

    The token array is materialized as a projected column BEFORE the
    sliding-window transform: Spark HOFs are interpreted (CodegenFallback)
    and re-evaluate referenced expressions per element, so inlining the
    regexp extraction into the lambda would re-run it once per n-gram.
    Plan: narrow project+explode, one groupBy shuffle; top-k via
    TakeOrderedAndProject (no global sort materialization).
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0))
    grams = (
        df.select(toks.alias("_toks"))
        .filter(F.size("_toks") >= n)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i, n)),
                )
            ).alias("ngram")
        )
    )
    out = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("n"))
    if top_k:
        out = out.orderBy(F.desc("n"), F.asc("ngram")).limit(top_k)
    return out


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass profile: all metrics as extra columns (single projection —
    Catalyst computes shared subtrees once per row batch)."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_pieces"),
        F.round(punct_ratio(t), 4).alias("punct_ratio"),
        F.round(stopword_ratio(t), 4).alias("stopword_ratio"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        doc_fingerprint(t).alias("fingerprint"),
    )
