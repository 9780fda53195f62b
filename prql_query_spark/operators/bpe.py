"""Real byte-pair-encoding: learn merges from the corpus, apply at scale.

`bpe_ish_token_count` (text.py) is a regex proxy; this module is the real
algorithm, split the way production tokenizer pipelines split it:

* TRAINING (`learn_bpe_merges`) operates on the WORD-FREQUENCY table — one
  Spark aggregation reduces the corpus to (word, count), which is what
  classic BPE training consumes.  The merge loop itself runs driver-side
  over that dict, exactly like sentencepiece/HF trainers run single-node
  over a sample: at 100 TB you cap/sample the vocab (`max_vocab`), you do
  NOT loop over the corpus — the corpus is touched once.
* ENCODING (`bpe_encode`) is the distributed hot path: an Arrow-batched
  pandas UDF applying the learned merge ranks greedily (lowest rank
  first), with a per-batch word memo — corpora repeat words heavily, so
  each distinct word per batch is merged once.  No shuffle: encoding
  pipelines into the scan as a narrow projection.

Determinism: pair-count ties break lexicographically, so the merge list
is a pure function of the word-frequency table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prql_query_spark.operators.text import ASCII_WS
from pyspark.sql.types import ArrayType, StringType

END = "</w>"  # end-of-word sentinel, keeps merges word-internal


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over whitespace-split lowered text — the single corpus
    pass BPE training needs (map-side combined aggregate)."""
    return (
        df.select(F.explode(F.split(F.trim(F.lower(F.col(text_col))), ASCII_WS))
                  .alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    max_vocab: int = 100_000,
) -> list[tuple[str, str]]:
    """Classic BPE training over the aggregated word-frequency table.

    Collects at most `max_vocab` most-frequent words (the documented
    sample/cap for web scale) and runs the greedy most-frequent-pair loop
    driver-side.  Returns the ordered merge list.
    """
    rows = (
        word_counts(df, text_col)
        .orderBy(F.desc("n"), "word")
        .limit(max_vocab)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r.word) + (END,): r.n for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        # ties break to the lexicographically LARGEST pair (kv[0] in the
        # max key) — any fixed rule works, it just must be fixed
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append `out_col`: the text's BPE subword tokens (learned merges
    applied greedily by rank).  Arrow-batched pandas UDF with a per-batch
    word memo; narrow plan, no shuffle."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf(ArrayType(StringType()))
    def encode(texts):  # type: ignore[no-untyped-def]
        import pandas as pd

        memo: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").lower().split():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, ranks)
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, encode(F.col(text_col)))
