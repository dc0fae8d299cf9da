"""PMI collocation mining — pointwise mutual information over adjacent
token pairs (Church & Hanks 1990), with the normalized variant (NPMI,
Bouma 2009) for corpus-size-independent thresholds.

Corpus analysis for training-data work: which word pairs co-occur far
above chance ("new york", "et al") — the statistics behind phrase
vocabularies, tokenizer merge candidates, and boilerplate discovery.
Everything is counting:

1. tokenize in-row (lowercased, whitespace — the drift/DSIR convention)
   and build bigrams from the token array itself (``transform`` over a
   ``sequence`` — no window or self-join over the exploded corpus),
2. one aggregate per unigram type and one per bigram type — the ONLY
   passes over the corpus; every shuffle after that is bounded by
   vocabulary size, never corpus size,
3. totals ride a 1-row broadcast (the allowlisted BNLJ pattern), the
   two unigram joins hash on token text (vocabulary-sized; AQE
   broadcasts them when small),
4. top-k is ``orderBy(...).limit(k)`` — TakeOrderedAndProject, never a
   global sort.

Definitions (natural log):
  PMI(x, y)  = ln( P(x,y) / (P(x) · P(y)) )  with  P(x,y) = c(xy)/N_big,
               P(w) = c(w)/N_tok
  NPMI(x, y) = PMI / (−ln P(x,y)),  in [−1, 1]; the degenerate
               P(x,y) = 1 corpus maps to 1 (the limit).

Reference parity: no analogue in idavkaev/kafka-streams-task; this is
the beyond-reference text-analysis mandate (the collocation /
phrase-statistics leg next to TF-IDF and the n-gram LM family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import WHITESPACE_RE


def _bigram_text_stream(df: DataFrame, text_col: str) -> DataFrame:
    """One row per in-document adjacent pair: (w1, w2), lowercased
    non-empty whitespace tokens, built in-row from the token array."""
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), WHITESPACE_RE),
            lambda x: x != "",
        ).alias("t")
    )
    k = F.size("t")
    return toks.select(
        F.explode(
            F.when(
                k >= 2,
                F.transform(
                    F.sequence(F.lit(2), k),
                    lambda i: F.struct(
                        F.element_at(F.col("t"), (i - 1).cast("int")).alias("w1"),
                        F.element_at(F.col("t"), i.cast("int")).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("b")
    ).select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))


def collocation_table(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Scored bigram table: ``(w1, w2, c_xy, c_x, c_y, n_bigrams,
    n_tokens, pmi, npmi)`` for every adjacent pair with c(xy) >=
    ``min_count``. Unigram counts use the FULL corpus (including tokens
    of 1-token documents, which form no bigram), so P(x) is the true
    marginal. Lazy end to end — no driver-side data; totals are 1-row
    aggregates broadcast into the result."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), WHITESPACE_RE),
                lambda x: x != "",
            )
        ).alias("w")
    )
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    big = (
        _bigram_text_stream(df, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c_xy"))
    )
    n_tok = uni.agg(F.sum("c").cast("double").alias("n_tokens"))
    n_big = big.agg(F.sum("c_xy").cast("double").alias("n_bigrams"))
    filt = big.filter(F.col("c_xy") >= min_count)
    joined = (
        filt.join(
            uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x")), on="w1"
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y")), on="w2"
        )
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_big))
    )
    p_xy = F.col("c_xy") / F.col("n_bigrams")
    p_x = F.col("c_x") / F.col("n_tokens")
    p_y = F.col("c_y") / F.col("n_tokens")
    pmi = F.log(p_xy / (p_x * p_y))
    npmi = F.when(p_xy == 1.0, F.lit(1.0)).otherwise(pmi / -F.log(p_xy))
    return joined.select(
        "w1",
        "w2",
        "c_xy",
        "c_x",
        "c_y",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        pmi.alias("pmi"),
        npmi.alias("npmi"),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """The ``top_k`` collocations by PMI (ties broken by (w1, w2)
    ascending — replays and speculative tasks agree). Global top-k is
    TakeOrderedAndProject: each task keeps k rows, the driver merges
    k-sized heaps — never a full sort."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    return (
        collocation_table(df, text_col, min_count)
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(top_k)
    )
