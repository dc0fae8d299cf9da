"""Interpolated Kneser-Ney bigram language model — train on a reference
corpus, score any corpus by perplexity.

The engine already carries two self-trained LM quality filters
(``sampling.unigram_nll_scores`` / ``bigram_nll_scores``: Laplace
smoothing, model == scored corpus). This module adds the piece a
production CCNet-style pipeline (Wenzek et al. 2020) actually runs:
an n-gram LM with KNESER-NEY smoothing — the KenLM default (Heafield
2011) — FITTED ONCE on a high-quality reference corpus (Wikipedia in
CCNet) and applied as a FROZEN model to held-out crawl text, so a
document's score measures distance from the reference distribution,
not typicality within its own (possibly garbage) corpus.

Math (interpolated KN, Kneser & Ney 1995; Chen & Goodman 1998 eq. 4.16):

    P(w | v) = max(c(v,w) - D, 0) / c(v)
             + (D * N1+(v,·) / c(v)) * Pcont(w)          when c(v) > 0
    P(w | v) = Pcont(w)                                  when v unseen

    Pcont(w) = (N1+(·,w) + 1) / (T + V + 1)

with c(v) = Σ_w c(v,w) (context total), N1+(v,·) = distinct followers
of v, N1+(·,w) = distinct left contexts of w, T = total distinct
bigram types, V = vocabulary size. The +1 / +V+1 in Pcont reserves
continuation mass for OOV words (an implicit <unk>), so every token
has finite probability — the add-one analogue of KenLM's explicit
unknown-word state. The discount is estimated from bigram
count-of-counts, D = n1 / (n1 + 2*n2) (Ney, Essen & Kneser 1994),
clamped to (0, 1); a document's first token is scored under Pcont
(the lower-order distribution, standard for interpolated KN).

Distributed shape (the ``bigram_nll_scores`` discipline): bigram pairs
build IN-ROW from the token array before any explode; all count tables
group on xxhash64 token keys, so token text never shuffles; the model
is a set of vocabulary-sized DISTRIBUTED DataFrames (never collected —
only 4 scalar statistics reach the driver); scoring is three hash
joins (bigram / context / continuation) that AQE broadcasts when the
model is small and shuffles otherwise. No Python stage anywhere.

Counts keyed by 64-bit hash are count-identical to counts keyed by
token text barring xxhash64 collisions (~n²/2⁶⁴ expected merged pairs;
immaterial to a thresholded average — the ``unigram_nll_scores``
collision budget).

Reference parity: no analogue in idavkaev/kafka-streams-task (no text
processing at all); beyond-reference training-data mandate, the
perplexity-filter line of SURVEY.md's north-star extensions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import WHITESPACE_RE


@dataclass(frozen=True)
class KNBigramModel:
    """A fitted interpolated-KN bigram model.

    ``bigrams`` (ph, th, bf), ``contexts`` (ph, cf, n_follow) and
    ``continuation`` (th, n_prec) are DISTRIBUTED count tables keyed by
    xxhash64 token hashes — vocabulary-sized, never collected. ``d`` is
    the absolute discount, ``t_types`` the total distinct bigram types,
    ``v`` the vocabulary size.

    The tables are lazy plans over the training corpus: scoring N
    corpora re-executes the count aggregation N times. Callers reusing
    one model across many scoring runs should materialize it once
    (write the three frames to parquet, or ``localCheckpoint`` them)
    — deliberately NOT done here, for the same reason
    ``unigram_nll_scores`` never persists: an unreleased pin held by a
    hidden handle squeezes executor memory in long sessions.
    """

    bigrams: DataFrame
    contexts: DataFrame
    continuation: DataFrame
    d: float
    t_types: int
    v: int


def _token_arrays(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, t) with t = non-empty whitespace tokens; NULL-text rows drop
    (they carry nothing to score or count)."""
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.filter(
            F.split(F.trim(F.col(text_col)), WHITESPACE_RE), lambda x: x != ""
        ).alias("t"),
    )


def _bigram_stream(toks: DataFrame, id_col: str) -> DataFrame:
    """(id, ph, th) — one row per in-document bigram position, built
    in-row from the token array (no window/self-join over the exploded
    corpus)."""
    k = F.size("t")
    return (
        toks.select(
            F.col(id_col),
            F.explode(
                F.when(
                    k >= 2,
                    F.transform(
                        F.sequence(F.lit(2), k),
                        lambda i: F.struct(
                            F.xxhash64(
                                F.element_at(F.col("t"), (i - 1).cast("int"))
                            ).alias("ph"),
                            F.xxhash64(
                                F.element_at(F.col("t"), i.cast("int"))
                            ).alias("th"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<ph:bigint,th:bigint>>"))
            ).alias("b"),
        )
        .select(id_col, F.col("b.ph").alias("ph"), F.col("b.th").alias("th"))
    )


def kn_bigram_fit(
    train: DataFrame,
    text_col: str = "text",
    discount: float | None = None,
) -> KNBigramModel:
    """Fit the interpolated-KN bigram model on ``train``.

    One action runs at fit time — a SINGLE aggregate collecting four
    scalars (bigram count-of-counts n1/n2 for the discount, total type
    count T, vocabulary size V); every count table stays a lazy
    distributed plan. Pass ``discount`` to pin D instead of estimating
    it (useful for cross-engine replays; the estimate is
    n1/(n1 + 2 n2) clamped to (0, 1), falling back to 0.75 when the
    count-of-counts degenerate — e.g. every bigram seen ≥ 3 times)."""
    # counting needs no document identity — tokenize with a constant id
    # (the bigram builder is per-row; the constant never groups anything)
    toks = _token_arrays(
        train.select(F.lit(0).alias("_kn_id"), F.col(text_col)),
        "_kn_id",
        text_col,
    )
    bi = _bigram_stream(toks, "_kn_id")
    bigrams = bi.groupBy("ph", "th").agg(F.count(F.lit(1)).alias("bf"))
    contexts = bigrams.groupBy("ph").agg(
        F.sum("bf").alias("cf"), F.count(F.lit(1)).alias("n_follow")
    )
    continuation = bigrams.groupBy("th").agg(
        F.count(F.lit(1)).alias("n_prec")
    )
    vocab = toks.select(F.explode("t").alias("tok")).select(
        F.xxhash64("tok").alias("h")
    )
    stats = bigrams.agg(
        F.sum(F.when(F.col("bf") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("bf") == 2, 1).otherwise(0)).alias("n2"),
        F.count(F.lit(1)).alias("t_types"),
    ).crossJoin(
        F.broadcast(vocab.agg(F.count_distinct("h").alias("v")))
    ).collect()[0]
    if int(stats["v"]) == 0:
        # a tokenless reference corpus would yield denom=1 → P=1 for
        # every token: a model that scores ALL text as perfectly
        # reference-like. Refuse loudly instead of filtering nothing.
        raise ValueError(
            "training corpus has no tokens (empty/NULL/whitespace text) "
            "— a KN model fitted on it would assign probability 1 to "
            "everything"
        )
    if discount is None:
        n1, n2 = stats["n1"] or 0, stats["n2"] or 0
        discount = n1 / (n1 + 2.0 * n2) if (n1 + 2 * n2) > 0 else 0.75
        discount = min(max(discount, 1e-9), 1.0 - 1e-9)
    return KNBigramModel(
        bigrams=bigrams,
        contexts=contexts,
        continuation=continuation,
        d=float(discount),
        t_types=int(stats["t_types"]),
        v=int(stats["v"]),
    )


def kn_bigram_score(
    df: DataFrame,
    model: KNBigramModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score ``df`` under the FROZEN model: ``(id, n_tokens, avg_nll,
    ppl)`` with avg_nll = mean −ln P over the document's tokens (first
    token under Pcont, the rest under interpolated KN) and
    ppl = exp(avg_nll). Documents with no tokens (NULL/empty/whitespace
    text) emit no row — there is nothing to score; left-join the result
    back when presence matters.

    Plan: one in-row bigram build + three left hash joins against the
    model tables + one per-document aggregate. OOV tokens and unseen
    contexts take the documented back-off mass — every position's
    probability is finite and the joins never drop a position."""
    toks = _token_arrays(df, id_col, text_col).filter(F.size("t") >= 1)
    denom = float(model.t_types + model.v + 1)
    d = F.lit(model.d)

    def p_cont(n_prec):
        return (F.coalesce(n_prec, F.lit(0)) + 1.0) / F.lit(denom)

    first = toks.select(
        id_col, F.xxhash64(F.element_at("t", 1)).alias("th")
    ).join(model.continuation, on="th", how="left").select(
        id_col, (-F.log(p_cont(F.col("n_prec")))).alias("nll")
    )

    bi = (
        _bigram_stream(toks, id_col)
        .join(model.bigrams, on=["ph", "th"], how="left")
        .join(model.contexts, on="ph", how="left")
        .join(model.continuation, on="th", how="left")
    )
    pc = p_cont(F.col("n_prec"))
    seen_ctx = (
        F.greatest(F.col("bf").cast("double") - d, F.lit(0.0)) / F.col("cf")
        + d * F.col("n_follow") / F.col("cf") * pc
    )
    rest = bi.select(
        id_col,
        (-F.log(F.when(F.col("cf").isNotNull(), seen_ctx).otherwise(pc))).alias(
            "nll"
        ),
    )
    return (
        first.unionByName(rest)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.avg("nll").alias("avg_nll"))
        .withColumn("ppl", F.exp("avg_nll"))
    )


def kn_model_write(model: KNBigramModel, path: str) -> None:
    """Materialize a fitted model at ``path`` (three parquet count
    tables + a one-row scalar table). Scoring re-executes a model
    table's lineage on every join against it — one fit-corpus
    aggregation per join, per scoring run — so a model reused across
    runs (the CCNet shape: fit Wikipedia once, filter every crawl
    snapshot) should be written once and read back: scoring then scans
    KB..GB of parquet counts instead of re-tokenizing the reference
    corpus, with no hidden executor-memory pin (cf. the
    ``unigram_nll_scores`` no-persist rationale)."""
    spark = model.bigrams.sparkSession
    model.bigrams.write.mode("overwrite").parquet(f"{path}/bigrams")
    model.contexts.write.mode("overwrite").parquet(f"{path}/contexts")
    model.continuation.write.mode("overwrite").parquet(f"{path}/continuation")
    spark.createDataFrame(
        [(model.d, model.t_types, model.v)],
        "d double, t_types bigint, v bigint",
    ).write.mode("overwrite").parquet(f"{path}/scalars")


def kn_model_read(spark, path: str) -> KNBigramModel:
    """Read a model written by :func:`kn_model_write`."""
    s = spark.read.parquet(f"{path}/scalars").collect()[0]
    return KNBigramModel(
        bigrams=spark.read.parquet(f"{path}/bigrams"),
        contexts=spark.read.parquet(f"{path}/contexts"),
        continuation=spark.read.parquet(f"{path}/continuation"),
        d=float(s["d"]),
        t_types=int(s["t_types"]),
        v=int(s["v"]),
    )


def kn_perplexity_filter(
    df: DataFrame,
    model: KNBigramModel,
    max_ppl: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The CCNet gate: keep documents whose perplexity under the
    reference model is at most ``max_ppl`` (CCNet buckets at corpus
    ppl terciles; compute the threshold with ``percentile_approx`` over
    a ``kn_bigram_score`` run when you want the same policy). Tokenless
    documents drop — they have no evidence of being reference-like.
    Returns ``df``'s columns plus ``ppl``."""
    scored = kn_bigram_score(df, model, id_col, text_col).select(
        id_col, "ppl"
    )
    return df.join(scored, on=id_col, how="inner").filter(
        F.col("ppl") <= F.lit(max_ppl)
    )
