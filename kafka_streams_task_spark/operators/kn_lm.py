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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import WHITESPACE_RE
from ..schemas import local_table


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
    local_table(
        spark,
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


#: the most recent kn_score_dense broadcast — retained so replacement
#: can unpersist it (the dsir_score_dense lifetime discipline)
_LAST_KN_BROADCAST: list = []


def _retain_kn_broadcast(b) -> None:
    while _LAST_KN_BROADCAST:
        prev = _LAST_KN_BROADCAST.pop()
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass  # context already stopped: nothing left to release
    _LAST_KN_BROADCAST.append(b)


def kn_release_dense(blocking: bool = False) -> bool:
    """Unpersist and drop the retained dense-model broadcast, if any;
    returns whether one was held (session-teardown companion to the
    replacement-time release inside :func:`kn_score_dense`)."""
    if not _LAST_KN_BROADCAST:
        return False
    b = _LAST_KN_BROADCAST.pop()
    try:
        b.unpersist(blocking=blocking)
    except Exception:
        pass
    return True


def kn_dense_model(
    model: KNBigramModel,
    max_bigrams: int = 500_000,
) -> dict:
    """Collapse (a bounded slice of) a fitted model into plain Python
    dicts for broadcast — the SERVE form :func:`kn_score_dense` ships
    to executors. The driver collect is BOUNDED by construction: the
    top ``max_bigrams`` bigram types by count (TakeOrderedAndProject),
    plus the context/continuation rows those types reference (derived
    driver-side from the kept set, never a second unbounded collect).

    Pruning degrades gracefully, never wrongly: a pruned-away bigram
    scores through the interpolation term of its (kept) context; a
    pruned-away context backs off to the continuation distribution —
    both are exactly the model's own treatment of UNSEEN events, so a
    pruned score is the score an identically-smoothed model with a
    smaller observed table would give. The global scalars (D, T, V —
    and therefore the continuation denominator) are NOT rescaled:
    probabilities stay calibrated to the full fit. At the default cap
    the broadcast is ~tens of MB; the exact, unpruned path is
    :func:`kn_bigram_score` (relational joins — no collect at all)."""
    if max_bigrams < 1:
        raise ValueError(f"max_bigrams must be >= 1, got {max_bigrams}")
    rows = (
        model.bigrams.orderBy(F.col("bf").desc(), "ph", "th")
        .limit(max_bigrams)
        .collect()
    )
    big = {(r["ph"], r["th"]): r["bf"] for r in rows}
    phs = {r["ph"] for r in rows}
    ths = {r["th"] for r in rows}
    spark = model.bigrams.sparkSession
    # kept-key semi-joins, not isin(...500k literals...): an InSet that
    # size stalls planning; a broadcast semi-probe against a keys frame
    # is the same bound with a sane plan
    ctx = {}
    if phs:
        keys = local_table(spark, [(p,) for p in phs], "ph bigint")
        ctx = {
            r["ph"]: (r["cf"], r["n_follow"])
            for r in model.contexts.join(
                F.broadcast(keys), on="ph", how="left_semi"
            ).collect()
        }
    cont = {}
    if ths:
        keys = local_table(spark, [(t,) for t in ths], "th bigint")
        cont = {
            r["th"]: r["n_prec"]
            for r in model.continuation.join(
                F.broadcast(keys), on="th", how="left_semi"
            ).collect()
        }
    return {
        "big": big,
        "ctx": ctx,
        "cont": cont,
        "d": model.d,
        "denom": float(model.t_types + model.v + 1),
    }


def kn_score_dense(
    df: DataFrame,
    model: KNBigramModel | dict,
    text_col: str = "text",
    max_bigrams: int = 500_000,
) -> DataFrame:
    """STATELESS scorer: appends ``kn_n_tokens`` / ``kn_avg_nll`` /
    ``kn_ppl`` to ``df`` with zero joins and zero shuffles — the
    streaming/hot-path twin of :func:`kn_bigram_score` (which is
    all-relational and oracle-replayable; gate exactness there).

    Tokenize + xxhash64 stay JVM codegen expressions (the model keys
    ARE Spark xxhash64 values — hashing must not move to Python); the
    pruned model (:func:`kn_dense_model`) rides as one broadcast and a
    single Arrow stage walks each document's hash array. Tokenless
    documents get NULL metrics (no row is dropped — this is a
    projection). Composes into Structured Streaming untouched: no
    stateful aggregation, no stream-static join.

    Broadcast lifetime: handle retained module-side, previous one
    unpersisted on replacement (:func:`kn_release_dense` drops the
    last). The UDF is marked ``asNondeterministic`` — factually it IS
    deterministic; the marker blocks filter pushdown from splitting a
    downstream ``kn_ppl <= t`` into a second Arrow stage (the r8
    dsir_score_dense lesson, measured 5-20×)."""
    from pyspark.sql.functions import pandas_udf

    dense = (
        model if isinstance(model, dict) else kn_dense_model(model, max_bigrams)
    )
    if "_kn_hashes" in df.columns:
        raise ValueError("df already has column '_kn_hashes'")
    b = df.sparkSession.sparkContext.broadcast(dense)
    _retain_kn_broadcast(b)

    @pandas_udf("double")
    def _nll(hs: pd.Series) -> pd.Series:
        m = b.value
        big, ctx, cont = m["big"], m["ctx"], m["cont"]
        d, denom = m["d"], m["denom"]
        import math

        out = []
        for arr in hs:
            if arr is None or len(arr) == 0:
                out.append(None)
                continue
            total = -math.log((cont.get(arr[0], 0) + 1.0) / denom)
            prev = arr[0]
            for cur in arr[1:]:
                pc = (cont.get(cur, 0) + 1.0) / denom
                c = ctx.get(prev)
                if c is not None:
                    cf, nf = c
                    bf = big.get((prev, cur), 0)
                    p = max(bf - d, 0.0) / cf + d * nf / cf * pc
                else:
                    p = pc
                total += -math.log(p)
                prev = cur
            out.append(total / len(arr))
        return pd.Series(out, dtype="float64")

    _nll = _nll.asNondeterministic()

    hashes = F.filter(
        F.split(F.trim(F.col(text_col)), WHITESPACE_RE), lambda x: x != ""
    )
    with_h = df.withColumn(
        "_kn_hashes", F.transform(hashes, lambda t: F.xxhash64(t))
    )
    return (
        with_h.withColumn("kn_avg_nll", _nll(F.col("_kn_hashes")))
        .withColumn(
            "kn_n_tokens",
            F.when(F.size("_kn_hashes") > 0, F.size("_kn_hashes")).cast("long"),
        )
        .withColumn("kn_ppl", F.exp("kn_avg_nll"))
        .drop("_kn_hashes")
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
