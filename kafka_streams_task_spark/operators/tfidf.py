"""Corpus TF-IDF keyword extraction.

The classic corpus-statistics operator an LLM-data pipeline uses for
keyword tagging, topic routing, and per-document summarization signals
(reference repo has no analogue — this extends the engine's text-analysis
family, SURVEY.md north-star extensions).

Formulation (sklearn's smoothed variant): ``idf = ln((1 + N) / (1 + df)) +
1`` with ``score = tf * idf``. Scores are exposed as integer micro-units
(``round(tf * round(idf, 6) * 1e6)``): ``round(idf, 6) * 1e6`` is an exact
integer-valued double and ``tf`` is integral, so the final rounding is
exact and the value survives a cross-engine hash compare bit-for-bit
(the mixrates/nll oracle pattern).

Scale: tokenize + explode is map-only; term frequencies are one
partial+final aggregate and document frequencies a window count over
that same table keyed by term (opt-r16: the old df-groupBy + join-back
gave the tokenize+tf chain two differently-pruned consumers, running
the corpus pass twice, and needed the same by-term shuffle the window
needs); the corpus row count rides in as a broadcast 1-row relation so
the whole operator is one declarative plan with no driver-side count;
top-k per document is a window partitioned by doc id (no global sort).
Nothing here leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import stable_round
from ..functions.text import tokens
from ..schemas import fan_out_scan


def bm25_top_docs(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "query_id",
    qtext_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents per query by BM25 (Robertson/Sparck Jones):
    ``(qid_col, id_col, score_micro, rank)``.

    The corpus-side retrieval operator for eval-set mining / RAG indexing
    over a crawl: score(q, d) = Σ_t∈q idf(t) · tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl)), idf(t) = ln(1 + (N − df + ½)/(df + ½)).
    Query terms are DEDUPLICATED (set semantics — repeated query terms
    score once), and avgdl counts every corpus doc (empty docs pull the
    mean down), both mirrored by the SQL oracle.

    Determinism: each term's contribution is rounded to integer
    micro-units FIRST, then summed — integer summation is
    order-independent, so the cross-engine compare survives any partial
    aggregation order (unlike summing doubles). idf is pre-rounded to 6dp
    (``stable_round``) like the TF-IDF path. Ranks order by
    (score_micro DESC, doc id ASC): total, tie-stable.

    Scale shape: no corpus-sized token shuffle exists. Exploded tokens
    filter against the BROADCAST query-term set before the tf
    aggregation, so only (doc, term) pairs a query mentions ever shuffle
    (df restricted to query terms equals global df for those terms — the
    restriction is value-preserving); doc lengths come from a map-only
    ``size(tokens)`` projection (an (id, int) relation — tiny next to
    the text — joined only to scoring candidates); n_docs/avgdl are one
    map-side-combined scan riding in as a broadcast 1-row relation. The
    final top-k is a window per query over candidate docs only (docs
    sharing ≥1 term), which compiles to WindowGroupLimit (per-partition
    heap before the shuffle). Nothing leaves the JVM.

    (Measured note, sf0.1: carrying dl through the explode instead of
    the separate map-only join reads nicely but regresses ~1.8× — the
    duplicated column inflates every generator output row and the tf
    aggregation buffer; the (id, int) join is strictly cheaper.)
    """
    qterms = queries.select(
        F.col(qid_col), F.explode(tokens(F.col(qtext_col))).alias("term")
    ).distinct()
    qterm_set = qterms.select("term").distinct()

    # opt-r16 (guide §2.5): a single-split corpus otherwise runs every
    # tokenize chain serially in its scan task; the fanned (id, text)
    # exchange is shared by the tf and dl chains below (identical
    # canonical subtree -> ReuseExchange scans the corpus once for both)
    # and is a no-op on real multi-split tables.
    corpus = fan_out_scan(docs.select(F.col(id_col), F.col(text_col)))
    # explode_outer + isNotNull instead of plain explode: the inferred
    # size(tokens)>0 generator filter otherwise sinks below the fan-out
    # exchange with the whole tokenize chain substituted in (a serial
    # duplicate evaluation). Same rows: split() never yields null
    # elements, and the null row explode_outer adds for empty/null
    # arrays fails the filter.
    tok = corpus.select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term").isNotNull())
    # map-side broadcast semi-filter: only query-matched tokens reach the
    # tf shuffle (on a real-vocabulary corpus this is the difference
    # between shuffling a few query terms and shuffling every token)
    tf = (
        tok.join(F.broadcast(qterm_set), "term")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = corpus.select(F.col(id_col), F.size(tokens(F.col(text_col))).alias("dl"))
    # opt-r16 (guide §2.4): df as a window count over the tf table itself
    # instead of a second groupBy + join back. The groupBy form gave the
    # tf subtree two consumers with different column pruning, so the
    # whole tokenize -> semi-filter -> aggregate chain ran TWICE (one
    # full extra corpus pass at scale); the window shuffles only the
    # query-matched candidate table, and its count equals the old
    # dft.df exactly (same rows, same key).
    tf = tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    # one broadcast row: corpus size and mean doc length (over ALL docs).
    # opt-r16: written as an aggregate over the dl projection — dl has
    # exactly one row per doc (a map-only projection of docs, no
    # filter), so count(1)/sum(dl) equal the old
    # count(1)/sum(size(tokens)) value-for-value. NOTE Catalyst still
    # re-expands the dl expression into this consumer's own (pruned,
    # fanned-out) subtree, so the corpus is scanned for this branch
    # either way; the measured r16 win for this operator is the chains
    # running parallel instead of fused serially into a single-split
    # scan, not a reduced pass count. A materialized dl would remove
    # the pass at 100 TB but costs a checkpoint barrier (measured
    # slower at bench scale; see OPTIMIZATION_r16.md).
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("double").alias("n_tokens"),
    ).select("n_docs", (F.col("n_tokens") / F.col("n_docs")).alias("avgdl"))

    contrib = (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            stable_round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                ),
                6,
            ),
        )
        .withColumn(
            "c_micro",
            F.round(
                F.col("idf")
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
                * F.lit(1e6)
                + F.lit(1e-9)
            ).cast("long"),
        )
    )
    scored = contrib.groupBy(qid_col, id_col).agg(F.sum("c_micro").alias("score_micro"))
    w = Window.partitionBy(qid_col).orderBy(F.col("score_micro").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "score_micro", "rank")
    )


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document:
    ``(id_col, term, tf, df, score_micro, rank)``.

    ``rank`` orders by (score_micro DESC, term ASC) — fully deterministic
    because ties are broken on the term text and scores are compared in
    exact integer micro-units, never raw doubles.
    """
    # opt-r16 (guide §2.5): parallelize the tokenize+partial-agg chain on
    # single-split sources (no-op on real multi-split tables)
    tok = (
        fan_out_scan(docs.select(F.col(id_col), F.col(text_col)))
        .select(
            F.col(id_col),
            # explode_outer + isNotNull: keeps the inferred generator
            # filter above the fan-out exchange (see bm25_top_docs)
            F.explode_outer(tokens(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term").isNotNull())
    )
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # opt-r16 (guide §2.4): df as a window count over tf instead of a
    # second groupBy + join back on term — the join form gave the
    # tokenize+tf chain two differently-pruned consumers (the whole
    # corpus pass ran twice), and the join needed the same by-term
    # shuffle the window needs. Identical df values: same rows, same key.
    tf = tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.crossJoin(F.broadcast(n_docs))
        .withColumn(
            "idf",
            stable_round(
                F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("df")))
                + F.lit(1.0),
                6,
            ),
        )
        .withColumn(
            "score_micro",
            F.round(F.col("tf") * F.col("idf") * F.lit(1e6)).cast("long"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score_micro").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score_micro", "rank")
    )
