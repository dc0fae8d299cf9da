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

Scale: tokenize + explode is map-only; term frequencies and document
frequencies are two partial+final aggregates (the df table derives from
the tf table — the corpus is tokenized exactly once); the idf join is a
plain hash join on the term (the df relation is |vocab| rows — NOT assumed
broadcastable); the corpus row count rides in as a broadcast 1-row
relation so the whole operator is one declarative plan with no
driver-side count; top-k per document is a window partitioned by doc id
(no global sort). Nothing here leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import stable_round
from ..functions.text import tokens


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
    tok = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(n_docs))
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
