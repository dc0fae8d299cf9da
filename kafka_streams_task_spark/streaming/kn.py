"""Streaming Kneser-Ney perplexity filtering at ingest — the KN twin
of ``streaming/dsir.py``.

Batch KN (operators/kn_lm.py) scores a corpus at rest through three
relational joins; a continuous crawl wants the reference-corpus model
applied as documents ARRIVE, so off-distribution pages never land. The
serve scorer (``kn_score_dense``) makes that a STATELESS projection:
tokenize + xxhash64 stay JVM expressions, the pruned model rides as
one broadcast, a single Arrow stage walks each document's hash array —
no stream-static join, no stateful aggregation, no watermark, so it
drops into any Structured Streaming pipeline (including the
``transform=`` hook of the ingest sources) without adding state.

Train/serve symmetry: the dense scorer evaluates the SAME interpolated
KN formula the batch scorer does; on an unpruned model the two agree
to float-sum order (~1e-12), and pruning degrades only by routing rare
events through the model's own unseen-event treatment (documented in
``kn_dense_model``). Gate exactness on the relational form.

Reference parity: no analogue (the reference engine filters nothing) —
beyond-reference training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.kn_lm import KNBigramModel, kn_dense_model, kn_score_dense


def streaming_kn_filter(
    stream: DataFrame,
    model: KNBigramModel | dict,
    max_ppl: float,
    text_col: str = "text",
    max_bigrams: int = 500_000,
    keep_scores: bool = True,
) -> DataFrame:
    """Keep stream rows whose perplexity under the reference model is
    at most ``max_ppl``. Tokenless documents (NULL/empty/whitespace
    text) are DROPPED — no evidence of being reference-like, the
    ``kn_perplexity_filter`` policy.

    ``model`` is a fitted :class:`KNBigramModel` (collapsed to the
    broadcast dicts at PLAN-BUILD time — which is why its count tables
    must be batch frames) or an already-collapsed ``kn_dense_model``
    dict: pre-collapse once when starting several queries off one
    model, so each query does not redo the bounded collect.
    ``keep_scores`` retains ``kn_n_tokens``/``kn_avg_nll``/``kn_ppl``
    for the sink (the audit trail of WHY a page survived)."""
    if isinstance(model, KNBigramModel):
        if model.bigrams.isStreaming:
            raise ValueError(
                "model count tables must be batch DataFrames (a fitted "
                "model), not streams"
            )
        model = kn_dense_model(model, max_bigrams)
    scored = kn_score_dense(stream, model, text_col=text_col).filter(
        F.col("kn_ppl") <= F.lit(float(max_ppl))
    )
    if keep_scores:
        return scored
    return scored.drop("kn_n_tokens", "kn_avg_nll", "kn_ppl")
