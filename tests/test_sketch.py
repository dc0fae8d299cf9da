"""Misra-Gries heavy-hitter sketch: candidate bound, retention guarantee,
and exact-recount top-k parity with the full aggregation."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _corpus(spark, rng, n_docs=300, vocab=400, doc_len=60, zipf_s=1.3):
    # zipf-ish corpus so a real top-k exists
    weights = [1.0 / (i + 1) ** zipf_s for i in range(vocab)]
    total = sum(weights)
    probs = [w / total for w in weights]
    words = [f"w{i}" for i in range(vocab)]
    rows = []
    for d in range(n_docs):
        toks = rng.choices(words, weights=probs, k=doc_len)
        rows.append((d, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_topk_matches_full_aggregation(spark):
    from kafka_streams_task_spark.operators.sketch import topk_tokens_sketched

    rng = random.Random(31)
    docs = _corpus(spark, rng)
    got = [
        (r["rank"], r["token"], r["n"])
        for r in topk_tokens_sketched(docs, k=15, capacity=1024)
        .orderBy("rank")
        .collect()
    ]
    exact = (
        docs.select(F.explode(F.split(F.trim("text"), r"[ \t\n\r\f]+")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("t").asc())
        .limit(15)
        .collect()
    )
    want = [(i + 1, r["t"], r["n"]) for i, r in enumerate(exact)]
    assert got == want


def test_candidate_bound_and_retention_guarantee(spark):
    from kafka_streams_task_spark.operators.sketch import misra_gries_candidates

    rng = random.Random(7)
    docs = _corpus(spark, rng, n_docs=200).repartition(4)
    capacity = 64
    cands = misra_gries_candidates(docs, capacity=capacity).collect()
    # at most capacity candidates per partition
    assert len(cands) <= 4 * capacity
    # retention guarantee: every token with global count > N/(capacity+1)
    # appears among the candidates
    counts = {}
    for r in docs.collect():
        for t in r["text"].split():
            counts[t] = counts.get(t, 0) + 1
    n_total = sum(counts.values())
    guaranteed = {t for t, c in counts.items() if c > n_total / (capacity + 1)}
    cand_set = {r["token"] for r in cands}
    assert guaranteed <= cand_set, guaranteed - cand_set


def test_planted_decrement_dynamics(spark):
    """capacity=2 on a stream whose c/d arrivals force decrement-all
    steps; exact recount still lands 'a' with its true count."""
    from kafka_streams_task_spark.operators.sketch import topk_tokens_sketched

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b b c"), (3, "d")], "doc_id long, text string"
    ).coalesce(1)
    rows = topk_tokens_sketched(docs, k=1, capacity=2).collect()
    assert [(r["rank"], r["token"], r["n"]) for r in rows] == [(1, "a", 4)]


def test_validation(spark):
    import pytest

    from kafka_streams_task_spark.operators.sketch import (
        misra_gries_candidates,
        topk_tokens_sketched,
    )

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="capacity"):
        misra_gries_candidates(docs, capacity=0)
    with pytest.raises(ValueError, match="k must be"):
        topk_tokens_sketched(docs, k=0)
