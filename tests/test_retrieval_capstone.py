"""The retrieval-wing capstone: BM25 retrieval → ranked evaluation →
hard-negative mining → calibrated rescoring → re-evaluation, composed
end to end over the real test corpus. Each stage is unit-tested
elsewhere; this pins that the wing COMPOSES — the run/qrels schemas
thread through retrieval, evaluation, and training-data mining without
glue code."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators import (
    apply_platt,
    bm25_top_docs,
    fit_platt,
    mine_hard_negatives,
    retrieval_eval,
    retrieval_eval_summary,
)


def test_retrieval_wing_end_to_end(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull() & F.col("doc_id").isNotNull())
        .select("doc_id", "text")
    )
    # queries: the first 5 docs' own text — each query's source doc is
    # its guaranteed-relevant target (the standard self-retrieval probe)
    queries = docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    run = bm25_top_docs(docs, queries, k=10).select(
        "query_id",
        "doc_id",
        F.col("score_micro").cast("double").alias("score"),
    )
    assert run.count() > 0

    # qrels: the source doc is rel 2; its doc_id+1 neighbor is rel 1
    qrels = queries.select(
        "query_id", F.col("query_id").alias("doc_id"), F.lit(2).alias("rel")
    ).unionByName(
        queries.select(
            "query_id",
            (F.col("query_id") + 1).alias("doc_id"),
            F.lit(1).alias("rel"),
        )
    )

    per = retrieval_eval(run, qrels, k=10)
    base = retrieval_eval_summary(per).collect()[0]
    assert base["n_queries"] == 5
    # self-retrieval: BM25 must put each query's own doc somewhere in
    # its top 10 — MRR and hit rate reflect that
    assert base["hit_rate"] > 0.0
    assert 0.0 <= base["mean_ndcg"] <= 1.0

    negs = mine_hard_negatives(run, qrels, k=3)
    negs_rows = negs.collect()
    assert len(negs_rows) > 0
    # no mined negative may be a judged-relevant doc
    pos = {
        (r["query_id"], r["doc_id"])
        for r in qrels.filter(F.col("rel") > 0).collect()
    }
    assert all((r["query_id"], r["doc_id"]) not in pos for r in negs_rows)

    # calibrated rescoring: positives + mined negatives form the
    # training pairs; Platt maps BM25 scores to probabilities, and the
    # monotone transform must leave every ranking metric unchanged
    labeled = run.join(
        qrels.select("query_id", "doc_id", "rel"),
        ["query_id", "doc_id"],
        "left",
    ).select(
        "query_id",
        "doc_id",
        "score",
        (F.coalesce(F.col("rel"), F.lit(0)) > 0).cast("int").alias("label"),
    )
    a, b = fit_platt(labeled)
    rescored = apply_platt(run, a, b).select(
        "query_id", "doc_id", F.col("prob").alias("score")
    )
    again = retrieval_eval_summary(
        retrieval_eval(rescored, qrels, k=10)
    ).collect()[0]
    if a > 0:  # monotone increasing calibration preserves order
        for m in ("map", "mrr", "mean_ndcg", "hit_rate"):
            assert again[m] == pytest.approx(base[m]), m
