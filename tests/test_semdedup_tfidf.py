"""Semantic dedup (SemDeDup) and TF-IDF keyword extraction."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyspark.sql.functions as F

from kafka_streams_task_spark.operators.dedup import semantic_dedup
from kafka_streams_task_spark.operators.tfidf import tfidf_top_terms


def _emb_df(spark, vecs: dict[int, list[float]]):
    rows = [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _random_vecs(n: int, dim: int = 8, seed: int = 7) -> dict[int, list[float]]:
    rng = np.random.default_rng(seed)
    return {i: rng.standard_normal(dim).tolist() for i in range(n)}


def test_semantic_dedup_planted_copies_dropped(spark):
    base = _random_vecs(40)
    planted = {i + 1000: base[i] for i in range(0, 40, 5)}  # exact copies
    out = semantic_dedup(
        _emb_df(spark, {**base, **planted}), n_clusters=4, threshold=0.95
    )
    rows = {r["vec_id"]: r for r in out.collect()}
    assert set(rows) == set(base) | set(planted)
    for i in planted:
        orig = rows[i - 1000]
        copy = rows[i]
        # identical vectors: same cluster, identical centroid_sim, one group
        assert copy["cluster"] == orig["cluster"]
        assert copy["centroid_sim"] == orig["centroid_sim"]
        assert copy["group_id"] == orig["group_id"] == i - 1000
        # tie on centroid_sim -> smaller id kept
        assert orig["keep"] and not copy["keep"]
    for i in set(base) - {i - 1000 for i in planted}:
        assert rows[i]["keep"] and rows[i]["group_id"] is None


def test_semantic_dedup_no_dups_all_keep(spark):
    """Well-separated random vectors: no edges at a high threshold — every
    row survives as a singleton (also drives connected_components on an
    empty edge set)."""
    out = semantic_dedup(_emb_df(spark, _random_vecs(24)), n_clusters=3, threshold=0.99)
    rows = out.collect()
    assert len(rows) == 24
    assert all(r["keep"] and r["group_id"] is None for r in rows)


def test_semantic_dedup_transitive_group_keeps_lowest_centroid_sim(spark):
    """A near-dup CHAIN (a~b, b~c) must collapse to ONE group via the
    transitive closure, keeping exactly the member least similar to the
    cluster centroid (SemDeDup's representative choice)."""
    rng = np.random.default_rng(3)
    a = rng.standard_normal(8)
    b = a + 0.02 * rng.standard_normal(8)
    c = b + 0.02 * rng.standard_normal(8)
    far = {i: rng.standard_normal(8).tolist() for i in range(10, 20)}
    vecs = {1: a.tolist(), 2: b.tolist(), 3: c.tolist(), **far}
    out = semantic_dedup(_emb_df(spark, vecs), n_clusters=1, threshold=0.95)
    rows = {r["vec_id"]: r for r in out.collect()}
    group = [rows[i] for i in (1, 2, 3)]
    assert all(g["group_id"] == 1 for g in group)
    kept = [g for g in group if g["keep"]]
    assert len(kept) == 1
    want = min(group, key=lambda g: (g["centroid_sim"], g["vec_id"]))
    assert kept[0]["vec_id"] == want["vec_id"]


def test_semantic_dedup_zero_vector_no_spurious_edges(spark):
    """A zero-norm vector's cosine is NaN; the NaN guard must keep it from
    welding its cluster into one group (Spark sorts NaN above numbers)."""
    vecs = _random_vecs(12)
    vecs[100] = [0.0] * 8
    out = semantic_dedup(_emb_df(spark, vecs), n_clusters=1, threshold=0.95)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert all(r["keep"] and r["group_id"] is None for r in rows.values())


def _tfidf_reference(corpus: dict[int, str], k: int):
    """Pure-python TF-IDF ground truth mirroring the engine formula."""
    toks = {d: t.strip().split() for d, t in corpus.items()}
    df = Counter()
    for t in toks.values():
        df.update(set(t))
    n = len(corpus)
    out = set()
    for d, t in toks.items():
        tf = Counter(t)
        scored = []
        for term, f_ in tf.items():
            idf = round(math.log((1.0 + n) / (1.0 + df[term])) + 1.0 + 1e-9, 6)
            scored.append((term, f_, df[term], round(f_ * idf * 1e6)))
        scored.sort(key=lambda s: (-s[3], s[0]))
        for rank, (term, f_, d_, micro) in enumerate(scored[:k], start=1):
            out.add((d, term, f_, d_, micro, rank))
    return out


def test_tfidf_matches_reference(spark):
    corpus = {
        1: "spark spark catalyst shuffle",
        2: "catalyst shuffle shuffle arrow",
        3: "arrow arrow arrow spark",
        4: "broadcast",
    }
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {
        (r["doc_id"], r["term"], r["tf"], r["df"], r["score_micro"], r["rank"])
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    assert got == _tfidf_reference(corpus, k=2)


def test_tfidf_rank_deterministic_on_ties(spark):
    """Equal scores break ties on term text: rank order is total."""
    docs = spark.createDataFrame([(1, "b a c")], "doc_id long, text string")
    rows = sorted(tfidf_top_terms(docs, k=3).collect(), key=lambda r: r["rank"])
    assert [r["term"] for r in rows] == ["a", "b", "c"]


def test_tfidf_plan_jvm_only(spark, sf_dir):
    """The whole operator must stay in the JVM: no Python stages, and the
    1-row corpus count rides in as a broadcast (no driver-side count)."""
    from kafka_streams_task_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = (
        tfidf_top_terms(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the broadcast 1-row n_docs


def test_semantic_dedup_malformed_vectors_counted(spark):
    """Ragged-row guard consistency (the r4 ANN-guard standard): null and
    wrong-dimension vectors are dropped from the assignment stage, COUNTED
    into the accumulator, and absent from the output — clean rows are
    unaffected."""
    from pyspark.sql import types as T

    from kafka_streams_task_spark.operators.similarity import (
        malformed_vector_accumulator,
    )

    good = _random_vecs(20)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    rows = [(i, v) for i, v in sorted(good.items())]
    bad = [(100, None), (101, [1.0, 2.0]), (102, [0.0] * 9)]
    emb = spark.createDataFrame(rows + bad, schema)

    acc = malformed_vector_accumulator(spark)
    out = semantic_dedup(emb, n_clusters=2, threshold=0.95, dropped_acc=acc)
    ids = {r["vec_id"] for r in out.collect()}
    assert ids == set(good)  # malformed rows absent, clean rows intact
    assert acc.value >= 3, f"guard dropped silently: {acc.value}"


def test_drop_semantic_duplicates_filters_copies(spark):
    from kafka_streams_task_spark.operators.dedup import drop_semantic_duplicates

    base = _random_vecs(20)
    emb = _emb_df(spark, {**base, **{i + 1000: base[i] for i in range(0, 20, 4)}})
    out = drop_semantic_duplicates(emb, emb, n_clusters=2, threshold=0.95)
    assert {r["vec_id"] for r in out.collect()} == set(base)
