"""Embedding-level benchmark decontamination: exact-tier goldens, the
LSH-subset-of-exact invariant, guaranteed exact-duplicate recall,
distinct-bench-vector semantics, and zero-vector safety."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.dedup import decontaminate_embedding

DIM = 8


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _rand_unit(rng):
    v = [rng.gauss(0, 1) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def test_exact_tier_golden(spark):
    a = [1.0] + [0.0] * (DIM - 1)
    b = [0.0, 1.0] + [0.0] * (DIM - 2)
    near_a = [0.999, 0.04] + [0.0] * (DIM - 2)  # cos ~0.9992 with a
    corpus = _emb(spark, [(1, a), (2, b), (3, near_a)])
    bench = _emb(spark, [(100, a)])
    got = {
        r["vec_id"]: r
        for r in decontaminate_embedding(
            corpus, bench, threshold=0.95, dim=DIM, exact=True
        ).collect()
    }
    assert set(got) == {1, 3}
    assert got[1]["n_bench_hits"] == 1
    assert got[1]["max_cos_sim"] == 1.0
    assert 0.99 <= got[3]["max_cos_sim"] <= 1.0


def test_duplicate_bench_vectors_collapse(spark):
    a = [1.0] + [0.0] * (DIM - 1)
    corpus = _emb(spark, [(1, a)])
    bench = _emb(spark, [(100, a), (101, a), (102, a)])
    got = decontaminate_embedding(
        corpus, bench, threshold=0.9, dim=DIM, exact=True
    ).collect()
    assert len(got) == 1 and got[0]["n_bench_hits"] == 1


def test_zero_vectors_are_safe(spark):
    z = [0.0] * DIM
    a = [1.0] + [0.0] * (DIM - 1)
    corpus = _emb(spark, [(1, z), (2, a)])
    bench = _emb(spark, [(100, z), (101, a)])
    got = decontaminate_embedding(
        corpus, bench, threshold=0.5, dim=DIM, exact=True
    ).collect()
    # zero-norm cosine is NULL on both sides -> only the real pair flags
    assert [(r["vec_id"], r["n_bench_hits"]) for r in got] == [(2, 1)]


def test_lsh_flags_subset_of_exact_and_all_planted_dups(spark):
    rng = random.Random(11)
    vecs = [_rand_unit(rng) for _ in range(80)]
    corpus = _emb(spark, list(enumerate(vecs)))
    # bench: exact copies of corpus ids 0..9 plus 5 fresh vectors
    bench_rows = [(1000 + i, vecs[i]) for i in range(10)] + [
        (2000 + i, _rand_unit(rng)) for i in range(5)
    ]
    bench = _emb(spark, bench_rows)
    kw = dict(threshold=0.95, dim=DIM, n_tables=8, n_planes=6)
    exact = {
        r["vec_id"]: r["n_bench_hits"]
        for r in decontaminate_embedding(
            corpus, bench, exact=True, **kw
        ).collect()
    }
    lsh = {
        r["vec_id"]: r["n_bench_hits"]
        for r in decontaminate_embedding(corpus, bench, **kw).collect()
    }
    # no false positives, never more hits than exact
    assert set(lsh) <= set(exact)
    for vid, hits in lsh.items():
        assert hits <= exact[vid]
    # identical vectors share every bucket: planted ids always flagged
    assert set(range(10)) <= set(lsh)
    assert all(exact[i] >= 1 for i in range(10))


def test_threshold_excludes_orthogonal(spark):
    a = [1.0] + [0.0] * (DIM - 1)
    b = [0.0, 1.0] + [0.0] * (DIM - 2)
    got = decontaminate_embedding(
        _emb(spark, [(1, a)]), _emb(spark, [(9, b)]),
        threshold=0.5, dim=DIM, exact=True,
    ).collect()
    assert got == []


def test_anti_join_drops_flagged(spark):
    a = [1.0] + [0.0] * (DIM - 1)
    b = [0.0, 1.0] + [0.0] * (DIM - 2)
    corpus = _emb(spark, [(1, a), (2, b)])
    flagged = decontaminate_embedding(
        corpus, _emb(spark, [(9, a)]), threshold=0.9, dim=DIM, exact=True
    )
    clean = corpus.join(flagged.select("vec_id"), "vec_id", "left_anti")
    assert [r["vec_id"] for r in clean.collect()] == [2]
