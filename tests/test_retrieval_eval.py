"""Ranked-retrieval evaluation: hand-computed goldens, a pure-Python
reference cross-check over randomized (run, qrels) instances, and the
edge cases (judged-but-unretrieved queries, rel=0-only queries, score
ties, NaN scores)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.retrieval_eval import (
    rank_run,
    retrieval_eval,
    retrieval_eval_summary,
)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


RUN_SCHEMA = "query_id long, doc_id long, score double"
QRELS_SCHEMA = "query_id long, doc_id long, rel long"


def test_hand_computed_golden(spark):
    # q1: ranking d1(.9) d2(.8) d3(.7); rels d1=3 d3=1 (d2 judged 0)
    # q2: ranking d4(.9) d5(.5); rels d6=2 (never retrieved), d4=1
    run = _mk(
        spark,
        [
            (1, 1, 0.9),
            (1, 2, 0.8),
            (1, 3, 0.7),
            (2, 4, 0.9),
            (2, 5, 0.5),
        ],
        RUN_SCHEMA,
    )
    qrels = _mk(
        spark,
        [(1, 1, 3), (1, 2, 0), (1, 3, 1), (2, 6, 2), (2, 4, 1)],
        QRELS_SCHEMA,
    )
    per = {
        r["query_id"]: r
        for r in retrieval_eval(run, qrels, k=3).collect()
    }
    q1, q2 = per[1], per[2]

    # q1: hits 2/2, rr 1, AP = (1/1 + 2/3)/2
    assert q1["n_ret"] == 3 and q1["n_rel"] == 2 and q1["hits"] == 2
    assert q1["rr"] == 1.0
    assert q1["ap"] == pytest.approx((1.0 + 2.0 / 3.0) / 2.0)
    # DCG = 7/log2(2) + 1/log2(4) (the rel=1 doc sits at rank 3 behind
    # the judged-0 doc); IDCG packs it at rank 2: 7 + 1/log2(3)
    dcg1 = 7.0 / 1.0 + 1.0 / 2.0
    idcg1 = 7.0 + 1.0 / math.log2(3.0)
    assert q1["dcg"] == pytest.approx(dcg1)
    assert q1["idcg"] == pytest.approx(idcg1)
    assert q1["ndcg"] == pytest.approx(dcg1 / idcg1)
    assert q1["precision_at_k"] == pytest.approx(2.0 / 3.0)
    assert q1["recall_at_k"] == pytest.approx(1.0)

    # q2: only d4 retrieved-relevant; R=2 (d6 unreachable)
    assert q2["n_rel"] == 2 and q2["hits"] == 1
    assert q2["rr"] == 1.0
    assert q2["ap"] == pytest.approx(0.5)  # (1/1) / R=2
    assert q2["recall_at_k"] == pytest.approx(0.5)
    # IDCG ranks d6 (rel 2) first: 3/log2(2) + 1/log2(3)
    idcg2 = 3.0 + 1.0 / math.log2(3.0)
    assert q2["idcg"] == pytest.approx(idcg2)
    assert q2["ndcg"] == pytest.approx(1.0 / idcg2)

    s = retrieval_eval_summary(retrieval_eval(run, qrels, k=3)).collect()[0]
    assert s["n_queries"] == 2
    assert s["map"] == pytest.approx((q1["ap"] + q2["ap"]) / 2.0)
    assert s["mrr"] == pytest.approx(1.0)
    assert s["hit_rate"] == pytest.approx(1.0)


def test_judged_query_missing_from_run_scores_zero(spark):
    run = _mk(spark, [(1, 1, 0.9)], RUN_SCHEMA)
    qrels = _mk(spark, [(1, 1, 1), (2, 9, 2)], QRELS_SCHEMA)
    per = {r["query_id"]: r for r in retrieval_eval(run, qrels, k=5).collect()}
    assert set(per) == {1, 2}
    q2 = per[2]
    assert q2["n_ret"] == 0 and q2["hits"] == 0
    assert q2["ap"] == 0.0 and q2["ndcg"] == 0.0 and q2["rr"] == 0.0
    assert q2["idcg"] > 0.0


def test_rel_zero_only_query_excluded(spark):
    run = _mk(spark, [(1, 1, 0.9), (2, 2, 0.9)], RUN_SCHEMA)
    qrels = _mk(spark, [(1, 1, 1), (2, 2, 0)], QRELS_SCHEMA)
    got = retrieval_eval(run, qrels, k=5).collect()
    assert [r["query_id"] for r in got] == [1]


def test_tie_break_is_doc_ascending(spark):
    run = _mk(
        spark, [(1, 30, 0.5), (1, 10, 0.5), (1, 20, 0.5)], RUN_SCHEMA
    )
    ranked = rank_run(run, k=2).orderBy("rank").collect()
    assert [(r["doc_id"], r["rank"]) for r in ranked] == [(10, 1), (20, 2)]


def test_nan_and_null_scores_excluded(spark):
    run = _mk(
        spark,
        [(1, 1, float("nan")), (1, 2, None), (1, 3, 0.1)],
        RUN_SCHEMA,
    )
    ranked = rank_run(run, k=10).collect()
    assert [(r["doc_id"], r["rank"]) for r in ranked] == [(3, 1)]


def test_linear_gain(spark):
    run = _mk(spark, [(1, 1, 0.9), (1, 2, 0.8)], RUN_SCHEMA)
    qrels = _mk(spark, [(1, 1, 2), (1, 2, 3)], QRELS_SCHEMA)
    r = retrieval_eval(run, qrels, k=2, gain="linear").collect()[0]
    dcg = 2.0 / 1.0 + 3.0 / math.log2(3.0)
    idcg = 3.0 / 1.0 + 2.0 / math.log2(3.0)
    assert r["dcg"] == pytest.approx(dcg)
    assert r["ndcg"] == pytest.approx(dcg / idcg)


def test_bad_args(spark):
    run = _mk(spark, [(1, 1, 0.9)], RUN_SCHEMA)
    with pytest.raises(ValueError):
        rank_run(run, k=0)
    with pytest.raises(ValueError):
        retrieval_eval(run, run, gain="sqrt")


def _reference_eval(run_rows, qrel_rows, k, gain="exp"):
    """Pure-Python trec_eval-convention reference."""
    by_q: dict[int, list[tuple[float, int]]] = {}
    for q, d, s in run_rows:
        by_q.setdefault(q, []).append((s, d))
    rels: dict[int, dict[int, int]] = {}
    for q, d, r in qrel_rows:
        rels.setdefault(q, {})[d] = r
    g = (lambda r: 2.0**r - 1.0) if gain == "exp" else float
    out = {}
    for q, jm in rels.items():
        pool = sorted((r for r in jm.values() if r > 0), reverse=True)
        if not pool:
            continue
        idcg = sum(g(r) / math.log2(i + 2) for i, r in enumerate(pool[:k]))
        ranked = sorted(by_q.get(q, []), key=lambda t: (-t[0], t[1]))[:k]
        hits = dcg = ap = 0.0
        rr = 0.0
        for i, (_, d) in enumerate(ranked):
            rel = jm.get(d, 0)
            if rel > 0:
                hits += 1
                dcg += g(rel) / math.log2(i + 2)
                ap += hits / (i + 1)
                if rr == 0.0:
                    rr = 1.0 / (i + 1)
        n_rel = len(pool)
        out[q] = dict(
            hits=int(hits),
            n_rel=n_rel,
            precision_at_k=hits / k,
            recall_at_k=hits / n_rel,
            rr=rr,
            ap=ap / n_rel,
            ndcg=(dcg / idcg) if idcg > 0 else 0.0,
        )
    return out


def test_randomized_against_reference(spark):
    rng = random.Random(42)
    run_rows, qrel_rows = [], []
    for q in range(12):
        docs = rng.sample(range(200), rng.randint(0, 25))
        # quantized scores force ties through the doc-id tie-break
        run_rows += [(q, d, rng.randint(0, 9) / 10.0) for d in docs]
        judged = rng.sample(range(200), rng.randint(1, 30))
        qrel_rows += [(q, d, rng.randint(0, 3)) for d in judged]
    run = _mk(spark, run_rows, RUN_SCHEMA)
    qrels = _mk(spark, qrel_rows, QRELS_SCHEMA)
    for k in (1, 5, 20):
        want = _reference_eval(run_rows, qrel_rows, k)
        got = {
            r["query_id"]: r for r in retrieval_eval(run, qrels, k=k).collect()
        }
        assert set(got) == set(want)
        for q, w in want.items():
            for key, val in w.items():
                assert got[q][key] == pytest.approx(val), (k, q, key)


def test_summary_columns(spark):
    run = _mk(spark, [(1, 1, 0.9)], RUN_SCHEMA)
    qrels = _mk(spark, [(1, 1, 1)], QRELS_SCHEMA)
    s = retrieval_eval_summary(retrieval_eval(run, qrels, k=1))
    assert s.columns == [
        "n_queries",
        "map",
        "mrr",
        "mean_ndcg",
        "mean_precision",
        "mean_recall",
        "hit_rate",
    ]


def test_negative_rel_clamps_to_zero(spark):
    # trec's judged-unusable (-1) must behave exactly like rel = 0:
    # no negative gain, no pool membership
    run = _mk(spark, [(1, 1, 0.9), (1, 2, 0.8)], RUN_SCHEMA)
    qrels_neg = _mk(spark, [(1, 1, 1), (1, 2, -1)], QRELS_SCHEMA)
    qrels_zero = _mk(spark, [(1, 1, 1), (1, 2, 0)], QRELS_SCHEMA)
    a = retrieval_eval(run, qrels_neg, k=2).collect()[0]
    b = retrieval_eval(run, qrels_zero, k=2).collect()[0]
    assert a.asDict() == b.asDict()
    assert a["dcg"] == pytest.approx(1.0) and a["n_rel"] == 1


def test_mine_hard_negatives(spark):
    from kafka_streams_task_spark.operators.retrieval_eval import (
        mine_hard_negatives,
    )

    run = _mk(
        spark,
        [(1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7), (1, 13, 0.6)],
        RUN_SCHEMA,
    )
    # 10 is a positive, 11 judged-0 (confirmed negative), 12 unjudged
    qrels = _mk(spark, [(1, 10, 2), (1, 11, 0)], QRELS_SCHEMA)
    got = [
        (r["doc_id"], r["rank"])
        for r in mine_hard_negatives(run, qrels, k=2)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(11, 1), (12, 2)]  # positive gone, ranks re-packed
