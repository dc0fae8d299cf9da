"""BM25 retrieval (operators/tfidf.py) and the hashed-feature logistic
classifier (operators/classifier.py) against pure-Python/numpy references."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.classifier import (
    hashed_features,
    logreg_score,
    logreg_train,
)
from kafka_streams_task_spark.operators.tfidf import bm25_top_docs

_WS = re.compile(r"[ \t\n\r\f]+")


def _toks(text):
    return _WS.split(text.strip())


def _bm25_reference(docs, queries, k1=1.2, b=0.75):
    """(query_id, doc_id) -> score_micro, mirroring the operator's
    per-term micro rounding exactly."""
    tf = {d: {} for d, _ in docs}
    for d, text in docs:
        for t in _toks(text):
            tf[d][t] = tf[d].get(t, 0) + 1
    df = {}
    for d in tf:
        for t in tf[d]:
            df[t] = df.get(t, 0) + 1
    n = float(len(docs))
    avgdl = sum(len(_toks(t)) for _, t in docs) / n
    out = {}
    for q, qtext in queries:
        for d, _ in docs:
            s = 0
            for t in set(_toks(qtext)):
                if t not in tf[d]:
                    continue
                idf = round(
                    math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)) + 1e-9, 6
                )
                f = tf[d][t]
                c = idf * (f * (k1 + 1.0)) / (f + k1 * ((1.0 - b) + b * len(_toks(dict(docs)[d])) / avgdl))
                s += int(round(c * 1e6 + 1e-9))
            if s:
                out[(q, d)] = s
    return out


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox"),
    (3, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
    (4, "quick quick quick fox fox dog"),
    (5, "a completely unrelated document about spark and parquet files"),
    (6, "dog"),
]
QUERIES = [(100, "quick fox"), (200, "dog"), (300, "spark parquet"), (400, "absent terms only")]


def test_bm25_matches_python_reference(spark):
    docs = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in DOCS])
    qs = spark.createDataFrame([Row(query_id=q, text=t) for q, t in QUERIES])
    got = {
        (r.query_id, r.doc_id): (r.score_micro, r.rank)
        for r in bm25_top_docs(docs, qs, k=10).collect()
    }
    ref = _bm25_reference(DOCS, QUERIES)
    assert {k: v[0] for k, v in got.items()} == ref
    # ranks: per query, descending score with doc_id tie-break
    for q in {q for q, _ in ref}:
        ordered = sorted(
            [(d, s) for (qq, d), s in ref.items() if qq == q],
            key=lambda x: (-x[1], x[0]),
        )
        for rank0, (d, _) in enumerate(ordered):
            assert got[(q, d)][1] == rank0 + 1
    # a query with no matching terms returns nothing (absent, not zero)
    assert not [k for k in got if k[0] == 400]


def test_bm25_top_k_truncates(spark):
    docs = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in DOCS])
    qs = spark.createDataFrame([Row(query_id=100, text="quick fox dog the")])
    got = bm25_top_docs(docs, qs, k=2).collect()
    assert len(got) == 2
    assert sorted(r.rank for r in got) == [1, 2]


def test_bm25_repeated_query_terms_score_once(spark):
    docs = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in DOCS])
    once = spark.createDataFrame([Row(query_id=1, text="dog")])
    thrice = spark.createDataFrame([Row(query_id=1, text="dog dog dog")])
    a = {(r.doc_id): r.score_micro for r in bm25_top_docs(docs, once).collect()}
    b = {(r.doc_id): r.score_micro for r in bm25_top_docs(docs, thrice).collect()}
    assert a == b


# ---------------------------------------------------------------- classifier

N_FEAT = 1 << 12

SPAM_MARKERS = ["viagra", "casino", "winner", "lottery", "xxx"]
HAM_WORDS = ["the", "report", "shows", "steady", "growth", "in", "quarterly", "revenue"]


def _corpus():
    rng = np.random.RandomState(7)
    rows = []
    for i in range(60):
        spam = i % 2
        words = list(rng.choice(HAM_WORDS, size=8))
        if spam:
            words += list(rng.choice(SPAM_MARKERS, size=3))
        rng.shuffle(words)
        rows.append((i, " ".join(words), spam))
    return rows


def _feat_idx(term):
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % N_FEAT


def _numpy_train(rows, n_iter, lr):
    X = {}
    y = np.array([float(s) for _, _, s in rows])
    for r, (_, text, _) in enumerate(rows):
        for t in _toks(text):
            X[(r, _feat_idx(t))] = X.get((r, _feat_idx(t)), 0.0) + 1.0
    idxs = sorted({j for _, j in X})
    jmap = {j: c for c, j in enumerate(idxs)}
    M = np.zeros((len(rows), len(idxs)))
    for (r, j), v in X.items():
        M[r, jmap[j]] = v
    w = np.zeros(len(idxs))
    n = float(len(rows))
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(M @ w)))
        g = M.T @ (p - y) / n
        w = w - lr * g
    return {j: w[jmap[j]] for j in idxs}


def test_hashed_features_match_python_hash(spark):
    rows = _corpus()[:5]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t, _ in rows])
    got = {
        (r.doc_id, r.idx): r.cnt
        for r in hashed_features(df, n_features=N_FEAT).collect()
    }
    ref = {}
    for i, t, _ in rows:
        for tok in _toks(t):
            key = (i, _feat_idx(tok))
            ref[key] = ref.get(key, 0.0) + 1.0
    assert got == ref


def test_logreg_train_matches_numpy_and_separates(spark):
    rows = _corpus()
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, label=s) for i, t, s in rows]
    )
    weights = logreg_train(df, n_features=N_FEAT, n_iter=8, lr=2.0)
    got = {r.idx: r.w for r in weights.collect()}
    ref = _numpy_train(rows, n_iter=8, lr=2.0)
    assert set(got) == set(ref)
    for j in ref:
        assert got[j] == pytest.approx(ref[j], rel=1e-9, abs=1e-12)

    scored = logreg_score(df, weights, n_features=N_FEAT).collect()
    spam_scores = [r.prob for r in scored if r.doc_id % 2 == 1]
    ham_scores = [r.prob for r in scored if r.doc_id % 2 == 0]
    assert min(spam_scores) > max(ham_scores), "planted spam must separate"
    assert len(scored) == len(rows)


def test_logreg_score_unseen_doc_gets_bias(spark):
    rows = _corpus()
    df = spark.createDataFrame([Row(doc_id=i, text=t, label=s) for i, t, s in rows])
    weights = logreg_train(df, n_features=N_FEAT, n_iter=2, lr=1.0)
    fresh = spark.createDataFrame(
        [Row(doc_id=999, text="zzzunseen qqqtokens onlyhere")]
    )
    got = logreg_score(fresh, weights, n_features=N_FEAT, bias=0.25).collect()
    assert len(got) == 1
    assert got[0].margin == pytest.approx(0.25)


def test_logreg_train_is_layout_independent(spark):
    rows = _corpus()
    df = spark.createDataFrame([Row(doc_id=i, text=t, label=s) for i, t, s in rows])
    w1 = {
        r.idx: r.w
        for r in logreg_train(df.repartition(1), n_features=N_FEAT, n_iter=3, lr=1.0).collect()
    }
    w2 = {
        r.idx: r.w
        for r in logreg_train(df.repartition(7, "text"), n_features=N_FEAT, n_iter=3, lr=1.0).collect()
    }
    assert set(w1) == set(w2)
    for j in w1:
        assert w1[j] == pytest.approx(w2[j], rel=1e-9, abs=1e-12)


def test_classifier_train_leaves_one_checkpoint(spark):
    """Training may leave ONLY the returned weight table's checkpoint
    blocks behind (the bounded result); feature/intermediate rounds must
    be freed (no-cached-blocks standard)."""
    jsc = spark.sparkContext._jsc
    before = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}
    rows = _corpus()
    df = spark.createDataFrame([Row(doc_id=i, text=t, label=s) for i, t, s in rows])
    weights = logreg_train(df, n_features=N_FEAT, n_iter=3, lr=1.0)
    weights.count()
    leaked = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()} - before
    assert len(leaked) <= 1, f"leaked cached RDDs: {sorted(leaked)}"
