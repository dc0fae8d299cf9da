"""PMI collocations: hand-computed goldens, a pure-Python reference
cross-check over a randomized corpus, and the edges (1-token docs in
the unigram marginal, the degenerate single-bigram corpus, null text,
top-k tie-break)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.collocations import (
    collocation_table,
    pmi_collocations,
)


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_hand_computed_pmi(spark):
    # corpus: "a b" x3, "a c", "b" -> N_tok = 9, N_big = 4
    df = _docs(spark, ["a b", "a b", "a b", "a c", "b"])
    rows = {
        (r["w1"], r["w2"]): r
        for r in collocation_table(df, min_count=1).collect()
    }
    assert set(rows) == {("a", "b"), ("a", "c")}
    ab = rows[("a", "b")]
    assert ab["c_xy"] == 3 and ab["c_x"] == 4 and ab["c_y"] == 4
    assert ab["n_tokens"] == 9 and ab["n_bigrams"] == 4
    want = math.log((3 / 4) / ((4 / 9) * (4 / 9)))
    assert ab["pmi"] == pytest.approx(want)
    assert ab["npmi"] == pytest.approx(want / -math.log(3 / 4))


def test_min_count_filters(spark):
    df = _docs(spark, ["a b", "a b", "a c"])
    got = {
        (r["w1"], r["w2"]) for r in collocation_table(df, min_count=2).collect()
    }
    assert got == {("a", "b")}


def test_one_token_docs_count_in_marginal_only(spark):
    # "c" alone adds to N_tok but forms no bigram
    with_single = collocation_table(
        _docs(spark, ["a b", "c"]), min_count=1
    ).collect()[0]
    without = collocation_table(_docs(spark, ["a b"]), min_count=1).collect()[0]
    assert with_single["n_tokens"] == 3 and without["n_tokens"] == 2
    assert with_single["n_bigrams"] == without["n_bigrams"] == 1


def test_degenerate_single_bigram_npmi_is_one(spark):
    r = collocation_table(_docs(spark, ["x y"]), min_count=1).collect()[0]
    assert r["npmi"] == 1.0


def test_lowercase_and_null_text(spark):
    df = spark.createDataFrame([("A b",), ("a B",), (None,)], "text string")
    rows = collocation_table(df, min_count=1).collect()
    assert [(r["w1"], r["w2"], r["c_xy"]) for r in rows] == [("a", "b", 2)]


def test_top_k_ordering_and_tie_break(spark):
    # all four bigrams distinct with equal counts -> equal-ish pmi where
    # marginals match; tie-break must be (w1, w2) ascending
    df = _docs(spark, ["p q", "p q", "r s", "r s"])
    got = [(r["w1"], r["w2"]) for r in pmi_collocations(df, min_count=1, top_k=2).collect()]
    assert got == [("p", "q"), ("r", "s")]


def test_bad_args(spark):
    df = _docs(spark, ["a b"])
    with pytest.raises(ValueError):
        collocation_table(df, min_count=0)
    with pytest.raises(ValueError):
        pmi_collocations(df, top_k=0)


def _reference(texts, min_count):
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for t in texts:
        toks = [w for w in t.lower().split() if w]
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    n_tok = sum(uni.values())
    n_big = sum(big.values())
    out = {}
    for (a, b), c in big.items():
        if c < min_count:
            continue
        p_xy = c / n_big
        pmi = math.log(p_xy / ((uni[a] / n_tok) * (uni[b] / n_tok)))
        npmi = 1.0 if p_xy == 1.0 else pmi / -math.log(p_xy)
        out[(a, b)] = (c, uni[a], uni[b], pmi, npmi)
    return out


def test_randomized_against_reference(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40)))
        for _ in range(60)
    ]
    want = _reference(texts, min_count=2)
    got = {
        (r["w1"], r["w2"]): r
        for r in collocation_table(_docs(spark, texts), min_count=2).collect()
    }
    assert set(got) == set(want)
    for key, (c, cx, cy, pmi, npmi) in want.items():
        r = got[key]
        assert (r["c_xy"], r["c_x"], r["c_y"]) == (c, cx, cy)
        assert r["pmi"] == pytest.approx(pmi)
        assert r["npmi"] == pytest.approx(npmi)
