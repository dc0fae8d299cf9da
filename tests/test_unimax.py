"""UniMax waterfilling: goldens, budget-exceeds-capacity, epoch caps,
zero-token groups, conservation, randomized pure-Python reference."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.sampling import unimax_allocation


def _counts(spark, rows):
    return spark.createDataFrame(rows, "lang string, n_tokens long")


def _alloc(spark, rows, budget, max_epochs=1.0):
    out = unimax_allocation(
        _counts(spark, rows), budget, max_epochs, token_col="n_tokens"
    )
    return {r["lang"]: r for r in out.collect()}


def test_waterfill_golden(spark):
    got = _alloc(spark, [("a", 10), ("b", 20), ("c", 70)], budget=60)
    assert got["a"]["alloc"] == pytest.approx(10.0)  # capped
    assert got["b"]["alloc"] == pytest.approx(20.0)  # capped
    assert got["c"]["alloc"] == pytest.approx(30.0)  # at the level
    assert got["c"]["epochs"] == pytest.approx(30.0 / 70.0)
    assert got["a"]["epochs"] == pytest.approx(1.0)


def test_budget_exceeds_capacity(spark):
    got = _alloc(spark, [("a", 10), ("b", 20)], budget=100)
    assert got["a"]["alloc"] == pytest.approx(10.0)
    assert got["b"]["alloc"] == pytest.approx(20.0)


def test_uniform_level(spark):
    got = _alloc(spark, [("a", 20), ("b", 20), ("c", 20)], budget=30)
    for g in "abc":
        assert got[g]["alloc"] == pytest.approx(10.0)


def test_epoch_cap_scales_capacity(spark):
    got = _alloc(spark, [("a", 10), ("b", 100)], budget=60, max_epochs=2.0)
    # a's capacity is 20 (2 epochs), level takes the rest
    assert got["a"]["alloc"] == pytest.approx(20.0)
    assert got["a"]["epochs"] == pytest.approx(2.0)
    assert got["b"]["alloc"] == pytest.approx(40.0)


def test_zero_token_group(spark):
    got = _alloc(spark, [("a", 0), ("b", 10)], budget=5)
    assert got["a"]["alloc"] == 0.0 and got["a"]["epochs"] == 0.0
    assert got["b"]["alloc"] == pytest.approx(5.0)


def test_text_col_counting(spark):
    df = spark.createDataFrame(
        [("en", "a b c"), ("en", "d e"), ("de", "x y z w")],
        "lang string, text string",
    )
    got = {
        r["lang"]: r["n_tokens"]
        for r in unimax_allocation(df, budget=100).collect()
    }
    assert got == {"en": 5, "de": 4}


def test_bad_args(spark):
    df = _counts(spark, [("a", 1)])
    with pytest.raises(ValueError):
        unimax_allocation(df, budget=0, token_col="n_tokens")
    with pytest.raises(ValueError):
        unimax_allocation(df, budget=1, max_epochs=0, token_col="n_tokens")


def _reference(caps, budget):
    order = sorted(range(len(caps)), key=lambda i: caps[i])
    remaining, left = budget, len(caps)
    alloc = [0.0] * len(caps)
    for i in order:
        share = remaining / left
        alloc[i] = min(caps[i], share)
        remaining -= alloc[i]
        left -= 1
    return alloc


def test_randomized_against_reference(spark):
    rng = random.Random(17)
    for trial in range(5):
        rows = [(f"g{i}", rng.randint(0, 500)) for i in range(12)]
        budget = float(rng.randint(1, 4000))
        me = rng.choice([0.5, 1.0, 3.0])
        caps = [t * me for _, t in rows]
        want = _reference(caps, budget)
        got = _alloc(spark, rows, budget, me)
        for (g, _), w in zip(rows, want):
            assert got[g]["alloc"] == pytest.approx(w), (trial, g)
        total = sum(r["alloc"] for r in got.values())
        assert total == pytest.approx(min(budget, sum(caps)))
