"""Quantile normalization (operators/quantile_norm.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.quantile_norm import (
    quantile_normalize,
)


def test_two_scales_collapse_to_one(spark):
    # A on 1..3, B on 10..30: after normalization both groups carry
    # the SAME pooled quantile values — the defining property
    rows = [("A", 1.0), ("A", 2.0), ("A", 3.0),
            ("B", 10.0), ("B", 20.0), ("B", 30.0)]
    out = quantile_normalize(
        spark.createDataFrame(rows, "g string, score double"),
        ["g"],
        "score",
    ).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["g"], []).append(r["qn_score"])
    a, b = sorted(by_group["A"]), sorted(by_group["B"])
    # pooled [1,2,3,10,20,30]; r = 0, .5, 1 -> 1, 6.5, 30
    assert a == pytest.approx([1.0, 6.5, 30.0])
    assert b == pytest.approx(a)


def test_ties_share_the_min_rank_quantile(spark):
    rows = [("C", 5.0), ("C", 5.0), ("C", 7.0)]
    out = quantile_normalize(
        spark.createDataFrame(rows, "g string, score double"), ["g"], "score"
    ).collect()
    vals = sorted(r["qn_score"] for r in out)
    # pooled [5,5,7]; ties at r=0 -> v(0)=5; top at r=1 -> v(2)=7
    assert vals == pytest.approx([5.0, 5.0, 7.0])


def test_matches_numpy_reference(spark):
    rng = np.random.RandomState(7)
    rows = []
    data = {}
    for g, scale in (("a", 1.0), ("b", 37.0), ("c", 0.01)):
        xs = np.round(rng.rand(41) * scale, 6)
        data[g] = xs
        rows += [(g, float(x)) for x in xs]
    pooled = np.sort(np.concatenate(list(data.values())))
    out = quantile_normalize(
        spark.createDataFrame(rows, "g string, score double"), ["g"], "score"
    ).collect()
    for g, xs in data.items():
        n = len(xs)
        # min-rank percent_rank per value
        order = np.sort(xs)
        got = {
            round(r["score"], 9): r["qn_score"]
            for r in out
            if r["g"] == g
        }
        for x in xs:
            rank_min = int(np.searchsorted(order, x, side="left"))
            r = rank_min / (n - 1)
            expect = float(np.quantile(pooled, r, method="linear"))
            assert got[round(float(x), 9)] == pytest.approx(
                expect, abs=1e-9
            ), (g, x)


def test_null_and_clash_handling(spark):
    rows = [("A", 1.0), ("A", None), (None, 2.0)]
    out = quantile_normalize(
        spark.createDataFrame(rows, "g string, score double"), ["g"], "score"
    )
    assert out.count() == 1
    with pytest.raises(ValueError, match="qn_score"):
        quantile_normalize(
            out, ["g"], "score"
        )  # output already present
    with pytest.raises(ValueError, match="group_cols"):
        quantile_normalize(out.drop("qn_score"), [], "score")


def test_single_member_group_maps_to_pool_min(spark):
    rows = [("A", 100.0), ("B", 1.0), ("B", 2.0), ("B", 3.0)]
    out = {
        (r["g"], r["score"]): r["qn_score"]
        for r in quantile_normalize(
            spark.createDataFrame(rows, "g string, score double"),
            ["g"],
            "score",
        ).collect()
    }
    assert out[("A", 100.0)] == pytest.approx(1.0)  # r=0 -> pooled min
