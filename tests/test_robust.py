"""Winsorization + robust scaling (operators/robust.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.robust import (
    MAD_TO_SIGMA,
    robust_scale_by_group,
    winsorize_by_group,
)


def test_winsorize_clips_to_numpy_quantiles(spark):
    rng = np.random.RandomState(3)
    xs = np.round(rng.randn(101) * 10, 6)
    xs[0], xs[1] = 1e6, -1e6  # planted outliers
    df = spark.createDataFrame(
        [("g", float(x)) for x in xs], "g string, v double"
    )
    out = winsorize_by_group(df, ["g"], "v", 0.05, 0.95)
    lo = float(np.quantile(xs, 0.05, method="linear"))
    hi = float(np.quantile(xs, 0.95, method="linear"))
    got = {
        round(r["v"], 9): r["winsorized"] for r in out.collect()
    }
    assert got[round(1e6, 9)] == pytest.approx(hi, rel=1e-12)
    assert got[round(-1e6, 9)] == pytest.approx(lo, rel=1e-12)
    for x in xs[2:]:
        expect = min(max(float(x), lo), hi)
        assert got[round(float(x), 9)] == pytest.approx(expect, rel=1e-12)


def test_robust_scale_matches_reference_and_shrugs_outlier(spark):
    xs = [10.0, 11.0, 12.0, 13.0, 14.0, 1e9]
    df = spark.createDataFrame(
        [("g", x) for x in xs], "g string, v double"
    )
    med = float(np.quantile(xs, 0.5, method="linear"))
    mad = float(np.quantile([abs(x - med) for x in xs], 0.5, method="linear"))
    got = {
        r["v"]: r["robust_z"]
        for r in robust_scale_by_group(df, ["g"], "v").collect()
    }
    for x in xs:
        assert got[x] == pytest.approx(
            (x - med) / (mad * MAD_TO_SIGMA), rel=1e-12
        )
    # the inliers stay O(1) despite the 1e9 outlier (mean/std would not)
    assert abs(got[10.0]) < 3


def test_constant_group_yields_null(spark):
    df = spark.createDataFrame(
        [("g", 5.0)] * 4 + [("g", 6.0)], "g string, v double"
    )
    out = robust_scale_by_group(df, ["g"], "v").collect()
    # median 5, MAD 0 -> NULL everywhere
    assert all(r["robust_z"] is None for r in out)


def test_groups_are_independent(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0),
         ("b", 100.0), ("b", 200.0), ("b", 300.0)],
        "g string, v double",
    )
    got = {
        (r["g"], r["v"]): r["robust_z"]
        for r in robust_scale_by_group(df, ["g"], "v").collect()
    }
    assert got[("a", 2.0)] == pytest.approx(0.0)
    assert got[("b", 200.0)] == pytest.approx(0.0)
    assert got[("a", 3.0)] == pytest.approx(got[("b", 300.0)], rel=1e-12)


def test_validation(spark):
    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        winsorize_by_group(df, ["g"], "v", 0.9, 0.1)
    with pytest.raises(ValueError, match="collide"):
        winsorize_by_group(
            df.withColumn("winsorized", F.lit(0.0)), ["g"], "v"
        )
    with pytest.raises(ValueError, match="collide"):
        robust_scale_by_group(
            df.withColumn("robust_z", F.lit(0.0)), ["g"], "v"
        )
