"""Seasonal-naive evaluation + linear trend (operators/forecast.py)."""

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.forecast import (
    linear_trend,
    seasonal_naive_eval,
)


def test_seasonal_naive_known_errors(spark):
    # period-2 series 1,2,1,2,4: preds for i>=2 are 1,2,1 -> errors
    # 0,0,3 on actuals 1,2,4
    rows = [("a", i, v) for i, v in enumerate([1.0, 2.0, 1.0, 2.0, 4.0])]
    out = seasonal_naive_eval(
        spark.createDataFrame(rows, "s string, i long, v double"),
        ["s"],
        "i",
        "v",
        season=2,
    ).collect()[0]
    assert out["n_eval"] == 3
    assert out["mae"] == pytest.approx(1.0)
    assert out["rmse"] == pytest.approx((9 / 3) ** 0.5)
    assert out["mape"] == pytest.approx((0 / 1 + 0 / 2 + 3 / 4) / 3)
    assert out["n_mape"] == 3


def test_seasonal_naive_mape_skips_zero_actuals(spark):
    rows = [("a", 0, 5.0), ("a", 1, 0.0), ("a", 2, 5.0), ("a", 3, 10.0)]
    out = seasonal_naive_eval(
        spark.createDataFrame(rows, "s string, i long, v double"),
        ["s"], "i", "v", season=2,
    ).collect()[0]
    # eval points: i=2 (actual 5, err 0), i=3 (actual 10, err 10)
    assert out["n_eval"] == 2 and out["n_mape"] == 2
    rows = [("a", 0, 5.0), ("a", 1, 3.0), ("a", 2, 0.0)]
    out = seasonal_naive_eval(
        spark.createDataFrame(rows, "s string, i long, v double"),
        ["s"], "i", "v", season=2,
    ).collect()[0]
    assert out["n_eval"] == 1 and out["n_mape"] == 0  # zero actual
    assert out["mape"] is None


def test_linear_trend_exact_line(spark):
    # v = 3 + 0.5 * x on offset indexes 1000..1004
    rows = [("a", 1000 + i, 3.0 + 0.5 * i) for i in range(5)]
    out = linear_trend(
        spark.createDataFrame(rows, "s string, i long, v double"),
        ["s"], "i", "v",
    ).collect()[0]
    assert out["slope"] == pytest.approx(0.5, rel=1e-12)
    assert out["intercept"] == pytest.approx(3.0, rel=1e-12)  # at x'=0
    assert out["r2"] == pytest.approx(1.0, rel=1e-12)
    assert out["n_points"] == 5


def test_linear_trend_matches_numpy(spark):
    import numpy as np

    xs = [210384 + i for i in range(40)]
    ys = [((i * 37) % 11) * 1.7 - 3.0 for i in range(40)]
    rows = [("a", x, y) for x, y in zip(xs, ys)]
    out = linear_trend(
        spark.createDataFrame(rows, "s string, i long, v double"),
        ["s"], "i", "v",
    ).collect()[0]
    slope, icpt = np.polyfit(np.array(xs) - xs[0], ys, 1)
    assert out["slope"] == pytest.approx(slope, abs=1e-9)
    assert out["intercept"] == pytest.approx(icpt, abs=1e-9)
    r = np.corrcoef(xs, ys)[0, 1]
    assert out["r2"] == pytest.approx(r * r, abs=1e-9)


def test_degenerate_series(spark):
    rows = [("one", 0, 1.0), ("flat", 0, 2.0), ("flat", 1, 2.0),
            ("flat", 2, 2.0)]
    got = {
        r["s"]: r
        for r in linear_trend(
            spark.createDataFrame(rows, "s string, i long, v double"),
            ["s"], "i", "v",
        ).collect()
    }
    assert got["one"]["slope"] is None
    # flat series: slope 0 is well-defined, r2 undefined (zero y-var)
    assert got["flat"]["slope"] == pytest.approx(0.0)
    assert got["flat"]["r2"] is None


def test_season_validation(spark):
    df = spark.createDataFrame([("a", 0, 1.0)], "s string, i long, v double")
    with pytest.raises(ValueError):
        seasonal_naive_eval(df, ["s"], "i", "v", season=0)
