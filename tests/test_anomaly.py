"""Rolling z-score anomaly detection (operators/anomaly.py)."""

import math
import statistics

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.anomaly import rolling_zscore


@pytest.fixture(scope="module")
def scored(spark):
    # series a: stable 10 +/- 1 for 10 points, then a spike of 100
    vals = [10.0, 11.0, 9.0, 10.0, 11.0, 9.0, 10.0, 11.0, 9.0, 10.0, 100.0]
    rows = [("a", i, v) for i, v in enumerate(vals)]
    # series b: constant (std 0 -> z NULL even past min_periods)
    rows += [("b", i, 5.0) for i in range(8)]
    df = spark.createDataFrame(rows, "s string, i long, v double")
    return rolling_zscore(
        df, ["s"], ["i"], "v", window_n=10, min_periods=4, threshold=3.0
    ).cache()


def test_spike_is_flagged_with_exact_z(scored):
    spike = scored.filter((F.col("s") == "a") & (F.col("i") == 10)).collect()[0]
    base = [10.0, 11.0, 9.0, 10.0, 11.0, 9.0, 10.0, 11.0, 9.0, 10.0]
    expect = (100.0 - statistics.mean(base)) / statistics.stdev(base)
    assert spike["z"] == pytest.approx(expect, rel=1e-12)
    assert spike["is_anomaly"] == 1
    assert spike["baseline_n"] == 10


def test_warmup_is_null_not_flagged(scored):
    for i in range(4):  # windows of 0..3 preceding points < min_periods
        r = scored.filter((F.col("s") == "a") & (F.col("i") == i)).collect()[0]
        assert r["z"] is None and r["is_anomaly"] == 0


def test_inliers_not_flagged(scored):
    a = scored.filter((F.col("s") == "a") & (F.col("i") < 10))
    assert a.agg(F.sum("is_anomaly")).collect()[0][0] == 0


def test_constant_series_never_scores(scored):
    b = scored.filter(F.col("s") == "b")
    assert b.filter(F.col("z").isNotNull()).count() == 0
    assert b.agg(F.sum("is_anomaly")).collect()[0][0] == 0


def test_window_excludes_current_point(spark):
    # the spike itself must not inflate its own baseline: with the
    # point included, z of the NEXT point would shrink drastically
    df = spark.createDataFrame(
        [("a", i, 10.0) for i in range(6)] + [("a", 6, 100.0), ("a", 7, 10.0)],
        "s string, i long, v double",
    )
    out = rolling_zscore(df, ["s"], ["i"], "v", 10, 4).collect()
    r7 = [r for r in out if r["i"] == 7][0]
    # baseline for i=7 includes the spike (trailing window), mean ~22.9
    assert r7["z"] == pytest.approx(
        (10.0 - statistics.mean([10.0] * 6 + [100.0]))
        / statistics.stdev([10.0] * 6 + [100.0]),
        rel=1e-12,
    )


def test_param_validation(spark):
    df = spark.createDataFrame([("a", 1, 1.0)], "s string, i long, v double")
    with pytest.raises(ValueError):
        rolling_zscore(df, ["s"], ["i"], "v", window_n=1)
    with pytest.raises(ValueError):
        rolling_zscore(df, ["s"], ["i"], "v", window_n=5, min_periods=6)


def test_output_column_clash_refused(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0, 0.0)], "s string, i long, v double, z double"
    )
    with pytest.raises(ValueError, match="collide"):
        rolling_zscore(df, ["s"], ["i"], "v")
