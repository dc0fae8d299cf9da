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


def _cusum_serial(xs, mu, k):
    sp, sn, out = 0.0, 0.0, []
    for x in xs:
        sp = max(0.0, sp + (x - mu - k))
        sn = min(0.0, sn + (x - mu + k))
        out.append((sp, sn))
    return out


def test_cusum_matches_textbook_recursion(spark):
    from kafka_streams_task_spark.operators.anomaly import cusum_by_series

    xs = [10.0, 10.5, 9.5, 10.0, 13.0, 13.5, 14.0, 13.0, 12.5, 14.5]
    rows = [("a", i, v, 10.0) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "s string, i long, v double, mu double")
    got = {
        r["i"]: (r["cusum_pos"], r["cusum_neg"], r["is_shift"])
        for r in cusum_by_series(
            df, ["s"], ["i"], "v", slack_k=0.5, threshold_h=4.0,
            target_col="mu",
        ).collect()
    }
    expect = _cusum_serial(xs, 10.0, 0.5)
    for i, (sp, sn) in enumerate(expect):
        assert got[i][0] == pytest.approx(sp, abs=1e-12), i
        assert got[i][1] == pytest.approx(sn, abs=1e-12), i
        assert got[i][2] == int(sp > 4.0 or sn < -4.0), i
    # the level shift at i=4 must trip the alarm by the end
    assert got[9][2] == 1 and got[3][2] == 0


def test_cusum_downward_shift_and_own_mean(spark):
    from kafka_streams_task_spark.operators.anomaly import cusum_by_series

    xs = [10.0] * 8 + [4.0] * 8
    rows = [("a", i, v) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "s string, i long, v double")
    out = cusum_by_series(
        df, ["s"], ["i"], "v", slack_k=0.5, threshold_h=6.0
    ).collect()
    # retrospective mean = 7.0; serial reference with that target
    expect = _cusum_serial(xs, 7.0, 0.5)
    got = {r["i"]: r for r in out}
    for i, (sp, sn) in enumerate(expect):
        assert got[i]["cusum_pos"] == pytest.approx(sp, abs=1e-12)
        assert got[i]["cusum_neg"] == pytest.approx(sn, abs=1e-12)
    assert got[15]["is_shift"] == 1  # the downward leg trips
    assert "_cusum_mu" not in out[0].asDict()


def test_cusum_validation(spark):
    from kafka_streams_task_spark.operators.anomaly import cusum_by_series

    df = spark.createDataFrame([("a", 1, 1.0)], "s string, i long, v double")
    with pytest.raises(ValueError):
        cusum_by_series(df, ["s"], ["i"], "v", threshold_h=0.0)
    bad = df.withColumn("is_shift", F.lit(1))
    with pytest.raises(ValueError, match="collide"):
        cusum_by_series(bad, ["s"], ["i"], "v")
