"""Gap filling + LOCF + linear interpolation (operators/gapfill.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.gapfill import (
    gapfill_series,
    gap_stats,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def obs(spark):
    rows = [
        # series a: hours 0, 1, 4 observed; hour 0 has two obs (avg)
        ("a", _ts(0, 10), 8.0),
        ("a", _ts(0, 50), 12.0),
        ("a", _ts(1, 5), 20.0),
        ("a", _ts(4, 59), 50.0),
        # series b: one bucket
        ("b", _ts(2), 7.0),
        # series c: gap runs {1} and {4,5}
        ("c", _ts(0), 1.0),
        ("c", _ts(2), 1.0),
        ("c", _ts(3), 1.0),
        ("c", _ts(6), 1.0),
        # dropped rows
        (None, _ts(1), 5.0),
        ("a", None, 5.0),
        ("a", _ts(1), None),
    ]
    return spark.createDataFrame(
        rows, "s string, ts timestamp_ntz, v double"
    )


@pytest.fixture(scope="module")
def grid(obs):
    return gapfill_series(obs, ["s"], "ts", "v", unit="hour").cache()


def test_spine_and_fills(grid):
    a = {
        r["bucket_ts"].hour: r
        for r in grid.filter(F.col("s") == "a").collect()
    }
    assert sorted(a) == [0, 1, 2, 3, 4]
    assert a[0]["v_obs"] == pytest.approx(10.0)  # avg(8, 12)
    assert a[0]["is_gap"] == 0 and a[2]["is_gap"] == 1
    # LOCF carries 20.0 through the gap
    assert a[2]["v_locf"] == pytest.approx(20.0)
    assert a[3]["v_locf"] == pytest.approx(20.0)
    # linear between 20@1 and 50@4: slope 10/hour
    assert a[2]["v_interp"] == pytest.approx(30.0)
    assert a[3]["v_interp"] == pytest.approx(40.0)
    # observed buckets: interp == locf == obs
    assert a[4]["v_interp"] == pytest.approx(50.0)
    assert a[4]["v_locf"] == pytest.approx(50.0)


def test_single_bucket_series(grid):
    b = grid.filter(F.col("s") == "b").collect()
    assert len(b) == 1
    assert b[0]["v_obs"] == pytest.approx(7.0)
    assert b[0]["is_gap"] == 0


def test_null_keys_dropped(grid):
    assert grid.filter(F.col("s").isNull()).count() == 0
    # series a spine is 5 buckets despite the null-ts / null-v rows
    assert grid.filter(F.col("s") == "a").count() == 5


def test_bucket_idx_is_exact_hours(grid):
    r = grid.filter(
        (F.col("s") == "a") & (F.col("bucket_ts") == _ts(0))
    ).collect()[0]
    # hours from 2000-01-01 to 2024-01-01 (leap-day exact)
    assert r["bucket_idx"] == 210384


def test_gap_stats(grid):
    got = {
        r["s"]: (
            r["n_buckets"],
            r["n_obs"],
            r["n_gaps"],
            r["max_gap_run"],
        )
        for r in gap_stats(grid, ["s"]).collect()
    }
    assert got == {
        "a": (5, 3, 2, 2),
        "b": (1, 1, 0, 0),
        "c": (7, 4, 3, 2),
    }


def test_max_buckets_guard(obs):
    with pytest.raises(ValueError, match="max_buckets"):
        gapfill_series(obs, ["s"], "ts", "v", unit="hour", max_buckets=3)
    # generous cap passes
    assert (
        gapfill_series(
            obs, ["s"], "ts", "v", unit="hour", max_buckets=10
        ).count()
        == 13
    )


def test_bad_unit(obs):
    with pytest.raises(ValueError, match="unit"):
        gapfill_series(obs, ["s"], "ts", "v", unit="fortnight")


def test_output_column_clash_refused(spark):
    df = spark.createDataFrame(
        [("a", _ts(0), 1.0, 2.0)],
        "s string, ts timestamp_ntz, v double, v_locf double",
    )
    with pytest.raises(ValueError, match="collide"):
        gapfill_series(df, ["s"], "ts", "v")
