"""Native-expression geohash: cross-validated against the scalar bisection
reference and the golden vectors (WeatherStreamsTest.java:171-177)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.functions.geohash import geohash_encode, geohash_expr

from test_geohash import GOLDEN


def test_golden_expr(spark):
    df = spark.createDataFrame([c for c, _ in GOLDEN], ["lat", "lng"])
    got = [r.g for r in df.select(geohash_expr("lat", "lng", 4).alias("g")).collect()]
    assert got == [exp for _, exp in GOLDEN]


@pytest.mark.parametrize("precision", [1, 4, 7, 12])
def test_expr_matches_scalar_random(spark, precision):
    rng = np.random.default_rng(11)
    pts = [
        (float(a), float(b))
        for a, b in zip(rng.uniform(-90, 90, 2000), rng.uniform(-180, 180, 2000))
    ]
    pts += [(90.0, 180.0), (-90.0, -180.0), (0.0, 0.0), (89.999999, 179.999999)]
    df = spark.createDataFrame(pts, ["lat", "lng"])
    got = [r.g for r in df.select(geohash_expr("lat", "lng", precision).alias("g")).collect()]
    exp = [geohash_encode(a, b, precision) for a, b in pts]
    assert got == exp


def test_expr_null_propagation(spark):
    df = spark.createDataFrame(
        [(None, 1.0), (1.0, None), (None, None), (1.0, 1.0)], "lat double, lng double"
    )
    got = [r.g for r in df.select(geohash_expr("lat", "lng", 4).alias("g")).collect()]
    assert got[:3] == [None, None, None] and got[3] == geohash_encode(1.0, 1.0, 4)


def test_expr_stays_in_codegen(spark):
    """The whole rekey projection must compile to JVM codegen — no Python
    eval nodes (the 100 TB hot-path requirement)."""
    df = spark.createDataFrame([(1.0, 2.0)], ["lat", "lng"])
    plan = df.select(geohash_expr("lat", "lng", 4).alias("g"))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
