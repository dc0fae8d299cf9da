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


@pytest.mark.parametrize("precision", list(range(1, 13)))
def test_expr_matches_scalar_near_cell_boundaries(spark, precision):
    """The quantize-and-interleave expression is bit-exact with the
    bisection reference at every precision 1-12, INCLUDING points exactly on
    and within a few ulps of cell boundaries — the only place the two
    formulations could diverge. This test originally caught a real bug: the
    uncorrected quantization misclassified any coordinate one ulp below a
    cell edge whenever (x - lo) rounded up to the edge sum; the exact
    edge-compare correction step in geohash_expr is what makes this pass."""
    total_bits = 5 * precision
    n_lng = (total_bits + 1) // 2
    n_lat = total_bits // 2
    rng = np.random.default_rng(100 + precision)

    def boundary_points(lo: float, span: float, nbits: int) -> list[float]:
        # cell edges lo + k*span/2^n are exactly representable: span/2^n only
        # shifts the exponent and k*span needs < 53 mantissa bits
        ks = rng.integers(1, 2**nbits, size=min(30, 2**nbits - 1) or 1)
        pts: list[float] = []
        for k in ks:
            e = lo + float(k) * (span / float(2**nbits))
            pts += [
                e,
                float(np.nextafter(e, -np.inf)),
                float(np.nextafter(e, np.inf)),
                float(np.nextafter(np.nextafter(e, -np.inf), -np.inf)),
            ]
        # the 0.0 boundary with denormal neighbors
        pts += [0.0, 5e-324, -5e-324, 1e-301, -1e-301]
        return pts

    lat_pts = boundary_points(-90.0, 180.0, n_lat)
    lng_pts = boundary_points(-180.0, 360.0, n_lng)
    pairs = [(la, float(rng.uniform(-180, 180))) for la in lat_pts]
    pairs += [(float(rng.uniform(-90, 90)), ln) for ln in lng_pts]
    pairs += list(zip(lat_pts, lng_pts))

    df = spark.createDataFrame(pairs, "lat double, lng double")
    got = [
        r.g
        for r in df.select(geohash_expr("lat", "lng", precision).alias("g")).collect()
    ]
    exp = [geohash_encode(a, b, precision) for a, b in pairs]
    bad = [
        (la, ln, g, e)
        for (la, ln), g, e in zip(pairs, got, exp)
        if g != e
    ]
    assert not bad, f"boundary mismatches at p={precision}: {bad[:5]}"


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
