"""Geohash function tests — golden vectors from the reference test suite
(reference: src/test/java/WeatherStreamsTest.java:171-177, 206-214)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_task_spark.functions.geohash import (
    _geohash_numpy,
    geohash_encode,
    geohash_udf,
)

GOLDEN = [
    ((39.6467, -89.8455), "dp01"),
    ((35.7395, -78.3249), "dq27"),
    ((36.3367, -77.113), "dq3n"),
    ((39.2336, -108.67), "9wfx"),
    ((36.9639, -85.3242), "dne6"),
    ((0.0, 0.0), "s000"),  # WeatherStreamsTest.java:214 (via coercion quirk)
]


@pytest.mark.parametrize("coords,expected", GOLDEN)
def test_golden_scalar(coords, expected):
    assert geohash_encode(*coords, 4) == expected


@pytest.mark.parametrize("coords,expected", GOLDEN)
def test_golden_numpy(coords, expected):
    lat, lng = coords
    assert _geohash_numpy(np.array([lat]), np.array([lng]), 4)[0] == expected


@given(
    st.floats(min_value=-90.0, max_value=90.0, allow_nan=False),
    st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=200, deadline=None)
def test_numpy_matches_scalar(lat, lng, precision):
    fast = _geohash_numpy(np.array([lat]), np.array([lng]), precision)[0]
    assert fast == geohash_encode(lat, lng, precision)


def test_nan_yields_null():
    out = _geohash_numpy(np.array([np.nan, 1.0]), np.array([2.0, np.nan]), 4)
    assert out[0] is None and out[1] is None


@pytest.mark.parametrize("precision", [1, 2, 4, 7, 12])
def test_duckdb_oracle_sql_matches_scalar_at_boundaries(precision):
    """The DuckDB oracle's geohash SQL (quantize + exact edge-compare
    correction, catalog/pipeline.py) is bit-exact with the bisection
    reference on and within ulps of cell boundaries — same equivalence
    class the Spark-side expression is pinned to."""
    import duckdb

    from kafka_streams_task_spark.catalog.pipeline import (
        duckdb_geohash_prelude,
        duckdb_geohash_sql,
    )

    total_bits = 5 * precision
    n_lat = total_bits // 2
    rng = np.random.default_rng(precision)
    pts = []
    for k in rng.integers(1, 2**n_lat, size=min(25, 2**n_lat - 1) or 1):
        e = -90.0 + float(k) * (180.0 / float(2**n_lat))
        for la in (e, float(np.nextafter(e, -np.inf)), float(np.nextafter(e, np.inf))):
            pts.append((la, float(rng.uniform(-180, 180))))
    pts += [(0.0, 0.0), (-5e-324, 5e-324), (90.0, 180.0), (-90.0, -180.0)]

    con = duckdb.connect()
    con.execute("CREATE TABLE pts(lat DOUBLE, lng DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    packed, chars = duckdb_geohash_sql("lat", "lng", precision)
    got = [
        r[0]
        for r in con.execute(
            f"""
            WITH quant AS (
              SELECT lat, lng, {duckdb_geohash_prelude('lat', 'lng', precision)} FROM pts
            ), packed AS (SELECT lat, lng, ({packed}) AS __packed FROM quant)
            SELECT ({chars}) FROM packed
            """
        ).fetchall()
    ]
    exp = [geohash_encode(la, ln, precision) for la, ln in pts]
    assert got == exp


def test_udf_on_spark(spark):
    df = spark.createDataFrame(
        [(lat, lng) for (lat, lng), _ in GOLDEN], ["lat", "lng"]
    )
    got = [r.gh for r in df.select(geohash_udf(4)("lat", "lng").alias("gh")).collect()]
    assert got == [exp for _, exp in GOLDEN]


def test_geohash_sql_registration(spark):
    """SQL users call geohash() directly after register_sql_functions —
    same golden values as the native expression."""
    from kafka_streams_task_spark.functions.register import register_sql_functions

    register_sql_functions(spark)
    rows = spark.sql(
        "SELECT geohash(lat, lng) AS gh FROM VALUES "
        "(CAST(39.6467 AS DOUBLE), CAST(-89.8455 AS DOUBLE)), "
        "(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)) AS t(lat, lng)"
    ).collect()
    assert [r["gh"] for r in rows] == ["dp01", "s000"]
