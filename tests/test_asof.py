"""As-of join operator tests (operators/asof.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_asof_backward_basic(spark):
    from kafka_streams_task_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, "l1"), (1, 20, "l2"), (2, 5, "l3")], ["k", "t", "tag"])
    right = spark.createDataFrame([(1, 8, "r1"), (1, 15, "r2"), (3, 1, "rx")], ["k", "t", "rtag"])
    out = {r.tag: (r.r_t, r.r_rtag) for r in asof_join(left, right, on="t", by="k").collect()}
    assert out["l1"] == (8, "r1")     # latest right <= 10
    assert out["l2"] == (15, "r2")    # latest right <= 20
    assert out["l3"] == (None, None)  # no right rows for key 2


def test_asof_exact_match_and_forward(spark):
    from kafka_streams_task_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, "l")], ["k", "t", "tag"])
    right = spark.createDataFrame([(1, 10, "same"), (1, 12, "later")], ["k", "t", "rtag"])
    back = asof_join(left, right, on="t", by="k").collect()[0]
    assert back.r_rtag == "same"  # allow_exact_matches: t == 10 matches
    strict = asof_join(left, right, on="t", by="k", allow_exact_matches=False).collect()[0]
    assert strict.r_rtag is None  # nothing strictly before 10
    fwd = asof_join(left, right, on="t", by="k", direction="forward", allow_exact_matches=False).collect()[0]
    assert fwd.r_rtag == "later"


def test_asof_same_parent_derivation(spark):
    """Regression: left and right derived from the same parent DataFrame —
    cogroup attribute dedup must not prune the right's `on` column."""
    from kafka_streams_task_spark.operators.asof import asof_join

    base = spark.createDataFrame(
        [(1, 10, "p"), (1, 8, "c"), (1, 15, "c"), (2, 5, "p")], ["k", "t", "kind"]
    )
    left = base.filter(F.col("kind") == "p").select("k", "t")
    right = (
        base.filter(F.col("kind") == "c")
        .groupBy("k", "t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = {(r.k, r.t): r.r_t for r in asof_join(left, right, on="t", by="k").collect()}
    assert out[(1, 10)] == 8
    assert out[(2, 5)] is None


def test_asof_timestamps(spark):
    from kafka_streams_task_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00")], ["k", "t"]
    ).select("k", F.col("t").cast("timestamp").alias("t"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", "early"), (1, "2024-01-01 11:00:00", "mid")], ["k", "t", "v"]
    ).select("k", F.col("t").cast("timestamp").alias("t"), "v")
    out = sorted(
        (str(r.t), r.r_v) for r in asof_join(left, right, on="t", by="k").collect()
    )
    assert out == [("2024-01-01 10:00:00", "early"), ("2024-01-01 12:00:00", "mid")]


def test_asof_random_matches_pandas(spark):
    """Property check: the union-window as-of join must equal pandas
    merge_asof on random data, across directions and exactness."""
    import numpy as np
    import pandas as pd

    from kafka_streams_task_spark.operators.asof import asof_join

    rng = np.random.default_rng(17)
    n_l, n_r = 400, 300
    lpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_l),
            "t": rng.integers(0, 1000, n_l),
            "lid": np.arange(n_l),
        }
    )
    rpdf = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 10, n_r),  # some keys absent on left
                "t": rng.integers(0, 1000, n_r),
                "rid": np.arange(n_r),
            }
        )
        .drop_duplicates(["k", "t"])  # dedupe ties for determinism
        .reset_index(drop=True)
    )
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)

    for direction in ("backward", "forward", "nearest"):
        for exact in (True, False):
            got = {
                r.lid: r.r_rid
                for r in asof_join(
                    left, right, on="t", by="k", direction=direction, allow_exact_matches=exact
                ).collect()
            }
            expected = pd.merge_asof(
                lpdf.sort_values("t", kind="mergesort"),
                rpdf.sort_values("t", kind="mergesort"),
                on="t",
                by="k",
                direction=direction,
                allow_exact_matches=exact,
                suffixes=("", "_r"),
            )
            exp = {
                int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
                for row in expected.itertuples()
            }
            assert got == exp, f"mismatch for {direction}/exact={exact}"


def test_asof_tolerance_matches_pandas(spark):
    """tolerance parity vs pd.merge_asof on deterministic numeric data,
    both directions (r11 API completion)."""
    import pandas as pd

    from kafka_streams_task_spark.operators.asof import asof_join

    lpdf = pd.DataFrame(
        {
            "k": [i % 3 for i in range(30)],
            "t": [float((i * 17) % 101) for i in range(30)],
            "lid": list(range(30)),
        }
    ).drop_duplicates(["k", "t"]).reset_index(drop=True)
    rpdf = pd.DataFrame(
        {
            "k": [i % 3 for i in range(25)],
            "t": [float((i * 23 + 5) % 97) for i in range(25)],
            "rid": list(range(100, 125)),
        }
    ).drop_duplicates(["k", "t"]).reset_index(drop=True)
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    for direction in ("backward", "forward", "nearest"):
        for tol in (0.0, 3.0, 10.0):
            got = {
                r.lid: r.r_rid
                for r in asof_join(
                    left, right, on="t", by="k",
                    direction=direction, tolerance=tol,
                ).collect()
            }
            expected = pd.merge_asof(
                lpdf.sort_values("t", kind="mergesort"),
                rpdf.sort_values("t", kind="mergesort"),
                on="t", by="k", direction=direction, tolerance=tol,
                suffixes=("", "_r"),
            )
            exp = {
                int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
                for row in expected.itertuples()
            }
            assert got == exp, f"{direction}/tol={tol}"


def test_asof_tolerance_timestamps_and_validation(spark):
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1)], "k long, t string, lid long"
    ).select("k", F.col("t").cast("timestamp").alias("t"), "lid")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 100)], "k long, t string, rid long"
    ).select("k", F.col("t").cast("timestamp").alias("t"), "rid")
    # the match is 3600 s stale: inclusive boundary keeps it, tighter drops
    keep = asof_join(left, right, on="t", by="k", tolerance=3600.0).collect()
    assert keep[0]["r_rid"] == 100
    drop = asof_join(left, right, on="t", by="k", tolerance=3599.0).collect()
    assert drop[0]["r_rid"] is None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="tolerance"):
        asof_join(left, right, on="t", by="k", tolerance=-1.0)


def test_asof_tolerance_dates_and_type_guard(spark):
    """r12 (ADVICE r11): DATE on-columns take tolerance in whole DAYS via
    datediff (the raw date-date subtraction yields an INTERVAL that cannot
    compare against a double); unsupported on-types raise up front."""
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-10", 1), (1, "2024-01-20", 2)], "k long, t string, lid long"
    ).select("k", F.col("t").cast("date").alias("t"), "lid")
    right = spark.createDataFrame(
        [(1, "2024-01-07", 100)], "k long, t string, rid long"
    ).select("k", F.col("t").cast("date").alias("t"), "rid")

    # lid 1 is 3 days stale (kept at tol=3, dropped at tol=2);
    # lid 2 is 13 days stale (dropped at both)
    got3 = {r.lid: r.r_rid for r in
            asof_join(left, right, on="t", by="k", tolerance=3.0).collect()}
    assert got3 == {1: 100, 2: None}
    got2 = {r.lid: r.r_rid for r in
            asof_join(left, right, on="t", by="k", tolerance=2.0).collect()}
    assert got2 == {1: None, 2: None}

    # forward: right at +3 days of nothing; plant one after lid 2
    fwd = {r.lid: r.r_rid for r in
           asof_join(left, right.select("k", F.date_add("t", 16).alias("t"), "rid"),
                     on="t", by="k", direction="forward", tolerance=3.0).collect()}
    assert fwd == {1: None, 2: 100}  # 2024-01-23 is 3 days after lid 2

    import pytest as _pytest

    str_left = spark.createDataFrame([(1, "a", 1)], "k long, t string, lid long")
    with _pytest.raises(ValueError, match="tolerance supports numeric"):
        asof_join(str_left, str_left.select("k", "t", F.col("lid").alias("rid")),
                  on="t", by="k", tolerance=1.0)


def test_asof_nearest_edges(spark):
    """r12 nearest-direction edges: tie prefers backward, one-sided
    matches fall through, exact matches respect allow_exact_matches,
    symmetric tolerance nulls far matches."""
    from kafka_streams_task_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10.0, 1), (1, 100.0, 2), (1, 7.0, 3)], "k long, t double, lid long"
    )
    right = spark.createDataFrame(
        [(1, 7.0, 100), (1, 13.0, 101)], "k long, t double, rid long"
    )
    # lid 1 at t=10: backward cand 7 (gap 3), forward cand 13 (gap 3) -> tie -> backward
    # lid 2 at t=100: only backward 13 exists forward-none -> 13
    # lid 3 at t=7: exact match 100
    got = {r.lid: r.r_rid for r in asof_join(
        left, right, on="t", by="k", direction="nearest").collect()}
    assert got == {1: 100, 2: 101, 3: 100}

    # exact excluded: lid 3's match at 7.0 skips to 13.0 (gap 6) vs none backward
    got_ne = {r.lid: r.r_rid for r in asof_join(
        left, right, on="t", by="k", direction="nearest",
        allow_exact_matches=False).collect()}
    assert got_ne[3] == 101

    # symmetric tolerance: lid 2's nearest (13, gap 87) nulled at tol=10
    got_tol = {r.lid: r.r_rid for r in asof_join(
        left, right, on="t", by="k", direction="nearest",
        tolerance=10.0).collect()}
    assert got_tol == {1: 100, 2: None, 3: 100}


def test_asof_nearest_dates(spark):
    """nearest + DATE on-column: closer side wins in whole days, tie
    prefers backward, day-unit symmetric tolerance."""
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-10", 1)], "k long, t string, lid long"
    ).select("k", F.col("t").cast("date").alias("t"), "lid")
    right = spark.createDataFrame(
        [(1, "2024-01-07", 100), (1, "2024-01-13", 101)],
        "k long, t string, rid long",
    ).select("k", F.col("t").cast("date").alias("t"), "rid")
    # 3 days either way -> tie -> backward
    got = asof_join(left, right, on="t", by="k", direction="nearest").collect()
    assert got[0]["r_rid"] == 100
    # tolerance 2 days drops both
    got_tol = asof_join(
        left, right, on="t", by="k", direction="nearest", tolerance=2.0
    ).collect()
    assert got_tol[0]["r_rid"] is None
    # asymmetric: move backward candidate farther -> forward wins
    right2 = spark.createDataFrame(
        [(1, "2024-01-01", 100), (1, "2024-01-13", 101)],
        "k long, t string, rid long",
    ).select("k", F.col("t").cast("date").alias("t"), "rid")
    got2 = asof_join(left, right2, on="t", by="k", direction="nearest").collect()
    assert got2[0]["r_rid"] == 101


def test_asof_nearest_single_shuffle_plan(spark):
    """The nearest direction must cost ONE exchange (both window frames
    share the (key, time) sort) — the two-channel union, not a second
    shuffle or a join."""
    from kafka_streams_task_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 5.0, 1)], "k long, t double, lid long")
    right = spark.createDataFrame([(1, 4.0, 9)], "k long, t double, rid long")
    plan = (
        asof_join(left, right, on="t", by="k", direction="nearest")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
