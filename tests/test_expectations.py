"""Data expectations (operators/expectations.py): report arithmetic,
null-predicate handling, uniqueness, fused single-pass plan, and the
enforce filter."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.expectations import (
    enforce_expectations,
    expectation_report,
)


def _df(spark):
    return spark.createDataFrame(
        [
            Row(id=1, v=10.0, cat="a"),
            Row(id=2, v=-3.0, cat="b"),     # violates v >= 0
            Row(id=3, v=None, cat="a"),     # null v: violates v >= 0 AND not-null
            Row(id=4, v=5.0, cat="zzz"),    # violates domain
            Row(id=4, v=6.0, cat="a"),      # duplicate id
        ]
    )


RULES = {
    "v_non_negative": "v >= 0",
    "v_not_null": "v IS NOT NULL",
    "cat_in_domain": "cat IN ('a', 'b')",
}


def test_expectation_report_counts(spark):
    rep = {
        r.rule: (r.n_rows, r.n_violations, r["pass"])
        for r in expectation_report(
            _df(spark), RULES, unique_keys={"id_unique": ["id"]}
        ).collect()
    }
    assert rep == {
        "v_non_negative": (5, 2, 0),   # -3 and the NULL both violate
        "v_not_null": (5, 1, 0),
        "cat_in_domain": (5, 1, 0),
        "id_unique": (5, 1, 0),
    }


def test_expectation_report_passes_on_clean_data(spark):
    clean = _df(spark).filter("v >= 0 AND cat IN ('a','b')")
    rep = expectation_report(clean, RULES).collect()
    assert all(r["pass"] == 1 for r in rep)


def test_predicate_rules_fuse_into_one_aggregate(spark):
    plan = (
        expectation_report(_df(spark), RULES)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # ONE Aggregate (and one scan) for all three predicate rules — the
    # stack-unpivot keeps the fused pass; a union formulation re-derives
    # the aggregate per rule
    assert plan.count("Aggregate") == 1, plan


def test_enforce_keeps_exactly_good_rows(spark):
    kept = enforce_expectations(_df(spark), RULES)
    assert sorted(r.id for r in kept.collect()) == [1, 4]
    assert {r.id for r in kept.collect()} == {
        r.id
        for r in _df(spark)
        .filter("v >= 0 AND v IS NOT NULL AND cat IN ('a','b')")
        .collect()
    }


def test_report_on_events_table(spark, sf_dir):
    from kafka_streams_task_spark.schemas import load_table

    ev = load_table(spark, sf_dir, "events")
    rep = {
        r.rule: r["pass"]
        for r in expectation_report(
            ev,
            {
                "event_type_domain": "event_type IN ('view','click','purchase','signup','error')",
                "ts_not_null": "ts IS NOT NULL",
                "user_positive": "user_id >= 0",
            },
            unique_keys={"event_id_unique": ["event_id"]},
        ).collect()
    }
    assert rep == {
        "event_type_domain": 1, "ts_not_null": 1,
        "user_positive": 1, "event_id_unique": 1,
    }


def test_profile_columns_single_pass(spark, sf_dir):
    from kafka_streams_task_spark.operators.expectations import profile_columns
    from kafka_streams_task_spark.schemas import load_table

    ev = load_table(spark, sf_dir, "events")
    prof = profile_columns(ev, ["event_id", "user_id", "event_type", "value"])
    plan = prof._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1
    got = {r.column: r for r in prof.collect()}
    n = ev.count()
    assert set(got) == {"event_id", "user_id", "event_type", "value"}
    assert all(r.n_rows == n for r in got.values())
    assert got["event_id"].n_nulls == 0
    # approx distinct within HLL tolerance of exact
    exact = ev.select("event_type").distinct().count()
    assert abs(got["event_type"].n_distinct_approx - exact) <= max(1, exact * 0.1)
    assert float(got["value"].min) <= float(got["value"].max)
