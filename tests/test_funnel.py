"""Funnel analysis (operators/funnel.py) vs a pure-Python greedy-chain
reference: ordering strictness, partial funnels, out-of-order events,
conversion counts."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.funnel import (
    funnel_counts,
    funnel_stages,
    funnel_times,
)

STEPS = ["view", "click", "purchase"]


def _t(m):
    return dt.datetime(2024, 1, 1, 12, m)


EVENTS = [
    # user 1: clean full funnel
    (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
    # user 2: click BEFORE view — chain must use the later click
    (2, "click", 1), (2, "view", 2), (2, "click", 4), (2, "purchase", 5),
    # user 3: view+click but purchase precedes the click -> stage 2 only
    (3, "purchase", 1), (3, "view", 2), (3, "click", 3),
    # user 4: view only
    (4, "view", 7),
    # user 5: never views (clicks/purchases) -> not in funnel
    (5, "click", 1), (5, "purchase", 2),
    # user 6: same-minute tie — strictly-after means the tied click loses
    (6, "view", 5), (6, "click", 5), (6, "purchase", 6),
]


def _events_df(spark):
    return spark.createDataFrame(
        [Row(user_id=u, event_type=e, ts=_t(m)) for u, e, m in EVENTS]
    )


def _reference(events, steps):
    out = {}
    by_user = {}
    for u, e, m in events:
        by_user.setdefault(u, []).append((m, e))
    for u, evs in by_user.items():
        evs.sort()
        times = []
        last = None
        for step in steps:
            cand = [m for m, e in evs if e == step and (last is None or m > last)]
            if not cand:
                break
            last = min(cand)
            times.append(last)
        if times:
            out[u] = times
    return out


def test_funnel_times_match_reference(spark):
    got = {
        r.user_id: [m for m in (r.t_1, r.t_2, r.t_3) if m is not None]
        for r in funnel_times(_events_df(spark), STEPS).collect()
    }
    ref = {
        u: [_t(m) for m in times] for u, times in _reference(EVENTS, STEPS).items()
    }
    assert got == ref
    assert 5 not in got  # never entered
    assert len(got[3]) == 2  # purchase-before-click stalls at stage 2
    assert len(got[6]) == 1  # tie is not strictly-after


def test_funnel_stages_and_counts(spark):
    df = _events_df(spark)
    stages = {r.user_id: r.stage_reached for r in funnel_stages(df, STEPS).collect()}
    assert stages == {1: 3, 2: 3, 3: 2, 4: 1, 6: 1}
    counts = {r.stage: (r.step, r.n_users) for r in funnel_counts(df, STEPS).collect()}
    assert counts == {1: ("view", 5), 2: ("click", 3), 3: ("purchase", 2)}


def test_funnel_is_monotone_and_jvm_only(spark, sf_dir):
    from kafka_streams_task_spark.schemas import load_table

    ev = load_table(spark, sf_dir, "events")
    counts = {r.stage: r.n_users for r in funnel_counts(ev, STEPS).collect()}
    assert counts[1] >= counts[2] >= counts[3] >= 0
    plan = funnel_stages(ev, STEPS)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Window" not in plan


def test_cohort_retention_matches_reference(spark):
    import datetime as _dt

    from kafka_streams_task_spark.operators.funnel import cohort_retention

    rows = [
        # user 1: first on day 1, back on day 2 and day 4
        (1, 1), (1, 2), (1, 2), (1, 4),
        # user 2: first on day 1 only
        (2, 1),
        # user 3: first on day 2, back on day 4
        (3, 2), (3, 4),
    ]
    df = spark.createDataFrame(
        [Row(user_id=u, ts=_dt.datetime(2024, 1, day, 10, 0)) for u, day in rows]
    )
    got = {
        (str(r.cohort_date), r.day_offset): r.n_users
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,   # users 1, 2
        ("2024-01-01", 1): 1,   # user 1 back on day 2
        ("2024-01-01", 3): 1,   # user 1 back on day 4
        ("2024-01-02", 0): 1,   # user 3
        ("2024-01-02", 2): 1,   # user 3 back on day 4
    }


def test_cohort_retention_invariants(spark, sf_dir):
    from kafka_streams_task_spark.operators.funnel import cohort_retention
    from kafka_streams_task_spark.schemas import load_table

    ev = load_table(spark, sf_dir, "events")
    ret = cohort_retention(ev).collect()
    by_cohort = {}
    for r in ret:
        by_cohort.setdefault(str(r.cohort_date), {})[r.day_offset] = r.n_users
    for cohort, curve in by_cohort.items():
        assert 0 in curve, f"{cohort}: missing offset-0 row"
        assert all(n <= curve[0] for n in curve.values()), (
            f"{cohort}: retention exceeds cohort size"
        )
        assert all(k >= 0 for k in curve), f"{cohort}: negative offset"
