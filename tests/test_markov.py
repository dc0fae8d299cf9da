"""Markov event-transition tables (operators/funnel.py:
event_transitions)."""

import datetime as dt

import pytest

from kafka_streams_task_spark.operators.funnel import event_transitions


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: view -> click -> buy
        (1, _ts(0), "view", 1),
        (1, _ts(1), "click", 2),
        (1, _ts(2), "buy", 3),
        # user 2: view -> view
        (2, _ts(0), "view", 4),
        (2, _ts(5), "view", 5),
        # user 3: single event
        (3, _ts(9), "click", 6),
        # tie on ts for user 4: event_id breaks it deterministically
        (4, _ts(0), "b", 8),
        (4, _ts(0), "a", 7),
        # dropped rows
        (None, _ts(0), "view", 9),
        (5, None, "view", 10),
        (5, _ts(0), None, 11),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string, event_id long"
    )


def test_transitions_with_boundaries(events):
    got = {
        (r["from_state"], r["to_state"]): (r["n"], r["p"])
        for r in event_transitions(events).collect()
    }
    # inner transitions
    assert got[("view", "click")] == (1, pytest.approx(1 / 3))
    assert got[("click", "buy")] == (1, pytest.approx(0.5))
    assert got[("view", "view")] == (1, pytest.approx(1 / 3))
    assert got[("a", "b")][0] == 1  # ts tie broken by event_id 7 < 8
    # boundary states: 4 users -> 4 starts, 4 ends
    assert got[("__START__", "view")] == (2, pytest.approx(0.5))
    assert got[("__START__", "click")] == (1, pytest.approx(0.25))
    assert got[("__START__", "a")] == (1, pytest.approx(0.25))
    assert got[("buy", "__END__")] == (1, pytest.approx(1.0))
    assert got[("click", "__END__")] == (1, pytest.approx(0.5))
    assert got[("view", "__END__")] == (1, pytest.approx(1 / 3))
    assert got[("b", "__END__")] == (1, pytest.approx(1.0))


def test_row_probabilities_sum_to_one(events):
    rows = event_transitions(events).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_state"], []).append(r["p"])
    for state, ps in by_from.items():
        assert sum(ps) == pytest.approx(1.0), state


def test_no_boundaries(events):
    got = {
        (r["from_state"], r["to_state"])
        for r in event_transitions(events, boundaries=False).collect()
    }
    assert got == {("view", "click"), ("click", "buy"), ("view", "view"),
                   ("a", "b")}


def test_null_tiebreak_rows_drop(spark):
    # a NULL tiebreak makes the chain order engine-dependent (Spark
    # sorts NULLs first, DuckDB last) — such rows must not enter
    rows = [
        (1, _ts(0), "a", 1),
        (1, _ts(0), "ghost", None),
        (1, _ts(1), "b", 2),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string, event_id long"
    )
    got = {
        (r["from_state"], r["to_state"])
        for r in event_transitions(df).collect()
    }
    assert got == {("__START__", "a"), ("a", "b"), ("b", "__END__")}
