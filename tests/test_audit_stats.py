"""Benford + chi-square audits (operators/audit_stats.py)."""

import math

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.audit_stats import (
    BENFORD_P,
    benford_audit,
    chi_square_contingency,
)


def test_benford_first_digit_extraction(spark):
    # values chosen to hit decimal, scientific, negative, sub-1 forms
    vals = [123.45, 0.00234, 1e-7, -9.81, 1000.0, 5.5e12, 0.7,
            2.0, 30.0, 4e-3]
    expect = [1, 2, 1, 9, 1, 5, 7, 2, 3, 4]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r["digit"]: r["n"] for r in benford_audit(df, "v").collect()}
    from collections import Counter

    want = Counter(expect)
    for d in range(1, 10):
        assert out[d] == want.get(d, 0), d


def test_benford_excludes_nonfinite_and_zero(spark):
    df = spark.createDataFrame(
        [(0.0,), (None,), (float("nan"),), (float("inf",),),
         (float("-inf"),), (1.0,)],
        "v double",
    )
    out = benford_audit(df, "v").collect()
    assert sum(r["n"] for r in out) == 1
    # zero-count digits still carry their expected mass
    assert len(out) == 9
    for r in out:
        assert r["expected"] == pytest.approx(BENFORD_P[r["digit"]])


def test_benford_statistic_on_conforming_sample(spark):
    # a geometric sweep 1.01^k is classically Benford-conforming:
    # the chi-square stat over 2000 points stays small
    df = spark.range(2000).select(
        F.pow(F.lit(1.01), F.col("id").cast("double")).alias("v")
    )
    rows = benford_audit(df, "v").collect()
    stat = sum(r["chi2_term"] for r in rows)
    assert stat < 20.0  # 8 dof; uniform digits would score thousands
    assert sum(r["n"] for r in rows) == 2000


def test_chi_square_independent_and_dependent(spark):
    # independent uniform 2x2 -> statistic ~0; perfectly dependent -> N
    rows = [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")] * 25
    ind = chi_square_contingency(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).collect()
    assert sum(r["chi2_term"] for r in ind) == pytest.approx(0.0, abs=1e-9)
    for r in ind:
        assert r["expected"] == pytest.approx(25.0)

    dep_rows = [("x", "p")] * 30 + [("y", "q")] * 30
    dep = chi_square_contingency(
        spark.createDataFrame(dep_rows, "a string, b string"), "a", "b"
    ).collect()
    # observed cells only (2 of 4); phi^2 = 1 -> full-grid stat = N = 60,
    # observed-cell share = 30 (the absent cells carry the other half)
    assert sum(r["chi2_term"] for r in dep) == pytest.approx(30.0)


def test_chi_square_matches_reference(spark):
    import numpy as np

    rows = (
        [("a", "p")] * 12 + [("a", "q")] * 5 + [("b", "p")] * 7
        + [("b", "q")] * 20 + [("c", "p")] * 9 + [("c", "q")] * 3
    )
    got = chi_square_contingency(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).collect()
    obs = {("a", "p"): 12, ("a", "q"): 5, ("b", "p"): 7,
           ("b", "q"): 20, ("c", "p"): 9, ("c", "q"): 3}
    n = sum(obs.values())
    ra = {k: sum(v for (i, j), v in obs.items() if i == k) for k in "abc"}
    rb = {k: sum(v for (i, j), v in obs.items() if j == k) for k in "pq"}
    for r in got:
        e = ra[r["a"]] * rb[r["b"]] / n
        assert r["expected"] == pytest.approx(e, rel=1e-12)
        assert r["chi2_term"] == pytest.approx(
            (obs[(r["a"], r["b"])] - e) ** 2 / e, rel=1e-12
        )
