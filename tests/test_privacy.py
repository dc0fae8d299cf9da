"""k-anonymity / l-diversity audit operators (operators/privacy.py)."""

import math

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.privacy import (
    equivalence_classes,
    generalize_numeric,
    kanonymity_summary,
    suppress_below_k,
)


@pytest.fixture(scope="module")
def people(spark):
    # QI = (zip, age_band); sensitive = diag. Class sizes: (1,'a')=4
    # with diag {x,x,y,z}, (1,'b')=2 with diag {x,x}, (2,'a')=1,
    # (NULL,'a')=2 with diag {y,NULL}
    rows = [
        (1, "a", "x"),
        (1, "a", "x"),
        (1, "a", "y"),
        (1, "a", "z"),
        (1, "b", "x"),
        (1, "b", "x"),
        (2, "a", "w"),
        (None, "a", "y"),
        (None, "a", None),
    ]
    return spark.createDataFrame(rows, "zip int, band string, diag string")


def test_equivalence_classes_sizes_and_l(people):
    got = {
        (r["zip"], r["band"]): (r["n"], r["l_distinct"])
        for r in equivalence_classes(
            people, ["zip", "band"], sensitive="diag"
        ).collect()
    }
    assert got == {
        (1, "a"): (4, 3),
        (1, "b"): (2, 1),
        (2, "a"): (1, 1),
        (None, "a"): (2, 2),  # NULL QI groups; NULL sensitive counts
    }


def test_entropy_l_goldens(people):
    ent = {
        (r["zip"], r["band"]): r["entropy_l"]
        for r in equivalence_classes(
            people, ["zip", "band"], sensitive="diag"
        ).collect()
    }
    # {x,x,y,z}: -(1/2 ln 1/2 + 2 * 1/4 ln 1/4)
    expect = 0.5 * math.log(2) + 0.5 * math.log(4)
    assert ent[(1, "a")] == pytest.approx(expect, abs=1e-12)
    assert ent[(1, "b")] == pytest.approx(0.0, abs=1e-12)  # single value
    assert ent[(None, "a")] == pytest.approx(math.log(2), abs=1e-12)


def test_summary(people):
    row = kanonymity_summary(
        people, ["zip", "band"], k=2, sensitive="diag"
    ).collect()[0]
    assert row["n_rows"] == 9
    assert row["n_classes"] == 4
    assert row["k_actual"] == 1
    assert row["classes_at_risk"] == 1  # only (2,'a') has n < 2
    assert row["rows_at_risk"] == 1
    assert row["l_min"] == 1


def test_suppress_below_k_keeps_null_qi_class(people):
    kept = suppress_below_k(people, ["zip", "band"], k=2)
    assert kept.count() == 8  # only the singleton (2,'a') is dropped
    assert kept.filter(F.col("zip").isNull()).count() == 2
    # resulting frame is 2-anonymous
    after = kanonymity_summary(kept, ["zip", "band"], k=2).collect()[0]
    assert after["k_actual"] >= 2
    assert after["classes_at_risk"] == 0
    assert kept.columns == people.columns


def test_suppress_empty_when_k_too_high(people):
    assert suppress_below_k(people, ["zip", "band"], k=5).count() == 0


def test_generalize_numeric_bands(spark):
    df = spark.createDataFrame(
        [(-1000.0,), (-0.01,), (0.0,), (3999.99,), (4000.0,), (9999.9,)],
        "x double",
    )
    got = [
        r[0]
        for r in df.select(
            generalize_numeric("x", 4000.0, anchor=-1000.0)
        ).collect()
    ]
    assert got == [0, 0, 0, 1, 1, 2]


def test_generalize_rejects_bad_width():
    with pytest.raises(ValueError):
        generalize_numeric("x", 0.0)


def test_quasi_cols_required(people):
    with pytest.raises(ValueError):
        equivalence_classes(people, [])
