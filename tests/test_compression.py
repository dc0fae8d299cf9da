"""Compression-ratio quality signal (operators/compression.py)."""

import zlib

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.compression import (
    compression_ratio,
    compression_signals,
)

_REP = "spam " * 400
_NAT = (
    "The quick brown fox jumps over the lazy dog while seventeen "
    "astronomers catalogue variable stars from a windy hilltop "
    "observatory, trading mugs of lukewarm coffee for one more hour "
    "of photometry before the clouds roll in from the coast. "
) * 5
_RND = "".join(
    chr(33 + ((i * 7919 + (i * i) % 101) % 90)) for i in range(2000)
)


def _py_ratio(x: str) -> float:
    raw = x.encode("utf-8")
    return len(zlib.compress(raw, 6)) / len(raw)


def test_matches_python_zlib_exactly(spark):
    df = spark.createDataFrame(
        [(1, _REP), (2, _NAT), (3, _RND)], "id long, text string"
    )
    got = {
        r["id"]: r["cr"]
        for r in df.select(
            "id", compression_ratio("text").alias("cr")
        ).collect()
    }
    assert got[1] == pytest.approx(_py_ratio(_REP), rel=1e-12)
    assert got[2] == pytest.approx(_py_ratio(_NAT), rel=1e-12)
    assert got[3] == pytest.approx(_py_ratio(_RND), rel=1e-12)


def test_ordering_invariant(spark):
    # the signal's whole point: repetitive << natural < random
    df = spark.createDataFrame(
        [(1, _REP), (2, _NAT), (3, _RND)], "id long, text string"
    )
    got = {
        r["id"]: r["compression_ratio"]
        for r in compression_signals(df).collect()
    }
    assert got[1] < 0.05
    assert got[1] < got[2] < got[3]
    assert got[3] > 0.8


def test_null_empty_contract(spark):
    df = spark.createDataFrame([(1, None), (2, "")], "id long, text string")
    rows = df.select(compression_ratio("text").alias("cr")).collect()
    assert all(r["cr"] is None for r in rows)


def test_level_validation_and_threshold_filter_plan(spark):
    with pytest.raises(ValueError, match="level"):
        compression_ratio("text", level=0)
    df = spark.createDataFrame([(i, _NAT + str(i)) for i in range(8)], "id long, text string")
    out = compression_signals(df).filter(F.col("compression_ratio") < 0.9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    # threshold filter must not split-and-duplicate the Arrow stage
    assert len(re.findall(r"ArrowEvalPython", plan)) == 1, plan
    assert out.count() == 8
