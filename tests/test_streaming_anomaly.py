"""Streaming rolling z-scores (streaming/anomaly.py) — cross-batch
baseline carry and equivalence with the batch scorer."""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_streams_task_spark.streaming.anomaly import streaming_zscore


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="szscore_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


_SCHEMA = T.StructType(
    [
        T.StructField("s", T.StringType()),
        T.StructField("i", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _write(src):
    os.makedirs(src)
    # batch 0: stable history; batch 1: the spike + more points
    b0 = [{"s": "a", "i": i, "v": 10.0 + (i % 3)} for i in range(8)]
    b1 = [
        {"s": "a", "i": 8, "v": 100.0},   # spike scored vs batch-0 tail
        {"s": "a", "i": 9, "v": None},    # NULL occupies a frame slot
        {"s": "a", "i": 10, "v": 11.0},
        {"s": "b", "i": 0, "v": 5.0},     # fresh series, no history
    ]
    for name, rows, mtime in (("b0", b0, 1000000000), ("b1", b1, 1000000100)):
        p = f"{src}/{name}.json"
        with open(p, "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (mtime, mtime))


def _run(spark, src, tmpdir, name):
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = streaming_zscore(
        stream, ["s"], ["i"], "v", window_n=6, min_periods=4
    )
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_cross_batch_baseline_and_equivalence(spark, tmpdir):
    from kafka_streams_task_spark.operators.anomaly import rolling_zscore

    src = f"{tmpdir}/in"
    _write(src)
    _run(spark, src, tmpdir, "szs1")
    got = {
        (r["s"], r["i"]): (r["baseline_n"], r["z"], r["is_anomaly"])
        for r in spark.sql("SELECT * FROM szs1").collect()
    }
    # the spike at i=8 scores against batch 0's tail, carried in state
    assert got[("a", 8)][0] == 6
    assert got[("a", 8)][2] == 1
    # the NULL row is emitted (z NULL, no alarm) and occupies a slot
    assert got[("a", 9)][1] is None and got[("a", 9)][2] == 0
    # i=10's 6-row frame holds i=4..9: one hole -> 5 live values
    assert got[("a", 10)][0] == 5
    # fresh series has no baseline
    assert got[("b", 0)] == (0, None, 0)

    batch = {
        (r["s"], r["i"]): (r["baseline_n"], r["z"], r["is_anomaly"])
        for r in rolling_zscore(
            spark.read.schema(_SCHEMA).json(src),
            ["s"],
            ["i"],
            "v",
            window_n=6,
            min_periods=4,
        ).collect()
    }
    assert set(got) == set(batch)
    for k in got:
        assert got[k][0] == batch[k][0], k
        assert got[k][2] == batch[k][2], k
        if batch[k][1] is None:
            assert got[k][1] is None, k
        else:
            assert got[k][1] == pytest.approx(batch[k][1], abs=1e-9), k


def test_param_validation(spark):
    df = spark.createDataFrame([], _SCHEMA)
    with pytest.raises(ValueError):
        streaming_zscore(df, ["s"], ["i"], "v", window_n=1)
    with pytest.raises(ValueError):
        streaming_zscore(df, ["s"], ["i"], "v", window_n=4, min_periods=5)
