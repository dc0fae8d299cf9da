"""Streaming LOCF gap filling (streaming/gapfill.py) — cross-batch
carry, late-row drops, and literal equivalence with the batch operator.
"""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_streams_task_spark.streaming.gapfill import streaming_locf


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="sgapfill_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


_SCHEMA = T.StructType(
    [
        T.StructField("s", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("v", T.DoubleType()),
    ]
)

# hour indexes from the 2000-01-01 anchor: 2024-01-01 00:00 = 210384
H0 = 210384


def _write_batches(src: str) -> None:
    os.makedirs(src)
    b0 = [
        {"s": "a", "ts": "2024-01-01T00:10:00", "v": 8.0},
        {"s": "a", "ts": "2024-01-01T00:50:00", "v": 12.0},  # avg 10 @ h0
        {"s": "a", "ts": "2024-01-01T01:05:00", "v": 20.0},  # h1
        {"s": "b", "ts": "2024-01-01T02:00:00", "v": 7.0},   # h2
    ]
    b1 = [
        {"s": "a", "ts": "2024-01-01T04:59:00", "v": 50.0},  # h4: gap 2,3
        {"s": "a", "ts": "2024-01-01T00:30:00", "v": 999.0}, # LATE: dropped
        {"s": "b", "ts": "2024-01-01T03:00:00", "v": 9.0},   # h3, no gap
    ]
    for name, rows, mtime in (("b0", b0, 1000000000), ("b1", b1, 1000000100)):
        p = f"{src}/{name}.json"
        with open(p, "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (mtime, mtime))


def _run(spark, src: str, tmpdir: str, name: str):
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = streaming_locf(stream, ["s"], "ts", "v", unit="hour")
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_cross_batch_carry_and_late_drop(spark, tmpdir):
    src = f"{tmpdir}/in"
    _write_batches(src)
    _run(spark, src, tmpdir, "sgap1")
    rows = {
        (r["s"], r["bucket_idx"]): (r["v_obs"], r["v_locf"], r["is_gap"])
        for r in spark.sql("SELECT * FROM sgap1").collect()
    }
    # series a: h0(avg 10), h1, then batch 2 fills h2,h3 as gaps and h4
    assert rows[("a", H0)] == (10.0, 10.0, 0)
    assert rows[("a", H0 + 1)] == (20.0, 20.0, 0)
    assert rows[("a", H0 + 2)] == (None, 20.0, 1)   # carried ACROSS batches
    assert rows[("a", H0 + 3)] == (None, 20.0, 1)
    assert rows[("a", H0 + 4)] == (50.0, 50.0, 0)
    # the late h0 row (999.0) did NOT retro-fill or re-emit h0
    assert len([k for k in rows if k[0] == "a"]) == 5
    # series b: contiguous h2, h3 — no gaps
    assert rows[("b", H0 + 2)] == (7.0, 7.0, 0)
    assert rows[("b", H0 + 3)] == (9.0, 9.0, 0)


def test_union_of_batches_equals_batch_operator(spark, tmpdir):
    """The streaming grid (late rows excluded) IS the batch operator's
    grid: same buckets, same LOCF values, same gap flags."""
    from kafka_streams_task_spark.operators.gapfill import gapfill_series

    src = f"{tmpdir}/in"
    _write_batches(src)
    _run(spark, src, tmpdir, "sgap2")
    got = {
        (r["s"], r["bucket_idx"]): (r["v_obs"], r["v_locf"], r["is_gap"])
        for r in spark.sql("SELECT * FROM sgap2").collect()
    }
    batch_in = (
        spark.read.schema(_SCHEMA)
        .json(src)
        # the batch op sees the on-time rows only (the late 999.0 row
        # is the one divergence append-mode streaming declares)
        .filter(F.col("v") != 999.0)
    )
    expect = {
        (r["s"], r["bucket_idx"]): (
            r["v_obs"],
            r["v_locf"],
            r["is_gap"],
        )
        for r in gapfill_series(
            batch_in, ["s"], "ts", "v", unit="hour"
        ).collect()
    }
    assert got == expect


def test_runaway_spine_guard(spark, tmpdir):
    src = f"{tmpdir}/in2"
    os.makedirs(src)
    rows = [
        {"s": "x", "ts": "2024-01-01T00:00:00", "v": 1.0},
        {"s": "x", "ts": "2030-01-01T00:00:00", "v": 2.0},
    ]
    with open(f"{src}/b.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = streaming_locf(
        stream, ["s"], "ts", "v", unit="hour", max_buckets_per_batch=1000
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sgap3")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ckpt_sgap3")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="max_buckets_per_batch"):
        q.awaitTermination(180)
        if q.exception() is not None:
            raise q.exception()


def test_bad_unit(spark):
    with pytest.raises(ValueError, match="unit"):
        streaming_locf(
            spark.createDataFrame([], _SCHEMA), ["s"], "ts", "v", unit="week"
        )
