"""Windowed streaming aggregation with watermarks (late-data handling) and
Kafka connector probing — the streaming features the reference lacks
(SURVEY §2.6) that the engine exposes."""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="wm_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


EVENTS = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("k", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def test_windowed_agg_with_watermark_append_semantics(spark, tmpdir):
    """10-minute tumbling windows, 5-minute watermark, append mode.

    Guaranteed semantics pinned here: each closed window is emitted exactly
    once with its final aggregate, and windows whose end is not yet past the
    watermark at stream end are withheld. (Dropping of late rows before
    state eviction is best-effort per the Spark docs — observed behavior in
    this version is that lateness within un-evicted state still merges, so
    that is deliberately NOT asserted.)
    """
    from kafka_streams_task_spark.sources.files import read_json_stream

    src = f"{tmpdir}/in"
    os.makedirs(src)
    b0 = [
        {"ts": "2024-01-01 10:01:00", "k": "a", "v": 1.0},
        {"ts": "2024-01-01 10:02:00", "k": "a", "v": 2.0},
    ]
    b1 = [
        # advances watermark to 10:25 - 5min = 10:20 -> closes the 10:00 window
        {"ts": "2024-01-01 10:25:00", "k": "a", "v": 5.0},
        {"ts": "2024-01-01 10:26:00", "k": "a", "v": 7.0},
    ]
    now = time.time()
    for i, batch in enumerate([b0, b1]):
        with open(f"{src}/b{i}.json", "w") as f:
            for rec in batch:
                f.write(json.dumps(rec) + "\n")
        os.utime(f"{src}/b{i}.json", (now + 30 * i, now + 30 * i))

    stream = read_json_stream(spark, src, EVENTS, max_files_per_trigger=1)
    agg = (
        stream.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("string").alias("start"), "k", "total", "n")
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [(r.start, r.total, r.n) for r in spark.sql(f"SELECT * FROM {name}").collect()]
    # closed 10:00 window: exactly one final emission with the on-time sum
    assert rows.count(("2024-01-01 10:00:00", 3.0, 2)) == 1
    # the 10:20 window (10:25, 10:26 records) is still open: withheld
    assert not any(s == "2024-01-01 10:20:00" for s, _, _ in rows)


def test_kafka_probe_degrades_gracefully(spark):
    """kafka_available must not raise regardless of connector presence; the
    wrappers are import-safe in brokerless environments."""
    from kafka_streams_task_spark.sources.kafka import kafka_available

    assert kafka_available(spark) in (True, False)


def test_stream_stream_interval_join(spark, tmpdir):
    """Windowed stream-stream inner join: purchases joined to the same
    user's clicks within the preceding 30 minutes, both sides watermarked —
    the streaming join family absent from the reference (SURVEY §2.4) that
    the engine exposes."""
    from kafka_streams_task_spark.sources.files import read_json_stream

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("eid", T.LongType()),
        ]
    )
    src = f"{tmpdir}/in"
    os.makedirs(src)
    recs = [
        {"ts": "2024-01-01 10:00:00", "user": "u1", "kind": "click", "eid": 1},
        {"ts": "2024-01-01 10:10:00", "user": "u1", "kind": "purchase", "eid": 2},  # joins eid 1
        {"ts": "2024-01-01 11:30:00", "user": "u1", "kind": "purchase", "eid": 3},  # no click within 30m
        {"ts": "2024-01-01 10:05:00", "user": "u2", "kind": "purchase", "eid": 4},  # u2 never clicked
        {"ts": "2024-01-01 12:00:00", "user": "u1", "kind": "click", "eid": 5},     # advances watermark
    ]
    with open(f"{src}/b0.json", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")

    stream = read_json_stream(spark, src, schema)
    purchases = stream.filter(F.col("kind") == "purchase").select(
        F.col("user"), F.col("ts").alias("p_ts"), F.col("eid").alias("p_eid")
    ).withWatermark("p_ts", "1 hour")
    clicks = stream.filter(F.col("kind") == "click").select(
        F.col("user").alias("c_user"), F.col("ts").alias("c_ts"), F.col("eid").alias("c_eid")
    ).withWatermark("c_ts", "1 hour")

    joined = purchases.join(
        clicks,
        (F.col("user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select("user", "p_eid", "c_eid")

    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ckpt_ssj")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r.user, r.p_eid, r.c_eid) for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert rows == {("u1", 2, 1)}


def test_stream_stream_left_outer_join(spark, tmpdir):
    """Left-outer stream-stream join: unmatched purchases emit with nulls
    once the watermark closes their join window."""
    from kafka_streams_task_spark.sources.files import read_json_stream

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("eid", T.LongType()),
        ]
    )
    src = f"{tmpdir}/in_lo"
    os.makedirs(src)
    b0 = [
        {"ts": "2024-01-01 10:00:00", "user": "u1", "kind": "click", "eid": 1},
        {"ts": "2024-01-01 10:10:00", "user": "u1", "kind": "purchase", "eid": 2},  # matched
        {"ts": "2024-01-01 10:20:00", "user": "u2", "kind": "purchase", "eid": 3},  # unmatched
    ]
    b1 = [
        # far-future rows advance both watermarks so eid=3's window closes
        {"ts": "2024-01-01 18:00:00", "user": "u9", "kind": "click", "eid": 98},
        {"ts": "2024-01-01 18:00:00", "user": "u9", "kind": "purchase", "eid": 99},
    ]
    now = time.time()
    for i, batch in enumerate([b0, b1]):
        with open(f"{src}/b{i}.json", "w") as f:
            for rec in batch:
                f.write(json.dumps(rec) + "\n")
        os.utime(f"{src}/b{i}.json", (now + 30 * i, now + 30 * i))

    stream = read_json_stream(spark, src, schema, max_files_per_trigger=1)
    purchases = stream.filter(F.col("kind") == "purchase").select(
        "user", F.col("ts").alias("p_ts"), F.col("eid").alias("p_eid")
    ).withWatermark("p_ts", "10 minutes")
    clicks = stream.filter(F.col("kind") == "click").select(
        F.col("user").alias("c_user"), F.col("ts").alias("c_ts"), F.col("eid").alias("c_eid")
    ).withWatermark("c_ts", "10 minutes")

    joined = purchases.join(
        clicks,
        (F.col("user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    ).select("user", "p_eid", "c_eid")

    name = f"lo_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ckpt_lo")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r.user, r.p_eid, r.c_eid) for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert ("u1", 2, 1) in rows            # matched pair
    assert ("u2", 3, None) in rows         # unmatched emits with null
