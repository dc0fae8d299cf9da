"""Opt-in LIVE-BROKER integration test (VERDICT r4 item 6).

The reference's entire runtime is a Kafka broker
(WeatherHotelsApp.java:49-64); this sandbox has neither the
spark-sql-kafka connector jar nor a broker, so the engine's Kafka surface
is pinned by the wire-byte contract tests (test_kafka_contract.py)
through the file seam. THIS test is the automatic proof for the day an
environment grows both: it drives the canonical topology end-to-end
against real topics — produce raw weather JSON to an input topic, run
the stateful rollup stream over a Kafka read, write the wire bytes to an
output topic, batch-read it back and assert the golden day-1 average.

Skips cleanly (with the precise reason) when the connector or the broker
is absent. Point ``KAFKA_BOOTSTRAP`` at a broker to enable; topics are
uuid-suffixed so reruns don't collide (broker must allow topic
auto-creation, the default).
"""

from __future__ import annotations

import json
import os
import socket
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP", "localhost:9092")


def _broker_reachable(bootstrap: str, timeout_s: float = 1.0) -> bool:
    host, _, port = bootstrap.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=timeout_s):
            return True
    except OSError:
        return False


def test_weather_topology_against_live_broker(spark, tmp_path):
    from kafka_streams_task_spark.sources.kafka import (
        kafka_available,
        read_kafka_batch,
        to_wire,
        write_kafka_stream,
    )

    if not kafka_available(spark):
        pytest.skip("spark-sql-kafka connector not on the classpath")
    if not _broker_reachable(BOOTSTRAP):
        pytest.skip(f"no Kafka broker reachable at {BOOTSTRAP}")

    from pyspark.sql import functions as F

    from kafka_streams_task_spark.schemas import WEATHER_RAW
    from kafka_streams_task_spark.sources.kafka import from_wire, read_kafka_stream
    from kafka_streams_task_spark.streaming import weather_rollup_stream

    run = uuid.uuid4().hex[:8]
    topic_in, topic_out = f"weather_in_{run}", f"rollup_out_{run}"

    records = [
        {"lat": 51.51, "lng": -0.07, "wthr_date": "2020-01-01",
         "avg_tmpr_f": 70.0, "avg_tmpr_c": 30.0},
        {"lat": 51.51, "lng": -0.07, "wthr_date": "2020-01-01",
         "avg_tmpr_f": 72.0, "avg_tmpr_c": 32.0},
    ]
    # produce: the same wire layout the reference's producer emits
    raw = spark.createDataFrame([(json.dumps(r),) for r in records], ["value"])
    (
        raw.select(F.encode("value", "UTF-8").alias("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic_in)
        .save()
    )

    # the canonical topology over a REAL topic: S1 read -> S4 parse ->
    # P1/A1-A5 stateful rollup -> S5/S3 keyed JSON write
    stream = read_kafka_stream(spark, topic_in, bootstrap_servers=BOOTSTRAP)
    parsed = stream.select(
        F.from_json("value", WEATHER_RAW).alias("w")
    ).select("w.*")
    rollup = weather_rollup_stream(parsed).select(
        "geohash", F.to_json(F.struct("weatherList")).alias("payload")
    )
    q = write_kafka_stream(
        rollup,
        topic_out,
        checkpoint_dir=str(tmp_path / "ckpt"),
        key_col="geohash",
        value_cols=["payload"],
        bootstrap_servers=BOOTSTRAP,
        trigger_available_now=True,
    )
    q.awaitTermination(120)

    out = read_kafka_batch(spark, topic_out, bootstrap_servers=BOOTSTRAP).collect()
    assert out, "no records landed on the output topic"
    # update-mode changelog: the LAST record per key is current state
    latest = {}
    for r in sorted(out, key=lambda r: (r.partition, r.offset)):
        latest[r.key.decode() if isinstance(r.key, (bytes, bytearray)) else r.key] = r
    from kafka_streams_task_spark.functions.geohash import geohash_encode

    gh = geohash_encode(51.51, -0.07, 4)
    assert gh in latest
    payload = json.loads(
        json.loads(latest[gh].value.decode()
                   if isinstance(latest[gh].value, (bytes, bytearray))
                   else latest[gh].value)["payload"]
    )
    days = [(w["tmp_f"], w["tmp_c"], w["date"]) for w in payload["weatherList"]]
    assert days == [(71.0, 31.0, "2020-01-01")]
