"""Kafka wire-format contract (S3 + S5/S6 byte layout).

No broker exists in this container, so the Kafka sink cannot be run
end-to-end. What CAN be pinned behaviorally is the byte contract: the
``(key: binary, value: binary)`` projection the sink sends verbatim. The
reference's layout (serdes/CustomSerdes.java:15-37) is

- key:   UTF-8 bytes of the key string (``Serdes.String()``),
- value: Jackson ``writeValueAsBytes`` JSON of the POJO
  (serdes/PojoSerializer.java:24-33), ``null`` POJO -> ``null`` bytes,
  and the consumer ignores unknown JSON properties
  (serdes/PojoDeserializer.java:11, FAIL_ON_UNKNOWN_PROPERTIES=false).

These tests drive ``to_wire``/``from_wire`` — the exact projections
``write_kafka_stream`` uses — through the file seam instead of a topic,
the same boundary swap the reference's TopologyTestDriver performs
(WeatherStreamsTest.java:57).
"""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_streams_task_spark.schemas import WEATHER_RAW
from kafka_streams_task_spark.sources.kafka import from_wire, to_wire


def _weather_rows():
    return [
        Row(
            lat=12.34, lng=56.78, wthr_date="2017-08-29", avg_tmpr_f=71.5, avg_tmpr_c=21.9
        ),
        Row(
            lat=-0.25, lng=100.0, wthr_date="2017-08-30", avg_tmpr_f=70.0, avg_tmpr_c=21.1
        ),
    ]


def test_wire_bytes_exact(spark):
    """Producer side: key bytes are UTF-8 of the key string; value bytes are
    the Jackson-style JSON of the fields in declaration order."""
    df = spark.createDataFrame(_weather_rows(), schema=WEATHER_RAW).withColumn(
        "key", F.concat_ws("_", F.lit("dr5r"), F.col("wthr_date"))
    )
    wire = to_wire(df, key_col="key", value_cols=list(WEATHER_RAW.fieldNames()))
    assert [f.dataType.simpleString() for f in wire.schema.fields] == ["binary", "binary"]
    got = {bytes(r.key): bytes(r.value) for r in wire.orderBy("key").toLocalIterator()}
    assert got[b"dr5r_2017-08-29"] == (
        b'{"lat":12.34,"lng":56.78,"wthr_date":"2017-08-29",'
        b'"avg_tmpr_f":71.5,"avg_tmpr_c":21.9}'
    )
    # integral doubles keep their fractional marker, exactly as Jackson writes them
    assert json.loads(got[b"dr5r_2017-08-30"]) == {
        "lat": -0.25,
        "lng": 100.0,
        "wthr_date": "2017-08-30",
        "avg_tmpr_f": 70.0,
        "avg_tmpr_c": 21.1,
    }
    assert b'"lng":100.0' in got[b"dr5r_2017-08-30"]


def test_roundtrip_through_file_seam(spark, tmp_path):
    """to_wire -> durable seam -> from_wire recovers the typed rows exactly."""
    df = spark.createDataFrame(_weather_rows(), schema=WEATHER_RAW).withColumn(
        "key", F.concat_ws("_", F.lit("dr5r"), F.col("wthr_date"))
    )
    seam = str(tmp_path / "topic_weather")
    to_wire(df, key_col="key", value_cols=list(WEATHER_RAW.fieldNames())).write.parquet(seam)
    back = from_wire(spark.read.parquet(seam), WEATHER_RAW)
    got = sorted(
        back.select("key", *WEATHER_RAW.fieldNames()).collect(), key=lambda r: r.key
    )
    want = sorted(
        df.select("key", *WEATHER_RAW.fieldNames()).collect(), key=lambda r: r.key
    )
    assert got == want


def test_consumer_leniency_matches_jackson(spark):
    """Consumer side: unknown properties ignored, malformed -> null fields,
    null value bytes -> null row values (tombstone pass-through)."""
    payloads = [
        # extra unknown property, shuffled field order — Jackson parses by name
        (
            b"k1",
            b'{"extra":"ignored","lng":2.0,"lat":1.0,"avg_tmpr_c":0.0,'
            b'"avg_tmpr_f":32.0,"wthr_date":"2017-08-29"}',
        ),
        (b"k2", b"{not json"),  # malformed -> null columns, stream survives
        (b"k3", None),  # tombstone
    ]
    df = spark.createDataFrame(payloads, schema="key binary, value binary")
    rows = {r.key: r for r in from_wire(df, WEATHER_RAW).collect()}
    assert rows["k1"].lat == 1.0 and rows["k1"].wthr_date == "2017-08-29"
    assert "extra" not in rows["k1"].asDict()
    assert rows["k2"].lat is None and rows["k2"].wthr_date is None
    assert rows["k3"].lat is None


def test_write_kafka_stream_uses_wire_projection(spark):
    """The sink's value projection defaults to every non-key column, in
    column order — pin the default-selection branch of to_wire too."""
    df = spark.createDataFrame(
        [Row(hash="abcd", city="Amsterdam", avg=21.5)]
    )
    wire = to_wire(df, key_col="hash")
    r = wire.first()
    assert bytes(r.key) == b"abcd"
    assert bytes(r.value) == b'{"city":"Amsterdam","avg":21.5}'
