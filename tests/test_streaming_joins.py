"""Watermarked stream-stream interval join (streaming/joins.py):
batch equivalence on in-order data, outer-join null emission after
watermark passage, and the plan compiling to the symmetric hash join.
"""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_streams_task_spark.streaming.joins import interval_join


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="sjoin_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("what", T.StringType()),
    ]
)

# purchases join clicks of the same user within the preceding hour
_CLICKS = [
    [
        {"user_id": 1, "ts": "2024-01-01T10:00:00", "what": "c1"},
        {"user_id": 2, "ts": "2024-01-01T09:00:00", "what": "c2"},
    ],
    [
        {"user_id": 1, "ts": "2024-01-01T10:20:00", "what": "c3"},
    ],
    # sentinel: advances both watermarks far past all real data so
    # outer-join nulls for unmatched rows flush deterministically
    [{"user_id": 99, "ts": "2024-01-02T00:00:00", "what": "cz"}],
]
_PURCHASES = [
    [
        {"user_id": 1, "ts": "2024-01-01T10:30:00", "what": "p1"},
        {"user_id": 2, "ts": "2024-01-01T10:30:00", "what": "p2"},
    ],
    [
        {"user_id": 1, "ts": "2024-01-01T10:40:00", "what": "p3"},
        {"user_id": 3, "ts": "2024-01-01T10:45:00", "what": "p4"},
    ],
    [{"user_id": 98, "ts": "2024-01-02T00:00:00", "what": "pz"}],
]


def _write(src: str, batches) -> None:
    os.makedirs(src)
    for i, rows in enumerate(batches):
        p = f"{src}/b{i}.json"
        with open(p, "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (1000000000 + 100 * i,) * 2)


def _batch_frames(spark):
    clicks = spark.createDataFrame(
        [(r["user_id"], r["ts"].replace("T", " "), r["what"])
         for b in _CLICKS for r in b],
        "user_id long, ts string, what string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "what")
    purchases = spark.createDataFrame(
        [(r["user_id"], r["ts"].replace("T", " "), r["what"])
         for b in _PURCHASES for r in b],
        "user_id long, ts string, what string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "what")
    return purchases, clicks


def _stream_out(spark, tmpdir: str, how: str):
    _write(f"{tmpdir}/clicks", _CLICKS)
    _write(f"{tmpdir}/purch", _PURCHASES)
    purchases = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(f"{tmpdir}/purch")
    )
    clicks = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(f"{tmpdir}/clicks")
    )
    out = interval_join(
        purchases, clicks, "user_id", "ts", "ts",
        lower_s=-3600, upper_s=0,
        left_watermark="5 minutes", right_watermark="5 minutes",
        how=how,
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{tmpdir}/out_{how}")
        .option("checkpointLocation", f"{tmpdir}/ckpt_{how}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(f"{tmpdir}/out_{how}")


def _pairs(df):
    return sorted(
        (r["what"], r["r_what"])
        for r in df.collect()
        if r["user_id"] not in (98, 99)
    )


def test_inner_matches_batch_twin(spark, tmpdir):
    got = _pairs(_stream_out(spark, tmpdir, "inner"))
    purchases, clicks = _batch_frames(spark)
    want = _pairs(
        interval_join(
            purchases, clicks, "user_id", "ts", "ts", -3600, 0, how="inner"
        )
    )
    # p1 (10:30) pairs c1 (10:00) and c3 (10:20); p3 (10:40) pairs both
    # too; p2's click is 90 min old (outside); p4's user never clicked
    assert want == [("p1", "c1"), ("p1", "c3"), ("p3", "c1"), ("p3", "c3")]
    assert got == want


def test_left_outer_matches_batch_twin(spark, tmpdir):
    got = _pairs(_stream_out(spark, tmpdir, "left_outer"))
    purchases, clicks = _batch_frames(spark)
    want = _pairs(
        interval_join(
            purchases, clicks, "user_id", "ts", "ts", -3600, 0,
            how="left_outer",
        )
    )
    # unmatched purchases (p2, p4) surface with null click columns once
    # the watermark passes them (the sentinel batch flushes state)
    assert want == [
        ("p1", "c1"), ("p1", "c3"), ("p2", None),
        ("p3", "c1"), ("p3", "c3"), ("p4", None),
    ]
    assert got == want


def test_streaming_plan_is_symmetric_hash_join(spark, tmpdir):
    _write(f"{tmpdir}/clicks", _CLICKS[:1])
    _write(f"{tmpdir}/purch", _PURCHASES[:1])
    purchases = spark.readStream.schema(_SCHEMA).json(f"{tmpdir}/purch")
    clicks = spark.readStream.schema(_SCHEMA).json(f"{tmpdir}/clicks")
    out = interval_join(
        purchases, clicks, "user_id", "ts", "ts", -3600, 0
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ssj_plan")
        .option("checkpointLocation", f"{tmpdir}/ckpt_plan")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    plan = q.explain(extended=False) or ""
    # explain() prints; pull the final progress instead: the state
    # operator name proves the streaming symmetric hash join ran
    ops = [
        op["operatorName"]
        for p in [q.lastProgress]
        if p
        for op in p["stateOperators"]
    ]
    q.stop()
    assert "symmetricHashJoin" in ops, ops


def test_validation(spark):
    purchases, clicks = _batch_frames(spark)
    with pytest.raises(ValueError, match="how"):
        interval_join(purchases, clicks, "user_id", "ts", "ts", 0, 1, how="anti")
    with pytest.raises(ValueError, match="lower_s"):
        interval_join(purchases, clicks, "user_id", "ts", "ts", 5, 1)


def test_interval_join_prefix_validation(spark):
    """r12 (ADVICE r11): empty prefixes and left/prefixed-right name
    collisions are refused up front instead of binding ambiguously."""
    import pytest

    from kafka_streams_task_spark.streaming.joins import interval_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 5)],
        "user_id long, ts string, r_user_id long",
    ).selectExpr("user_id", "cast(ts as timestamp) ts", "r_user_id")
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "user_id long, ts string"
    ).selectExpr("user_id", "cast(ts as timestamp) ts")

    with pytest.raises(ValueError, match="right_prefix must be non-empty"):
        interval_join(left, right, "user_id", "ts", "ts", -60, 0, right_prefix="")
    with pytest.raises(ValueError, match="collide"):
        interval_join(left, right, "user_id", "ts", "ts", -60, 0)
    # a non-colliding prefix still works
    assert interval_join(
        left, right, "user_id", "ts", "ts", -60, 0, right_prefix="rr_"
    ).count() == 1
