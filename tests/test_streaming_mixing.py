"""Streaming mixing-policy twin (streaming/mixing.py): stream-maintained
score-bucket boundaries equal the batch fit over all ingested rows, the
versioned-state protocol survives replay and restart, and the persisted
fit parameters refuse mismatched callers."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="mixing_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)

# two micro-batches with ties, a NULL score, a NULL group, and a group
# that only appears in batch 1 — the cases the batch operator documents
_B0 = [
    {"doc_id": 1, "lang": "en", "score": 1.0},
    {"doc_id": 2, "lang": "en", "score": 2.0},
    {"doc_id": 3, "lang": "en", "score": 2.0},
    {"doc_id": 4, "lang": "de", "score": 5.0},
    {"doc_id": 5, "lang": None, "score": 1.5},
    {"doc_id": 6, "lang": "en", "score": None},
]
_B1 = [
    {"doc_id": 7, "lang": "en", "score": 3.0},
    {"doc_id": 8, "lang": "en", "score": 0.5},
    {"doc_id": 9, "lang": "de", "score": 4.0},
    {"doc_id": 10, "lang": "de", "score": 6.0},
    {"doc_id": 11, "lang": "fr", "score": 9.0},
    {"doc_id": 12, "lang": None, "score": 2.5},
]


def _write_batches(src: str) -> None:
    os.makedirs(src)
    for i, rows in enumerate((_B0, _B1)):
        with open(f"{src}/b{i}.json", "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows))
        os.utime(f"{src}/b{i}.json", (1000000000 + i * 100,) * 2)


def _run(spark, src: str, state: str, ck: str, **kw) -> None:
    from kafka_streams_task_spark.streaming.mixing import (
        streaming_score_boundaries,
    )

    stream = (
        spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    )
    q = streaming_score_boundaries(stream, state, ck, **kw)
    q.awaitTermination(120)


def _cuts_map(df) -> dict:
    return {r["lang"]: list(r["cuts"]) for r in df.collect()}


def test_stream_equals_batch_and_replay_noop(spark, tmpdir):
    from kafka_streams_task_spark.operators.sampling import (
        score_bucket_boundaries,
    )
    from kafka_streams_task_spark.streaming.mixing import (
        read_score_boundaries,
        read_score_counts,
    )

    src = f"{tmpdir}/in"
    state = f"{tmpdir}/state"
    ck = f"{tmpdir}/ckpt"
    _write_batches(src)
    _run(spark, src, state, ck)

    got = _cuts_map(read_score_boundaries(spark, state))
    batch = spark.createDataFrame(
        [tuple(r.values()) for r in _B0 + _B1], _SCHEMA
    )
    want = _cuts_map(score_bucket_boundaries(batch))
    assert got == want, (got, want)
    # the fixture exercises real structure: en has 3 bands, NULL group is
    # its own group, fr (single row) fits with empty-to-repeat cuts
    assert set(got) == {"en", "de", "fr", None}
    assert len(got["en"]) == 2

    # the cumulative count table is the exact merged statistic (the NULL
    # score row never entered it)
    counts = {
        (r["lang"], r["score"]): r["n"]
        for r in read_score_counts(spark, state).collect()
    }
    assert counts[("en", 2.0)] == 2
    assert ("en", None) not in counts
    assert sum(counts.values()) == 11

    # replay: same checkpoint re-run is a no-op (versions and cuts stable)
    versions_before = sorted(os.listdir(state))
    _run(spark, src, state, ck)
    assert sorted(os.listdir(state)) == versions_before
    assert _cuts_map(read_score_boundaries(spark, state)) == want


def test_restart_merges_new_batches(spark, tmpdir):
    """Stop after batch 0, restart on the SAME checkpoint with a new file
    present: the twin resumes from committed state and the final
    boundaries equal the batch fit over everything."""
    from kafka_streams_task_spark.operators.sampling import (
        score_bucket_boundaries,
    )
    from kafka_streams_task_spark.streaming.mixing import (
        read_score_boundaries,
    )

    src = f"{tmpdir}/in"
    state = f"{tmpdir}/state"
    ck = f"{tmpdir}/ckpt"
    os.makedirs(src)
    with open(f"{src}/b0.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in _B0))
    os.utime(f"{src}/b0.json", (1000000000,) * 2)
    _run(spark, src, state, ck)
    b0_only = _cuts_map(read_score_boundaries(spark, state))
    batch0 = spark.createDataFrame([tuple(r.values()) for r in _B0], _SCHEMA)
    assert b0_only == _cuts_map(score_bucket_boundaries(batch0))

    with open(f"{src}/b1.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in _B1))
    os.utime(f"{src}/b1.json", (1000000100,) * 2)
    _run(spark, src, state, ck)
    both = spark.createDataFrame(
        [tuple(r.values()) for r in _B0 + _B1], _SCHEMA
    )
    assert _cuts_map(read_score_boundaries(spark, state)) == _cuts_map(
        score_bucket_boundaries(both)
    )


def test_boundaries_serve_applies_like_batch(spark, tmpdir):
    """The serve loop: stream-maintained boundaries applied with the
    stateless apply_score_buckets reproduce the batch bucketing for
    every score seen at fit time."""
    from kafka_streams_task_spark.operators.sampling import (
        apply_score_buckets,
        score_buckets_by_group,
    )
    from kafka_streams_task_spark.streaming.mixing import (
        read_score_boundaries,
    )

    src = f"{tmpdir}/in"
    _write_batches(src)
    _run(spark, src, f"{tmpdir}/state", f"{tmpdir}/ckpt")
    bounds = read_score_boundaries(spark, f"{tmpdir}/state")
    rows = spark.createDataFrame(
        [tuple(r.values()) for r in _B0 + _B1], _SCHEMA
    )
    served = {
        r["doc_id"]: r["bucket"]
        for r in apply_score_buckets(rows, bounds).collect()
    }
    batch = {
        r["doc_id"]: r["bucket"]
        for r in score_buckets_by_group(rows).collect()
    }
    assert served == batch


def test_meta_validates_and_guards(spark, tmpdir):
    from kafka_streams_task_spark.streaming.mixing import (
        read_score_boundaries,
        streaming_score_boundaries,
    )

    src = f"{tmpdir}/in"
    state = f"{tmpdir}/state"
    _write_batches(src)
    _run(spark, src, state, f"{tmpdir}/ckpt", n_buckets=3)

    # a caller with different fit parameters is refused outright
    stream = (
        spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    )
    with pytest.raises(ValueError, match="was built with"):
        streaming_score_boundaries(
            stream, state, f"{tmpdir}/ckpt", n_buckets=4
        )

    # reads on an empty/unfitted state dir raise, not return garbage
    with pytest.raises(ValueError, match="no mixing_meta"):
        read_score_boundaries(spark, f"{tmpdir}/nowhere")

    with pytest.raises(ValueError, match="n_buckets"):
        streaming_score_boundaries(
            stream, f"{tmpdir}/state2", f"{tmpdir}/ckpt2", n_buckets=0
        )


def test_raw_score_keying_survives_double_collision(spark, tmpdir):
    """Advice-r14 pin: the streaming count table keys on the RAW score
    column, exactly like the batch fit. Long scores 2^53 and 2^53+1 are
    distinct to the batch path but collide under a double cast — under
    the old double-keyed state the maintained counts (and so the
    boundaries) could diverge from the batch fit the docstring promises
    bit-equality with."""
    from kafka_streams_task_spark.operators.sampling import (
        score_bucket_boundaries,
    )
    from kafka_streams_task_spark.streaming.mixing import (
        read_score_boundaries,
        read_score_counts,
        streaming_score_boundaries,
    )

    big = 1 << 53  # exactly representable; big+1 rounds onto it as double
    rows = [
        {"doc_id": 1, "lang": "en", "score": 1},
        {"doc_id": 2, "lang": "en", "score": 2},
        {"doc_id": 3, "lang": "en", "score": big},
        {"doc_id": 4, "lang": "en", "score": big},
        {"doc_id": 5, "lang": "en", "score": big + 1},
        {"doc_id": 6, "lang": "en", "score": big + 2},
    ]
    src = f"{tmpdir}/in"
    os.makedirs(src)
    with open(f"{src}/b0.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("score", T.LongType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(src)
    q = streaming_score_boundaries(
        stream, f"{tmpdir}/state", f"{tmpdir}/ckpt", n_buckets=3
    )
    q.awaitTermination(120)

    # the durable counts keep all 5 distinct raw scores apart
    counts = {
        r["score"]: r["n"]
        for r in read_score_counts(spark, f"{tmpdir}/state").collect()
    }
    assert counts == {1: 1, 2: 1, big: 2, big + 1: 1, big + 2: 1}, counts

    batch = spark.createDataFrame(
        [(r["doc_id"], r["lang"], r["score"]) for r in rows], schema
    )
    expect = {
        r["lang"]: list(r["cuts"])
        for r in score_bucket_boundaries(batch, n_buckets=3).collect()
    }
    got = {
        r["lang"]: list(r["cuts"])
        for r in read_score_boundaries(spark, f"{tmpdir}/state").collect()
    }
    assert got == expect


def test_score_key_type_change_refused_not_coerced(spark, tmpdir):
    """Review-r15 pin: merging a batch whose raw score type differs from
    the committed count table's key type is REFUSED — unionByName would
    silently widen (long -> double), re-keying durable state and
    reopening the >2^53 collision the raw keying closed."""
    from pyspark.sql.streaming import StreamingQueryException

    src = f"{tmpdir}/in"
    os.makedirs(src)
    with open(f"{src}/b0.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "lang": "en", "score": 1.5}))
    os.utime(f"{src}/b0.json", (1000000000,) * 2)

    # run 1: double-typed scores commit counts_v0 with a double key
    _run(spark, src, f"{tmpdir}/state", f"{tmpdir}/ckpt", n_buckets=3)

    # run 2: the stream's score column is now LONG — a later batch must
    # refuse the merge instead of coercing the durable keys
    with open(f"{src}/b1.json", "w") as f:
        f.write(json.dumps({"doc_id": 2, "lang": "en", "score": 7}))
    os.utime(f"{src}/b1.json", (1000000100,) * 2)
    long_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("score", T.LongType()),
        ]
    )
    from kafka_streams_task_spark.streaming.mixing import (
        streaming_score_boundaries,
    )

    stream = (
        spark.readStream.schema(long_schema).option("maxFilesPerTrigger", 1).json(src)
    )
    q = streaming_score_boundaries(
        stream, f"{tmpdir}/state", f"{tmpdir}/ckpt", n_buckets=3
    )
    with pytest.raises(StreamingQueryException, match="keys scores as"):
        q.awaitTermination(120)
