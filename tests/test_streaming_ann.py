"""Streaming IVF-PQ ingest (streaming/ann.py): exactly-once shard
commits under a frozen persisted model, search over base+stream union
bit-identical to a batch index of the same vectors, replay no-op,
compaction bounding the shard read, and the no-model refusal."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="sann_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, src_dir: str, schema, index_path: str, ck: str, **kw) -> None:
    from kafka_streams_task_spark.streaming.ann import streaming_ivfpq_ingest

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = streaming_ivfpq_ingest(stream, index_path, ck, **kw)
    assert q.awaitTermination(120)  # False = still running at deadline


def test_stream_ingest_equals_batch_append_and_replays_noop(spark, sf01_dir, tmpdir):
    """Two micro-batches streamed into a half-built index must search
    IDENTICALLY to append_to_ivfpq_index over the same rows (and hence,
    by that operator's own pin, to a monolithic rebuild with the same
    training sample); redelivery adds nothing; the model is untouched."""
    from kafka_streams_task_spark.operators.similarity import (
        append_to_ivfpq_index,
        build_ivfpq_index,
    )
    from kafka_streams_task_spark.schemas import load_table
    from kafka_streams_task_spark.streaming.ann import knn_ivfpq_stream_index

    emb = load_table(spark, sf01_dir, "embeddings")
    old = emb.filter(F.col("vec_id") < 300)
    queries = emb.filter(F.col("vec_id") < 8)
    params = dict(k=5, n_probe=4, rerank_k=48)

    # the stream's two micro-batches: [300, 400) then [400, ...)
    src = f"{tmpdir}/in"
    emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400)).coalesce(
        1
    ).write.parquet(f"{src}/b0")
    emb.filter(F.col("vec_id") >= 400).coalesce(1).write.parquet(f"{src}/b1")
    # one flat dir of files for the file stream, oldest first
    flat = f"{tmpdir}/flat"
    os.makedirs(flat)
    for i, sub in enumerate(("b0", "b1")):
        (f_path,) = [
            f for f in os.listdir(f"{src}/{sub}") if f.endswith(".parquet")
        ]
        dst = f"{flat}/{sub}.parquet"
        shutil.copy(f"{src}/{sub}/{f_path}", dst)
        os.utime(dst, (1000000000 + i * 100,) * 2)

    stream_idx = f"{tmpdir}/idx_stream"
    build_ivfpq_index(old, stream_idx, n_clusters=16, m=8, ks=32, sample_size=300)
    model_before = spark.read.parquet(f"{stream_idx}/model").first()

    _run(spark, flat, emb.schema, stream_idx, f"{tmpdir}/ck")
    assert spark.read.parquet(f"{stream_idx}/model").first() == model_before

    batch_idx = f"{tmpdir}/idx_batch"
    build_ivfpq_index(old, batch_idx, n_clusters=16, m=8, ks=32, sample_size=300)
    append_to_ivfpq_index(emb.filter(F.col("vec_id") >= 300), batch_idx)

    from kafka_streams_task_spark.operators.similarity import (
        knn_ivf_pq_from_index,
    )

    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.sim)
        for r in knn_ivfpq_stream_index(
            queries, emb, stream_idx, **params
        ).collect()
    }
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.sim)
        for r in knn_ivf_pq_from_index(queries, emb, batch_idx, **params).collect()
    }
    assert got == want
    assert any(nid >= 300 for nid, _ in got.values())  # stream rows searched

    # replay no-op: same checkpoint re-run commits nothing new
    shards_before = sorted(os.listdir(f"{stream_idx}/stream_shards"))
    _run(spark, flat, emb.schema, stream_idx, f"{tmpdir}/ck")
    assert sorted(os.listdir(f"{stream_idx}/stream_shards")) == shards_before
    got2 = {
        (r.query_id, r.rank): (r.neighbor_id, r.sim)
        for r in knn_ivfpq_stream_index(
            queries, emb, stream_idx, **params
        ).collect()
    }
    assert got2 == got


def test_compaction_bounds_shards_and_preserves_results(spark, sf01_dir, tmpdir):
    """compact_every folds committed shards into one compact root; the
    READ VIEW (committed_index_state) is bounded to that root + the
    post-compaction live shards, while the covered shards stay on disk
    for one extra round (defer_cleanup — external searches that listed
    just before the publish keep their planned roots); the searched row
    set (and so every result) is unchanged."""
    from kafka_streams_task_spark.operators.similarity import build_ivfpq_index
    from kafka_streams_task_spark.schemas import load_table
    from kafka_streams_task_spark.streaming.ann import knn_ivfpq_stream_index

    emb = load_table(spark, sf01_dir, "embeddings")
    old = emb.filter(F.col("vec_id") < 300)
    queries = emb.filter(F.col("vec_id") < 8)

    flat = f"{tmpdir}/flat"
    os.makedirs(flat)
    for i, (lo, hi) in enumerate(((300, 400), (400, 450), (450, 10**9))):
        d = f"{tmpdir}/b{i}"
        emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.parquet(d)
        (f_path,) = [f for f in os.listdir(d) if f.endswith(".parquet")]
        dst = f"{flat}/b{i}.parquet"
        shutil.copy(f"{d}/{f_path}", dst)
        os.utime(dst, (1000000000 + i * 100,) * 2)

    idx = f"{tmpdir}/idx"
    build_ivfpq_index(old, idx, n_clusters=16, m=8, ks=32, sample_size=300)
    _run(spark, flat, emb.schema, idx, f"{tmpdir}/ck", compact_every=2)

    names = sorted(os.listdir(f"{idx}/stream_shards"))
    assert any("compact_" in n for n in names)

    # the READ VIEW is bounded: one compact root + the shards committed
    # after it — covered shards on disk are deferred leftovers the next
    # compaction removes, and the view ignores them
    from kafka_streams_task_spark.streaming.state import committed_index_state

    compact_path, hi, live_v = committed_index_state(
        spark, f"{idx}/stream_shards", "codes_v"
    )
    assert compact_path is not None and hi == 1
    assert all(v > hi for v in live_v) and len(live_v) <= 2
    # deferred cleanup kept the covered shards for this round
    assert {"codes_v0", "codes_v1"} <= {
        n for n in names if not n.startswith("codes_vcompact")
    }

    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.sim)
        for r in knn_ivfpq_stream_index(
            queries, emb, idx, k=5, n_probe=4, rerank_k=48
        ).collect()
    }
    # every streamed id is present in the searchable union exactly once
    roots = ([compact_path] if compact_path else []) + [
        f"{idx}/stream_shards/codes_v{v}" for v in live_v
    ]
    ids = spark.read.parquet(*roots).select("neighbor_id")
    assert ids.count() == ids.distinct().count() == 200
    assert len(got) > 0


def test_model_rebuild_in_place_is_refused(spark, sf01_dir, tmpdir):
    """Review-r15 pin: shards bind to the model's content fingerprint.
    Rebuilding the index in place (different training corpus => new
    centroids/books) makes the old shards' cluster ids and codes
    garbage — search AND further ingest must refuse, not silently
    union stale encodings."""
    from kafka_streams_task_spark.operators.similarity import (
        build_ivfpq_index,
    )
    from kafka_streams_task_spark.schemas import load_table
    from kafka_streams_task_spark.streaming.ann import (
        knn_ivfpq_stream_index,
        streaming_ivfpq_ingest,
    )

    emb = load_table(spark, sf01_dir, "embeddings")
    flat = f"{tmpdir}/flat"
    os.makedirs(flat)
    d = f"{tmpdir}/b0"
    emb.filter(F.col("vec_id") >= 400).coalesce(1).write.parquet(d)
    (f_path,) = [f for f in os.listdir(d) if f.endswith(".parquet")]
    shutil.copy(f"{d}/{f_path}", f"{flat}/b0.parquet")

    idx = f"{tmpdir}/idx"
    build_ivfpq_index(
        emb.filter(F.col("vec_id") < 300), idx,
        n_clusters=16, m=8, ks=32, sample_size=300,
    )
    _run(spark, flat, emb.schema, idx, f"{tmpdir}/ck")

    # in-place rebuild under a DIFFERENT training corpus: new model
    build_ivfpq_index(
        emb.filter(F.col("vec_id") < 200), idx,
        n_clusters=16, m=8, ks=32, sample_size=200,
    )
    queries = emb.filter(F.col("vec_id") < 8)
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        knn_ivfpq_stream_index(queries, emb, idx)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        streaming_ivfpq_ingest(stream, idx, f"{tmpdir}/ck")


def test_ingest_refuses_missing_model(spark, sf01_dir, tmpdir):
    from kafka_streams_task_spark.schemas import load_table
    from kafka_streams_task_spark.streaming.ann import (
        knn_ivfpq_stream_index,
        streaming_ivfpq_ingest,
    )

    emb = load_table(spark, sf01_dir, "embeddings")
    os.makedirs(f"{tmpdir}/nothing_in")
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmpdir}/nothing_in")
    )
    with pytest.raises(ValueError, match="no persisted IVF-PQ model"):
        streaming_ivfpq_ingest(stream, f"{tmpdir}/no_idx", f"{tmpdir}/ck")
    with pytest.raises(ValueError, match="no persisted IVF-PQ model"):
        knn_ivfpq_stream_index(emb.limit(1), emb, f"{tmpdir}/no_idx")
