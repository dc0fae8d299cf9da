"""Streaming ingest into a persisted IVF-PQ index: the always-on half
of the build-once/query-many ANN story.

``operators.similarity.build_ivfpq_index`` builds the nightly index;
``append_to_ivfpq_index`` ingests batch deltas. What neither covers is a
STREAM of new vectors under foreachBatch's at-least-once contract: a
blind parquet append is not idempotent — a redelivered micro-batch would
double-insert its vectors, and duplicate index rows silently skew every
downstream k-NN (the duplicate occupies a shortlist slot). This module
ingests exactly-once via the family's versioned-shard protocol
(``streaming/state.py``, the ``streaming_dedup_near`` pattern): batch N
encodes its vectors with the FROZEN persisted model (the same one
Arrow-stage encode the batch appender uses) and writes them as a
``codes_v{N}`` shard published by ``_SUCCESS``; a redelivered batch
whose shard is committed skips wholesale; ``compact_every=K`` folds
committed shards into one compact root so a long-lived stream's index
read stays 1 root + <K shards instead of one root per ever-committed
batch (the r9 O(N^2) listing lesson).

Search (:func:`knn_ivfpq_stream_index`) unions the base build's
partition-pruned index scan with the committed stream shards and runs
the standard ADC + exact-rerank pipeline — results are bit-identical to
a batch index containing the same vectors under the same model (pinned
by tests/test_streaming_ann.py).

The model is FROZEN by construction (the stream never retrains): new
vectors whose distribution drifts from the training sample quantize
with more residual error — shortlist quality degrades gracefully, the
exact rerank keeps returned similarities true. Rebuild via
``build_ivfpq_index`` when drift matters, then point a FRESH checkpoint
+ shard dir at the new index.

Reference parity: no analogue — beyond-reference training-data mandate
(SURVEY.md north-star extensions).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["knn_ivfpq_stream_index", "streaming_ivfpq_ingest"]

_SHARD_PFX = "codes_v"
_SHARD_DIR = "stream_shards"


def _load_model(spark: SparkSession, index_path: str):
    from .state import path_exists

    if not path_exists(spark, f"{index_path}/model"):
        raise ValueError(
            f"no persisted IVF-PQ model under {index_path} — build the "
            "index first (operators.similarity.build_ivfpq_index); the "
            "stream ingests under a FROZEN model, it never trains one"
        )
    row = spark.read.parquet(f"{index_path}/model").first()
    centroids = np.array(row["centroids"])
    books = np.array(row["books"]).reshape(
        row["m"], row["ks"], row["dim"] // row["m"]
    )
    return centroids, books


def streaming_ivfpq_ingest(
    stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_every: int | None = None,
    dropped_acc=None,
):
    """Maintain the stream half of a persisted IVF-PQ index: each
    micro-batch's vectors are coarse-assigned + residual-encoded with
    the frozen model and committed as one ``codes_v{batch_id}`` shard
    under ``{index_path}/stream_shards``. Returns the StreamingQuery;
    search with :func:`knn_ivfpq_stream_index`.

    Exactly-once: overwrite-idempotent ``_SUCCESS``-published shards,
    committed batch ids skip wholesale, and the shard dir is bound to
    its checkpoint for life (a fresh checkpoint against existing shards
    would replay batch ids and silently drop real batches). Id
    uniqueness across the base build and the stream is the caller's
    ingest contract, as everywhere else in the engine."""
    from ..operators.similarity import _ivfpq_index
    from .state import (
        bind_state_to_checkpoint,
        committed_index_state,
        compact_index_shards,
    )

    spark = stream.sparkSession
    shard_root = f"{index_path}/{_SHARD_DIR}"
    centroids, books = _load_model(spark, index_path)
    bind_state_to_checkpoint(spark, shard_root, checkpoint_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        bspark = batch_df.sparkSession
        compact_path, hi, versions = committed_index_state(
            bspark, shard_root, _SHARD_PFX
        )
        if batch_id <= hi or batch_id in versions:
            return  # redelivery: this batch's shard is already durable
        _, c_indexed = _ivfpq_index(
            batch_df, id_col, vec_col, centroids, books, dropped_acc
        )
        c_indexed.write.mode("overwrite").parquet(
            f"{shard_root}/{_SHARD_PFX}{batch_id}"
        )
        # compaction AFTER the shard commit (publish-then-cleanup): a
        # crash inside it leaves the committed view intact
        if compact_every and len(versions) + 1 >= compact_every:
            compact_index_shards(bspark, shard_root, _SHARD_PFX)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def knn_ivfpq_stream_index(
    queries: DataFrame,
    corpus: DataFrame,
    index_path: str,
    k: int = 5,
    n_probe: int = 4,
    rerank_k: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dropped_acc=None,
) -> DataFrame:
    """Search the union of the base build and the committed stream
    shards: same output contract as ``knn_ivf_pq_from_index``
    ((query_id, neighbor_id, sim, rank), exact rounded cosine on the
    reranked survivors). The base ``index/`` scan keeps its probed-list
    partition pruning; the stream shards — bounded to 1 compact root +
    <compact_every live shards — are unioned in behind the same
    probed-cluster filter. ``corpus`` supplies raw vectors for the
    broadcast-shortlist rerank, base and stream vectors alike."""
    from ..operators.similarity import (
        _assign_clusters,
        _ivfpq_search,
    )
    from .state import committed_index_state, path_exists

    spark = queries.sparkSession
    centroids, books = _load_model(spark, index_path)

    q_slim = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    probed = sorted(
        {
            r["cluster"]
            for r in _assign_clusters(
                q_slim, "q_vec", centroids, n_probe, "cluster",
                dropped_acc=dropped_acc,
            ).select("cluster").distinct().collect()
        }
    )

    parts = []
    if path_exists(spark, f"{index_path}/index"):
        parts.append(
            spark.read.parquet(f"{index_path}/index")
            .filter(F.col("cluster").isin(probed))
            .select("neighbor_id", "cluster", "codes")
        )
    compact_path, _, live = committed_index_state(
        spark, f"{index_path}/{_SHARD_DIR}", _SHARD_PFX
    )
    roots = ([compact_path] if compact_path else []) + [
        f"{index_path}/{_SHARD_DIR}/{_SHARD_PFX}{v}" for v in live
    ]
    if roots:
        parts.append(
            spark.read.parquet(*roots)
            .filter(F.col("cluster").isin(probed))
            .select("neighbor_id", "cluster", "codes")
        )
    if not parts:
        raise ValueError(
            f"nothing to search under {index_path}: no base index and no "
            "committed stream shards"
        )
    c_indexed = parts[0]
    for p in parts[1:]:
        c_indexed = c_indexed.unionByName(p)

    c_slim = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    return _ivfpq_search(
        c_indexed, c_slim, queries, centroids, books,
        k=k, n_probe=n_probe, rerank_k=rerank_k,
        id_col=id_col, vec_col=vec_col, dropped_acc=dropped_acc,
    )
