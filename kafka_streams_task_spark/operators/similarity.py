"""Similarity search over embedding columns (array<float>).

Two paths:
  knn_bruteforce — exact cosine top-k: broadcast the query set, JVM-side
                   dot products (zip_with + aggregate), per-query top-k via
                   window. The baseline, and the right answer whenever the
                   query set is small (queries broadcast; corpus streams).
  knn_lsh        — random-hyperplane LSH bucketing: corpus and queries hash
                   to sign-bit buckets; candidates only meet inside a
                   bucket. The 100 TB path: shuffle keys are (table, bucket),
                   never O(corpus x queries).

Dot products stay in whole-stage codegen via higher-order functions; numpy
is used only to generate the fixed hyperplanes (driver-side, seeded).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import stable_round
from ..schemas import fan_out_scan, local_table


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def ivf_scale_params(
    n_vectors: int,
    *,
    geometry: str = "clustered",
    probe_frac: float | None = None,
    shortlist_frac: float | None = None,
    probe_lists: int = 12,
    rerank_c: float = 4.5,
    min_clusters: int = 16,
    min_rerank: int = 96,
) -> tuple[int, int, int]:
    """The executable IVF sizing rule — ``(n_clusters, n_probe,
    rerank_k)`` from a corpus count, so recall holds as the corpus grows
    instead of silently degrading under parameters tuned at one scale
    (the r13 sf0.1 sweep caught exactly that: fixed 16/12/96 passed the
    0.8 floor at 500 vectors and failed 3/10 queries at 2000).

    Shared across geometries:
      n_clusters = max(min_clusters, 2 * isqrt(N))
          — per-list mass grows only as sqrt(N)/2; the 2x over the bare
          isqrt buys quantization headroom (finer cells -> smaller
          residuals -> tighter ADC) at negligible centroid-table cost.

    ``geometry`` picks the probe/rerank shape (r15, VERDICT r14 item 1 —
    all numbers measured on the tools/ann_decade.py 5k -> 50k planted-
    neighborhood decade with a real near-uniform control; full table in
    SCALE.md):

    "clustered" (DEFAULT — the realistic regime: semantic/near-dup
    embeddings form tight neighborhoods that coarse lists capture):
      n_probe  = min(n_clusters, probe_lists)      # CONSTANT list count
      rerank_k = max(min_rerank, ceil(rerank_c * sqrt(N)))
      Per-query probed mass is therefore O(sqrt N) by construction —
      and with the r16 SPHERICAL coarse trainer (the norm-bias fix, see
      :func:`_kmeans_numpy`) the constant is ~1: measured 450 -> 1391
      candidates/query across the 5k -> 50k decade (3.09x per 10x docs
      vs the ideal sqrt(10)=3.16x; 1.03x the mean-list prediction at
      50k) with recall@5 = 1.0 at BOTH scales. The r15 reading of
      589 -> 4109 (7.0x/decade, blamed on trainer under-resolution) was
      the Euclidean trainer's norm bias steering probes into merged
      multi-blob lists — fixed, not tuned around. The pre-r15 fraction
      defaults did the same recall at 3793 -> 45137 candidates/query
      (11.9x per decade == linear, a per-query corpus scan at 100 TB).
      Even probe_lists=8 held recall 1.0 on the decade (930 mass at
      50k); 12 is the default for blob-straddling headroom.

    "uniform" (the adversarial no-structure case: i.i.d. random vectors,
    thin cosine margins, true neighbors spread across many lists — the
    driver's synthetic embeddings):
      n_probe  = ceil(0.75 * n_clusters)           # dense coverage
      rerank_k = max(min_rerank, ceil(0.10 * N))
      Per-query work is O(N) — irreducibly: with no neighborhood
      structure there is nothing for an inverted file to exploit, and
      the measured decade shows constant-probe recall collapsing to
      0.2 min on exactly this geometry. Dense probing here is honest
      exhaustiveness, not a default anyone should carry to real
      embeddings.

    Explicit ``probe_frac`` / ``shortlist_frac`` override the geometry
    preset for that knob (fraction-shaped, for callers tuning the
    uniform regime).

    All tuning knobs are KEYWORD-ONLY: r14 callers passed probe_frac/
    shortlist_frac positionally, and geometry now occupies that slot —
    a positional float must fail loudly (TypeError), not silently bind
    to geometry (review r15).

    Pinned: tests/test_llm_ops.py pins the arithmetic of both
    geometries; the similarity suite gates recall under "uniform" at
    sf0.01 (N=500 -> 44/33/96) and sf0.1 (N=2000 -> 88/66/200)."""
    import math

    if n_vectors < 1:
        raise ValueError(f"n_vectors must be >= 1, got {n_vectors}")
    if geometry not in ("clustered", "uniform"):
        raise ValueError(
            f"geometry must be 'clustered' or 'uniform', got {geometry!r}"
        )
    n_clusters = max(min_clusters, 2 * math.isqrt(n_vectors))
    if probe_frac is not None:
        n_probe = max(1, math.ceil(probe_frac * n_clusters))
    elif geometry == "uniform":
        n_probe = max(1, math.ceil(0.75 * n_clusters))
    else:
        n_probe = min(n_clusters, probe_lists)
    if shortlist_frac is not None:
        rerank_k = max(min_rerank, math.ceil(shortlist_frac * n_vectors))
    elif geometry == "uniform":
        rerank_k = max(min_rerank, math.ceil(0.10 * n_vectors))
    else:
        rerank_k = max(min_rerank, math.ceil(rerank_c * math.sqrt(n_vectors)))
    return n_clusters, n_probe, rerank_k


def malformed_vector_accumulator(spark):
    """A long accumulator for counting null / wrong-dimension vectors that
    the Arrow-stage guards drop (``lsh_table_buckets``, ``_assign_clusters``,
    ``_pq_encode``). Pass it as ``dropped_acc`` to any ANN operator, run the
    action, then read ``acc.value``: a non-zero count means a malformed
    embedding shard silently shrank the corpus — at production scale that is
    a data-quality pager, not noise. Accumulator semantics apply: task
    retries and plan re-execution can inflate the count, so treat it as a
    DIAGNOSTIC SIGNAL (zero vs non-zero, order of magnitude), not an exact
    tally."""
    return spark.sparkContext.accumulator(0)


def _guard_vectors(pdf, vec_col: str, dim: int, dropped_acc):
    """Shared ragged-row guard: keep rows whose vector is non-null and of
    width ``dim``; count the dropped remainder into ``dropped_acc`` when
    provided (a single ragged row would otherwise turn the batch into an
    object array and crash the matmul)."""
    ok = pdf[vec_col].map(lambda v: v is not None and len(v) == dim)
    n_dropped = int(len(pdf) - ok.sum())
    if dropped_acc is not None and n_dropped:
        dropped_acc.add(n_dropped)
    return pdf[ok]


def cosine_similarity(a, b) -> "F.Column":
    """Cosine similarity between two array columns, JVM-side."""
    a = _as_double(a)
    b = _as_double(b)
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def cosine_similarity_nullsafe(a, b) -> "F.Column":
    """Cosine similarity that yields NULL (not an ANSI DIVIDE_BY_ZERO error,
    not a NaN that Spark would sort above every number) when either vector
    has zero norm. For pipelines that cannot pre-filter zero vectors."""
    a = _as_double(a)
    b = _as_double(b)
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.try_divide(dot, na * nb)


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: query_id, neighbor_id, sim (rounded 6dp), rank 1..k.
    Self-matches (same id) are excluded. Ranking is stabilized by rounding
    before ranking and tie-breaking on neighbor_id, so results are
    deterministic across engines and partitionings.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            stable_round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col, planes: list[list[float]]) -> "F.Column":
    """Sign-bit bucket id for a vector under fixed random hyperplanes —
    pure column expressions (one dot product per plane)."""
    v = _as_double(vec_col)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(F.zip_with(v, p, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket.bitwiseOR(F.shiftleft(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), i))
    return bucket


def lsh_table_buckets(
    df: DataFrame,
    planes_mat: np.ndarray,
    n_tables: int,
    n_planes: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str = "id",
    dropped_acc=None,
    fan_out: bool = True,
) -> DataFrame:
    """(out_id, tbl, bkt) sign-bit bucket rows for ``n_tables`` independent
    random-hyperplane tables — one numpy matmul per Arrow batch
    (mapInPandas); the output carries ONLY ids, so downstream bucket joins
    never shuffle a vector. ``planes_mat`` is (n_tables*n_planes, dim).
    Shared by ``knn_lsh`` (search) and ``dedup.embedding_near_dup_pairs``.
    ``dropped_acc``: see :func:`malformed_vector_accumulator`."""
    import pandas as pd
    from pyspark.sql import types as T

    weights = 1 << np.arange(n_planes, dtype=np.int64)
    schema = T.StructType(
        [
            T.StructField(out_id, df.schema[id_col].dataType),
            T.StructField("tbl", T.IntegerType()),
            T.StructField("bkt", T.LongType()),
        ]
    )

    dim = planes_mat.shape[1]

    def batches(it):
        for pdf in it:
            pdf = _guard_vectors(pdf, vec_col, dim, dropped_acc)
            mat = np.array([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            if len(mat) == 0:
                yield pd.DataFrame(columns=[f.name for f in schema.fields])
                continue
            signs = (mat @ planes_mat.T) >= 0  # (n, n_tables*n_planes)
            parts = []
            for t in range(n_tables):
                bits = signs[:, t * n_planes : (t + 1) * n_planes]
                bkt = (bits * weights[None, :]).sum(axis=1)
                parts.append(
                    pd.DataFrame({out_id: pdf[id_col].values, "tbl": t, "bkt": bkt})
                )
            out = pd.concat(parts, ignore_index=True)
            out["tbl"] = out["tbl"].astype("int32")
            yield out

    # opt-r16 (guide §2.5): fan the projected (id, vec) scan out — a
    # single-split source runs the whole hyperplane projection in ONE
    # Python task (measured 0.47s single-task, mostly worker wait, on a
    # 32-core session); no-op on real multi-split tables. Callers pass
    # fan_out=False for sides they KNOW are tiny (a filtered benchmark,
    # a query handful): the split estimate cannot see a post-filter row
    # count, and 32 near-empty Python tasks cost more in worker
    # round-trips than the serialized matmul (measured: the
    # decontaminate_embedding benchmark side regressed ~2x).
    projected = df.select(id_col, vec_col)
    if fan_out:
        projected = fan_out_scan(projected)
    return projected.mapInPandas(batches, schema)


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    dropped_acc=None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH with ``n_tables``
    independent tables of ``n_planes`` sign bits. Candidates = corpus rows
    sharing any (table, bucket) with the query; exact cosine re-rank on
    candidates only.

    Recall grows with n_tables; cost per query is bounded by bucket sizes
    (expected corpus/2^n_planes per table).

    Plan shape (the 100 TB posture): bucket ids are computed by one numpy
    matmul per Arrow batch (mapInPandas); the bucket join and the pair
    dedup shuffle ONLY ids — embedding vectors rejoin just before scoring,
    so no shuffle ever carries a vector per candidate pair.
    """
    rng_planes = np.vstack(
        [random_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    )  # (n_tables*n_planes, dim)

    def bucketed(df: DataFrame, ident: str, fan_out: bool = True) -> DataFrame:
        return lsh_table_buckets(
            df, rng_planes, n_tables, n_planes, id_col, vec_col, ident,
            dropped_acc=dropped_acc, fan_out=fan_out,
        )

    pairs = (
        # query side is broadcast below, i.e. small by contract — skip
        # the fan-out (32 near-empty Python tasks cost more than the
        # serialized matmul; see lsh_table_buckets)
        bucketed(corpus, "neighbor_id")
        .join(F.broadcast(bucketed(queries, "query_id", fan_out=False)), on=["tbl", "bkt"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q_vecs = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c_vecs = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        pairs.join(F.broadcast(q_vecs), on="query_id")
        .join(c_vecs, on="neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            stable_round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def _clean_matrix(values) -> np.ndarray:
    """Stack a pandas column of array-typed values into an (n, dim) float64
    matrix, dropping nulls and wrong-dimension rows (dim = first valid
    row's length). Driver-side counterpart of the Arrow-stage ragged-row
    guards."""
    vecs = [np.asarray(v, dtype="float64") for v in values if v is not None]
    if not vecs:
        return np.zeros((0, 0))
    dim = len(vecs[0])
    return np.array([v for v in vecs if len(v) == dim])


def _kmeans_numpy(
    sample: np.ndarray,
    n_clusters: int,
    seed: int,
    n_iter: int = 12,
    *,
    metric: str = "l2",
) -> np.ndarray:
    """Small driver-side k-means (numpy, seeded) for IVF coarse centroids.

    ``metric="l2"`` is classic Lloyd's (PQ residual codebooks, where
    Euclidean quantization of residuals is the correct objective, and
    the semantic-dedup clustering). r16: the assignment runs through
    the GEMM identity and the mean update through np.add.at — rounding
    can differ from the historical subtract-square form on near-ties,
    and every gated consumer was re-proven against the oracle at
    sf0.001/0.01/0.1 after the change (see the loop comment below).

    ``metric="cosine"`` is SPHERICAL k-means (normalize inputs, assign
    by max dot product, re-normalize centroid means) — the correct
    coarse quantizer for this module's cosine-similarity search, and
    the r16 fix for the measured probed-list skew the r15 ANN decade
    attributed to trainer under-resolution. The real mechanism was a
    METRIC MISMATCH: Euclidean nearest-centroid ranking prefers
    small-norm centroids (dist ~ ||c||^2 - 2 q.c, and q.c ~ 0 for
    unrelated lists), and a centroid that averaged several
    near-orthogonal topic blobs has norm ~ 1/sqrt(m_blobs) — so every
    query's probe set was steered INTO exactly the merged multi-blob
    (oversized) lists. Unit-norm centroids remove the norm term;
    measured on the tools/ann_decade.py clu_50k fixture this one change
    took probed mass per query from 4109 (3.1x the mean-list
    prediction; distributed l2 training still 3278) to 1391 = 1.03x the
    mean-list prediction at recall 1.0, with max list size 777 -> 288.
    Downstream assignment needs NO change: ``_assign_clusters``'
    Euclidean argmin equals max-dot-product ranking whenever all
    centroids are unit-norm."""
    # the trainers may run on a session the library didn't build (the
    # grading driver's own), so pin here too — idempotent, driver-only
    from ..plans.session import pin_driver_blas_threads

    pin_driver_blas_threads()
    rng = np.random.default_rng(seed)
    if metric not in ("l2", "cosine"):
        raise ValueError(f"metric must be 'l2' or 'cosine', got {metric!r}")
    if metric == "cosine":
        X = _l2_normalize(sample.astype("float64"))
        cent = X[rng.choice(len(X), size=n_clusters, replace=False)].copy()
        for _ in range(n_iter):
            assign = (X @ cent.T).argmax(axis=1)
            sums = np.zeros_like(cent)
            cnt = np.zeros(n_clusters)
            np.add.at(sums, assign, X)
            np.add.at(cnt, assign, 1)
            nz = cnt > 0
            cent[nz] = sums[nz]  # empty clusters keep their previous unit vector
            cent = _l2_normalize(cent)
        return cent
    centroids = sample[rng.choice(len(sample), size=n_clusters, replace=False)].copy()
    for _ in range(n_iter):
        # opt-r16 (guide §4.2 applied driver-side): argmin over
        # ||x-c||^2 equals argmin over ||c||^2 - 2 x.c (the ||x||^2 term
        # is constant per row), so the assignment runs as one BLAS GEMM
        # instead of materializing the (n, k, d) subtract-square
        # temporary — the old form cost 1.5 s per IVF-PQ codebook train
        # at the bench sample size (96 allocations of a 16 MB temp).
        # Mean update via np.add.at replaces the per-cluster Python
        # loop. Rounding differs from the subtract-square form only on
        # near-ties; all gated consumers re-verified against the oracle
        # at sf0.001/0.01/0.1 after this change.
        d = (centroids**2).sum(axis=1)[None, :] - 2.0 * (sample @ centroids.T)
        assign = d.argmin(axis=1)
        sums = np.zeros_like(centroids)
        cnt = np.zeros(n_clusters)
        np.add.at(sums, assign, sample)
        np.add.at(cnt, assign, 1)
        nz = cnt > 0
        centroids[nz] = sums[nz] / cnt[nz, None]  # empty clusters keep their previous centroid
    return centroids


def _assign_clusters(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    n_probe: int,
    out_col: str,
    dropped_acc=None,
):
    """mapInPandas: nearest-centroid assignment (numpy matmul over Arrow
    batches). Emits one row per (row, probed cluster) — n_probe=1 for the
    corpus (each vector indexed once), >1 for queries (probe several lists).
    ``dropped_acc``: see :func:`malformed_vector_accumulator`."""
    import pandas as pd
    from pyspark.sql import types as T

    cent = centroids.astype("float64")
    cent_sq = (cent**2).sum(axis=1)

    in_fields = df.schema.fields
    out_schema = T.StructType(list(in_fields) + [T.StructField(out_col, T.IntegerType())])

    dim = cent.shape[1]

    def batches(it):
        for pdf in it:
            pdf = _guard_vectors(pdf, vec_col, dim, dropped_acc)
            mat = np.array([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            if len(mat) == 0:
                yield pd.DataFrame(columns=[f.name for f in out_schema.fields])
                continue
            # argmin over ||x-c||^2 = ||c||^2 - 2 x.c (||x||^2 constant per row)
            scores = cent_sq[None, :] - 2.0 * (mat @ cent.T)
            order = np.argsort(scores, axis=1)[:, :n_probe]
            reps = []
            for j in range(n_probe):
                rep = pdf.copy()
                rep[out_col] = order[:, j].astype("int32")
                reps.append(rep)
            yield pd.concat(reps, ignore_index=True)

    return df.mapInPandas(batches, out_schema)


def kmeans_fit_distributed(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    n_iter: int = 8,
    *,
    metric: str = "l2",
) -> np.ndarray:
    """Distributed Lloyd's k-means: the 100 TB IVF trainer.

    Per iteration: (1) nearest-centroid assignment — the shared
    ``_assign_clusters`` numpy matmul over Arrow batches, centroids
    broadcast inside the closure; (2) centroid update — posexplode each
    vector to (cluster, dim_pos, value) and one partial+final aggregate;
    only the k x dim (sum, count) table returns to the driver (a few KB),
    never vectors. Deterministic: init is the first ``n_clusters`` vectors
    in id order, iteration count is fixed (no data-dependent early stop).
    Empty clusters keep their previous centroid.

    Contrast with the bounded-sample trainer inside ``knn_ivf``: that one
    sees ``sample_size`` rows total; this one sweeps the full corpus each
    round and scales with executors.

    ``metric="cosine"`` (keyword-only, r16) is the distributed form of
    spherical k-means — initial centroids and each iteration's mean
    updates are L2-normalized, so assignment (the shared Euclidean
    argmin) ranks by dot product exactly as the sampled spherical
    trainer does (see :func:`_kmeans_numpy` for why this is the correct
    coarse quantizer for cosine search). The update statistics are the
    same (sum, count) table; only the driver-side normalization of the
    k x dim result differs — per-iteration cost is unchanged.
    """
    if metric not in ("l2", "cosine"):
        raise ValueError(f"metric must be 'l2' or 'cosine', got {metric!r}")
    init_pdf = df.select(vec_col).orderBy(id_col).limit(n_clusters).toPandas()
    centroids = _clean_matrix(init_pdf[vec_col])
    if metric == "cosine":
        centroids = _l2_normalize(centroids.astype("float64"))
    # opt-r16 (guide §2.5): every Lloyd iteration re-runs the assignment
    # over the corpus; on a single-split source that's one Python task
    # per iteration. Fan the projected scan out once, reused by all
    # iterations (no-op on multi-split tables).
    slim = fan_out_scan(
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    )
    for _ in range(n_iter):
        assigned = _assign_clusters(slim, "_v", centroids, 1, "cluster")
        stats = (
            assigned.select(
                "cluster", F.posexplode(F.transform("_v", lambda x: x.cast("double")))
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("col").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = centroids.copy()
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids))
        for r in stats:
            sums[r["cluster"], r["pos"]] += r["s"]
            counts[r["cluster"]] = r["n"]
        nonempty = counts > 0
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        if metric == "cosine":
            new = _l2_normalize(new)
        centroids = new
    return centroids


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    sample_size: int = 4096,
    seed: int = 42,
    train: str = "sample",
    dropped_acc=None,
    *,
    coarse_metric: str = "cosine",
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) coarse quantization.

    Train: k-means centroids on a bounded driver-side sample (seeded,
    deterministic). Index: every corpus vector is assigned to its nearest
    centroid (one shuffle key: cluster id). Search: each query probes its
    ``n_probe`` nearest centroids and exact-reranks only those lists.

    At 100 TB the centroid table is tiny and broadcast inside the numpy
    closure; the only join is (cluster) x (cluster) — candidate volume is
    corpus * n_probe / n_clusters per query on average. Raise n_clusters
    (sqrt(N) rule of thumb) and n_probe for the recall/latency trade.

    ``train="sample"`` fits centroids on a bounded driver-side sample
    (fast, deterministic — fine while a sample spans the distribution);
    ``train="distributed"`` runs full-corpus Lloyd iterations
    (``kmeans_fit_distributed``) — the scale path when no driver-sized
    sample is representative.

    ``coarse_metric`` (keyword-only, r16) picks the coarse trainer's
    objective, DEFAULT ``"cosine"`` (spherical k-means): the search
    metric is cosine, and a Euclidean coarse quantizer steers probes
    into small-norm (= merged multi-blob, oversized) lists on clustered
    embedding geometry — see :func:`_kmeans_numpy` for the mechanism
    and the measured 3x probed-mass reduction at recall 1.0 on the
    decade fixtures. ``"l2"`` keeps the classic Euclidean trainer —
    what the driver suite pins for its near-uniform adversarial fixture
    (no blob structure means no norm bias to fix, and the historical
    partition is the one its per-query 0.8 recall floor was proven on),
    exactly parallel to its explicit ``geometry="uniform"`` sizing.
    """
    if train not in ("sample", "distributed"):
        raise ValueError(f"train must be 'sample' or 'distributed', got {train!r}")
    if train == "distributed":
        centroids = kmeans_fit_distributed(
            corpus, vec_col, id_col, n_clusters=n_clusters, metric=coarse_metric
        )
    else:
        sample_pdf = (
            corpus.select(vec_col).orderBy(id_col).limit(sample_size).toPandas()
        )
        sample = _clean_matrix(sample_pdf[vec_col])
        centroids = _kmeans_numpy(
            sample, min(n_clusters, len(sample)), seed, metric=coarse_metric
        )

    # opt-r16 measured note: deliberately NOT fanned out. The IVF paths
    # chain several sequential Arrow stages; widening each to session
    # parallelism on this fixture spawned a fresh Python worker per task
    # per stage (~0.7s of import/startup wait each, profiled at 32 tasks
    # x 23.7s taskSum vs 0.9s of CPU) and regressed knn_ivf ~0.5s. The
    # single-Python-stage operators (lsh_table_buckets) keep the fan-out.
    c_assigned = _assign_clusters(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        "c_vec", centroids, 1, "cluster", dropped_acc=dropped_acc,
    )
    q_assigned = _assign_clusters(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "q_vec", centroids, n_probe, "cluster", dropped_acc=dropped_acc,
    )
    cand = (
        c_assigned.join(F.broadcast(q_assigned), on="cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            stable_round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def _pq_train_codebooks(
    sample: np.ndarray, m: int, ks: int, seed: int
) -> np.ndarray:
    """Per-subspace k-means codebooks for product quantization:
    (m, ks, dim/m). Subspace j gets its own seeded k-means over the
    sample's j-th vector slice."""
    n, dim = sample.shape
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    ks = min(ks, n)
    books = np.zeros((m, ks, sub))
    for j in range(m):
        books[j] = _kmeans_numpy(sample[:, j * sub : (j + 1) * sub], ks, seed + j)
    return books


def _l2_normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.sqrt((mat**2).sum(axis=1, keepdims=True))
    norms[norms == 0] = 1.0
    return mat / norms


def _pq_encode(
    df: DataFrame,
    vec_col: str,
    books: np.ndarray,
    out_col: str = "codes",
    centroids_norm: np.ndarray | None = None,
    cluster_col: str = "cluster",
    dropped_acc=None,
):
    """mapInPandas: encode each L2-NORMALIZED vector to m subspace code ids
    (argmin distance to the subspace codebook) — one numpy pass per Arrow
    batch; the output carries (input columns..., codes array<int>), so
    downstream candidate scoring shuffles m small ints per vector instead
    of the vector itself. Normalization makes the downstream ADC dot
    product approximate COSINE (the ranking the exact rerank uses), not
    the norm-biased raw dot.

    ``centroids_norm``: when given, encode the RESIDUAL ``x_norm -
    centroids_norm[cluster]`` instead of the vector itself (standard IVFADC
    refinement, Jégou et al. 2011 §III-B: residuals concentrate around the
    origin, so a fixed-size codebook spends its codes on a much smaller
    cell and the per-subspace quantization error drops). Requires the
    ``cluster_col`` produced by ``_assign_clusters`` in the input."""
    import pandas as pd
    from pyspark.sql import types as T

    m, ks, sub = books.shape
    dim = m * sub
    books_sq = (books**2).sum(axis=2)  # (m, ks)

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.IntegerType()))]
    )

    def batches(it):
        for pdf in it:
            # NOTE: when chained after _assign_clusters the input is already
            # guarded; dropped_acc here counts only rows malformed at THIS
            # stage (normally zero in the chained path)
            pdf = _guard_vectors(pdf, vec_col, dim, dropped_acc)
            mat = np.array([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            if len(mat) == 0:
                yield pd.DataFrame(columns=[f.name for f in out_schema.fields])
                continue
            mat = _l2_normalize(mat)
            if centroids_norm is not None:
                mat = mat - centroids_norm[pdf[cluster_col].to_numpy()]
            codes = np.zeros((len(mat), m), dtype="int32")
            for j in range(m):
                x = mat[:, j * sub : (j + 1) * sub]
                # argmin ||x - c||^2 = ||c||^2 - 2 x.c per subspace
                scores = books_sq[j][None, :] - 2.0 * (x @ books[j].T)
                codes[:, j] = scores.argmin(axis=1)
            out = pdf.copy()
            out[out_col] = list(codes)
            yield out

    return df.mapInPandas(batches, out_schema)


def knn_ivf_pq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ks: int = 16,
    rerank_k: int = 32,
    sample_size: int = 4096,
    seed: int = 42,
    dropped_acc=None,
    *,
    coarse_metric: str = "cosine",
) -> DataFrame:
    """Approximate top-k via IVF + product quantization with asymmetric
    distance computation (Jégou et al. 2011, "Product Quantization for
    Nearest Neighbor Search") — the classic memory-bounded ANN layout for
    corpora whose raw vectors can't sit in RAM:

      train   — IVF coarse centroids + per-subspace PQ codebooks on a
                bounded seeded sample (driver-side; both tables are tiny
                and broadcast inside numpy closures).
      index   — one mapInPandas pass assigns each corpus vector to its
                nearest coarse list AND encodes it to ``m`` sub-quantizer
                codes: the searchable index row is (id, cluster, m ints) —
                at 100 TB the candidate shuffle carries ~m bytes per
                vector instead of dim floats (16x smaller at m=8/dim=64).
      search  — each query probes ``n_probe`` lists; ADC scores candidates
                ENTIRELY in whole-stage codegen: the query's (m x ks)
                lookup table of subspace dot products rides along as an
                array<array<double>> column and the PQ dot product is
                zip_with(codes, lut) + element_at + aggregate — no Python,
                no vector in the shuffle. The ADC top ``rerank_k`` per
                query then joins TRUE vectors for an exact cosine rerank
                (standard IVFADC refinement), emitting top ``k``.

    Output schema matches ``knn_bruteforce``/``knn_lsh``/``knn_ivf``:
    (query_id, neighbor_id, sim, rank) — sim is the EXACT rounded cosine
    of the reranked survivors, so downstream thresholds behave identically
    across all four engines.

    ADC is RESIDUAL-quantized (Jégou et al. §III-B): the index encodes
    ``x_norm - c_norm(list)`` and search reconstructs ``q·x ≈
    q·c_norm(list) + Σ_j lut[j][code_j]`` — the ``q·c`` term is exact (the
    centroid table is tiny), so PQ codes only carry the residual, which is
    far smaller in magnitude than the vector and quantizes much more
    accurately with the same (m, ks) budget. One SHARED residual codebook
    set serves all lists (per-list books would be n_clusters× more driver
    state for marginal gain at these budgets).

    The embedding dimension is inferred from the training sample (and must
    be divisible by ``m``); corpus/query rows whose vectors are null or of
    any other width are dropped by the Arrow-stage guards.
    """
    centroids, books = _ivfpq_train(
        corpus, id_col, vec_col, n_clusters, m, ks, sample_size, seed,
        coarse_metric=coarse_metric,
    )
    c_slim, c_indexed = _ivfpq_index(corpus, id_col, vec_col, centroids, books, dropped_acc)
    return _ivfpq_search(
        c_indexed, c_slim, queries, centroids, books,
        k=k, n_probe=n_probe, rerank_k=rerank_k,
        id_col=id_col, vec_col=vec_col, dropped_acc=dropped_acc,
    )


def _ivfpq_train(
    corpus, id_col, vec_col, n_clusters, m, ks, sample_size, seed,
    *, coarse_metric: str = "cosine",
):
    """Driver-side training on a bounded seeded sample: IVF coarse
    centroids (spherical by default — see :func:`knn_ivf` on
    ``coarse_metric``) + SHARED residual PQ codebooks (normalized
    space, always Euclidean — residual quantization minimizes L2 error
    of the reconstruction, the correct PQ objective regardless of the
    coarse metric). Returns (centroids, books)."""
    sample_pdf = corpus.select(vec_col).orderBy(id_col).limit(sample_size).toPandas()
    sample = _clean_matrix(sample_pdf[vec_col])
    if sample.size == 0:
        raise ValueError("knn_ivf_pq: no valid vectors in the training sample")
    dim = sample.shape[1]
    if dim % m != 0:
        raise ValueError(f"embedding dim {dim} not divisible by m={m} subspaces")
    centroids = _kmeans_numpy(
        sample, min(n_clusters, len(sample)), seed, metric=coarse_metric
    )
    # PQ operates in L2-normalized space so ADC approximates cosine (see
    # _pq_encode); under the default SPHERICAL coarse quantizer (r16 —
    # see _kmeans_numpy for the norm-bias mechanism) the centroids are
    # already unit-norm and the residual anchors below coincide with
    # them; under coarse_metric="l2" the normalize projects the raw-
    # space centroids onto the unit sphere as before — any fixed
    # per-list anchor works for residual coding.
    cent_norm = _l2_normalize(centroids.astype("float64"))
    samp_norm = _l2_normalize(sample)
    cent_sq = (centroids**2).sum(axis=1)
    samp_assign = (cent_sq[None, :] - 2.0 * (sample @ centroids.T)).argmin(axis=1)
    books = _pq_train_codebooks(samp_norm - cent_norm[samp_assign], m, ks, seed + 1000)
    return centroids, books


def _ivfpq_index(corpus, id_col, vec_col, centroids, books, dropped_acc=None):
    """ONE fused Arrow kernel: coarse assignment + residual PQ codes
    (opt-r17, guide §4.2/§4.5 stage fusion — the r16 shape chained two
    mapInPandas stages, so every corpus vector crossed the Python
    boundary twice and rode back out of the assignment stage only to be
    shipped into the encode stage again; fused, the vector crosses once
    and only (id, cluster, m codes) ever leaves Python). Identical
    numpy ops in the identical order — bit-identical codes, re-proven
    against the oracle for the gated consumers.
    Returns (c_slim, c_indexed) — the (id, vector) projection the rerank
    uses, and the searchable (neighbor_id, cluster, codes) index."""
    import pandas as pd
    from pyspark.sql import types as T

    cent = centroids.astype("float64")
    cent_sq = (cent**2).sum(axis=1)
    cent_norm = _l2_normalize(cent)
    m, ks, sub = books.shape
    dim = m * sub
    books_sq = (books**2).sum(axis=2)  # (m, ks)

    c_slim = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    out_schema = T.StructType(
        [
            c_slim.schema["neighbor_id"],
            T.StructField("cluster", T.IntegerType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    # opt-r16 measured note: deliberately NOT fanned out — see the
    # knn_ivf assignment note (chained Arrow stages x 32 tasks pay a
    # worker-startup storm that dwarfs the serialized matmul here).
    def batches(it):
        for pdf in it:
            pdf = _guard_vectors(pdf, "c_vec", dim, dropped_acc)
            mat = np.array([np.asarray(v, dtype="float64") for v in pdf["c_vec"]])
            if len(mat) == 0:
                yield pd.DataFrame(columns=[f.name for f in out_schema.fields])
                continue
            # argmin ||x-c||^2 = ||c||^2 - 2 x.c (||x||^2 constant per row);
            # argsort[:, 0] (not argmin) to match _assign_clusters' exact
            # tie behavior — the fused kernel must reproduce the chained
            # path's assignments bit-for-bit
            scores = cent_sq[None, :] - 2.0 * (mat @ cent.T)
            assign = np.argsort(scores, axis=1)[:, 0]
            resid = _l2_normalize(mat) - cent_norm[assign]
            codes = np.zeros((len(resid), m), dtype="int32")
            for j in range(m):
                x = resid[:, j * sub : (j + 1) * sub]
                codes[:, j] = (
                    books_sq[j][None, :] - 2.0 * (x @ books[j].T)
                ).argmin(axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "cluster": assign.astype("int32"),
                    "codes": list(codes),
                }
            )

    c_indexed = c_slim.mapInPandas(batches, out_schema)
    return c_slim, c_indexed


def _ivfpq_search(
    c_indexed, c_slim, queries, centroids, books,
    k, n_probe, rerank_k, id_col, vec_col, dropped_acc=None,
):
    """ADC candidate scoring + exact cosine rerank over a (neighbor_id,
    cluster, codes) index (see :func:`knn_ivf_pq` for the full story)."""
    cent_norm = _l2_normalize(centroids.astype("float64"))
    m, ks, sub = books.shape

    # queries: probe assignment + the per-query ADC lookup table and the
    # exact q·c_norm(list) term for the probed list.
    # lut[j][c] = q_j · books[j][c]  (residual ADC; cosine rerank later)
    import pandas as pd
    from pyspark.sql import types as T

    q_slim = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))

    cent = centroids.astype("float64")
    cent_sq = (cent**2).sum(axis=1)
    dim = m * sub
    lut_schema = T.StructType(
        list(q_slim.schema.fields)
        + [
            T.StructField("cluster", T.IntegerType()),
            T.StructField("lut", T.ArrayType(T.ArrayType(T.DoubleType()))),
            T.StructField("qc", T.DoubleType()),
        ]
    )

    # opt-r17 (guide §4.2/§4.5 stage fusion): probe assignment + the ADC
    # lookup table + the exact q·c term in ONE Arrow kernel — the r16
    # shape chained _assign_clusters into a second with_lut mapInPandas,
    # paying the Python-stage round trip twice per query batch. Same
    # numpy ops, same probe-major emission order as the chained path.
    def with_lut(it):
        for pdf in it:
            pdf = _guard_vectors(pdf, "q_vec", dim, dropped_acc)
            raw = np.array([np.asarray(v, dtype="float64") for v in pdf["q_vec"]])
            if len(raw) == 0:
                yield pd.DataFrame(columns=[f.name for f in lut_schema.fields])
                continue
            order = np.argsort(cent_sq[None, :] - 2.0 * (raw @ cent.T), axis=1)[
                :, :n_probe
            ]
            mat = _l2_normalize(raw)
            luts = [
                [list((books[j] @ row[j * sub : (j + 1) * sub])) for j in range(m)]
                for row in mat
            ]
            reps = []
            for j in range(n_probe):
                rep = pdf.copy()
                rep["cluster"] = order[:, j].astype("int32")
                rep["lut"] = luts
                rep["qc"] = (mat * cent_norm[order[:, j]]).sum(axis=1)
                reps.append(rep)
            yield pd.concat(reps, ignore_index=True)

    q_with_lut = q_slim.mapInPandas(with_lut, lut_schema)

    # ADC scoring in codegen: qc + sum_j lut[j][codes[j]]
    adc = F.col("qc") + F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("lut"),
            lambda c, row: F.element_at(row, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = (
        c_indexed.join(F.broadcast(q_with_lut), on="cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", adc.alias("adc"), "q_vec")
    )
    w_adc = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), F.col("neighbor_id"))
    shortlist = (
        cand.withColumn("_r", F.row_number().over(w_adc))
        .filter(F.col("_r") <= rerank_k)
        .select("query_id", "neighbor_id", "q_vec")
    )
    # the shortlist (|queries| x rerank_k rows, with query vectors) is tiny
    # in the small-query regime this operator serves — broadcast it
    # EXPLICITLY so the corpus vector table streams through the rerank scan
    # instead of shuffling on neighbor_id (AQE would usually infer this,
    # but at 100 TB the corpus side must never be the shuffled side)
    rerank = c_slim.join(F.broadcast(shortlist), on="neighbor_id").select(
        "query_id",
        "neighbor_id",
        stable_round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        rerank.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    m: int = 8,
    ks: int = 16,
    sample_size: int = 4096,
    seed: int = 42,
    dropped_acc=None,
    *,
    coarse_metric: str = "cosine",
) -> None:
    """Build the IVF-PQ index ONCE and persist it — the 100 TB serving
    pattern :func:`knn_ivf_pq` (train+index+search per call) does not
    capture: a production corpus is indexed by one nightly job and then
    queried thousands of times without touching raw vectors again.

    Layout under ``path``:
      * ``index/`` — (neighbor_id, codes) parquet PARTITIONED BY cluster,
        so a search probing ``n_probe`` lists prunes to exactly those
        partition directories (the on-disk analogue of inverted-list
        seeks; untouched lists are never read);
      * ``model/`` — one row holding (dim, m, ks, centroids, books) as
        nested arrays — a few KB; the whole trained model loads to the
        driver in one read.
    """
    centroids, books = _ivfpq_train(
        corpus, id_col, vec_col, n_clusters, m, ks, sample_size, seed,
        coarse_metric=coarse_metric,
    )
    _, c_indexed = _ivfpq_index(corpus, id_col, vec_col, centroids, books, dropped_acc)
    c_indexed.write.mode("overwrite").partitionBy("cluster").parquet(f"{path}/index")
    spark = corpus.sparkSession
    m_, ks_, sub = books.shape
    model = local_table(
        spark,
        [(m_ * sub, m_, ks_, centroids.tolist(), books.reshape(m_ * ks_, sub).tolist())],
        "dim int, m int, ks int, centroids array<array<double>>, books array<array<double>>",
    )
    model.write.mode("overwrite").parquet(f"{path}/model")


def load_ivfpq_model(spark, path: str) -> tuple[np.ndarray, np.ndarray]:
    """Load the (centroids, books) pair persisted by
    :func:`build_ivfpq_index` — the ONE loader every consumer of the
    on-disk model goes through (index search, batch append, streaming
    ingest), so a model-schema change has a single home (review r15).
    Gated on the parquet ``_SUCCESS`` marker, not bare existence: a
    crash mid model-write must surface as this clear refusal, not an
    opaque schema-inference error (the advice-r14 meta discipline)."""
    from ..streaming.state import meta_committed

    if not meta_committed(spark, f"{path}/model"):
        raise ValueError(
            f"no persisted IVF-PQ model under {path} — build the index "
            "first (build_ivfpq_index); a model directory without its "
            "_SUCCESS marker is a crashed half-write and is refused too"
        )
    row = spark.read.parquet(f"{path}/model").first()
    centroids = np.array(row["centroids"])
    books = np.array(row["books"]).reshape(
        row["m"], row["ks"], row["dim"] // row["m"]
    )
    return centroids, books


def ivfpq_model_fingerprint(centroids: np.ndarray, books: np.ndarray) -> str:
    """Content fingerprint of a trained model — what stream shards bind
    to, so vectors encoded under an OLD model can never be silently
    searched under a NEW one (cluster ids and codes are meaningless
    across models; review r15)."""
    import hashlib

    h = hashlib.sha256()
    for a in (centroids, books):
        a = np.ascontiguousarray(a, dtype="float64")
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def append_to_ivfpq_index(
    new_corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dropped_acc=None,
) -> None:
    """Ingest a NEW corpus shard into an existing
    :func:`build_ivfpq_index` layout — the nightly-delta pattern the
    build-once/query-many story needs to be complete: a production
    corpus grows daily, and re-training + re-encoding 100 TB for each
    delta is exactly the job this avoids.

    The persisted model (coarse centroids + residual codebooks) is
    FROZEN: new vectors are assigned and residual-encoded with it in
    one Arrow stage and their (neighbor_id, codes) rows are APPENDED
    into the cluster-partitioned index — existing partitions' files are
    never rewritten, and searches see the union immediately (partition
    pruning over probed lists is unchanged; appends only add files
    inside existing ``cluster=N`` directories, or new ones if a list
    was previously empty).

    Exactness contract (pinned in tests/test_llm_ops.py): indexing is a
    pure per-vector function of the model, so the appended index is
    BIT-IDENTICAL to indexing old+new in one pass under the same model
    — search results match a monolithic rebuild whose training sample
    is unchanged. What appending does NOT do is refresh the model: if
    the new shard's distribution drifts from the training sample, its
    residuals quantize with more error (ADC shortlist quality degrades
    gracefully; the exact cosine rerank keeps returned similarities
    true). Re-train via :func:`build_ivfpq_index` when drift matters.
    Id uniqueness across shards is the caller's contract — append is
    blind to duplicates, exactly like the underlying parquet append."""
    spark = new_corpus.sparkSession
    centroids, books = load_ivfpq_model(spark, path)
    _, c_indexed = _ivfpq_index(
        new_corpus, id_col, vec_col, centroids, books, dropped_acc
    )
    c_indexed.write.mode("append").partitionBy("cluster").parquet(
        f"{path}/index"
    )


def knn_ivf_pq_from_index(
    queries: DataFrame,
    corpus: DataFrame,
    path: str,
    k: int = 5,
    n_probe: int = 4,
    rerank_k: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dropped_acc=None,
    extra_index: DataFrame | None = None,
) -> DataFrame:
    """Search a :func:`build_ivfpq_index` index: same output contract as
    :func:`knn_ivf_pq` ((query_id, neighbor_id, sim, rank), exact rounded
    cosine on the reranked survivors), but the corpus is NEVER re-encoded
    — the index scan reads ONLY the partition directories of lists some
    query probes (one bounded driver collect of probed cluster ids turns
    into an ``isin`` partition filter), and ``corpus`` supplies raw
    vectors solely for the broadcast-shortlist rerank scan.

    ``extra_index``: additional (neighbor_id, cluster, codes) rows
    encoded under the SAME model — the streaming ingest's committed
    shards (``streaming.ann``) union in here, behind the same
    probed-cluster filter, so the whole probe/ADC/rerank pipeline has
    exactly one implementation (review r15). Model compatibility is the
    caller's contract for this parameter; the streaming module enforces
    it with a persisted fingerprint."""
    spark = queries.sparkSession
    centroids, books = load_ivfpq_model(spark, path)

    q_slim = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probed = sorted(
        {
            r["cluster"]
            for r in _assign_clusters(
                q_slim, "q_vec", centroids, n_probe, "cluster", dropped_acc=dropped_acc
            ).select("cluster").distinct().collect()
        }
    )
    c_indexed = spark.read.parquet(f"{path}/index").filter(
        F.col("cluster").isin(probed)
    ).select("neighbor_id", "cluster", "codes")
    if extra_index is not None:
        c_indexed = c_indexed.unionByName(
            extra_index.filter(F.col("cluster").isin(probed)).select(
                "neighbor_id", "cluster", "codes"
            )
        )
    c_slim = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    return _ivfpq_search(
        c_indexed, c_slim, queries, centroids, books,
        k=k, n_probe=n_probe, rerank_k=rerank_k,
        id_col=id_col, vec_col=vec_col, dropped_acc=dropped_acc,
    )
