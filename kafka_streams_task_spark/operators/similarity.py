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


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_similarity(a, b) -> "F.Column":
    """Cosine similarity between two array columns, JVM-side."""
    a = _as_double(a)
    b = _as_double(b)
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


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
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH with ``n_tables``
    independent tables of ``n_planes`` sign bits. Candidates = corpus rows
    sharing any (table, bucket) with the query; exact cosine re-rank on
    candidates only.

    Recall grows with n_tables; cost per query is bounded by bucket sizes
    (expected corpus/2^n_planes per table).
    """
    tables = [random_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]

    def bucketed(df: DataFrame, ident: str) -> DataFrame:
        buckets = F.array(
            *[
                F.struct(F.lit(t).alias("tbl"), lsh_bucket(F.col(vec_col), tables[t]).alias("bkt"))
                for t in range(n_tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(ident), F.col(vec_col).alias(f"{ident}_vec"), F.explode(buckets).alias("tb")
        ).select(ident, f"{ident}_vec", "tb.tbl", "tb.bkt")

    cb = bucketed(corpus, "neighbor_id")
    qb = bucketed(queries, "query_id")
    cand = (
        cb.join(qb, on=["tbl", "bkt"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "query_id_vec", "neighbor_id_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        stable_round(cosine_similarity(F.col("query_id_vec"), F.col("neighbor_id_vec")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
