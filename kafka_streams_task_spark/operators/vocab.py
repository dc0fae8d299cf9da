"""Distributed vocabulary construction and document encoding.

The step between text analysis and sequence packing in a training-data
pipeline: build a corpus-wide token vocabulary with dense frequency-ranked
ids (embedding-table indexing needs ids 0..V-1 with no holes), then encode
documents to ``array<long>`` id sequences.

Scale shape:

  build_vocab — the corpus collapses to one (token, count) row per distinct
      token via partial+final aggregation; the DENSE GLOBAL RANK is the part
      Spark has no built-in scalable form for (``row_number`` over an
      unpartitioned window funnels everything through one task). Instead:
      range-partition the vocab by (count desc, token asc), sort within
      partitions, then assign ids as partition-offset + local index — the
      classic two-job zipWithIndex shape, expressed DataFrame-native with
      ``mapInPandas`` + TaskContext. Only P partition sizes reach the
      driver.

  encode_documents — tokens join the vocab on a composite 128-bit token
      hash so token TEXT never shuffles (two seeded xxhash64 draws; see the
      collision-budget note in the docstring); per-document id order is restored
      with the posexplode / array_sort(struct(pos, id)) idiom, not a
      window.

Reference parity: absent from the reference engine — beyond-reference
training-data mandate (same family as operators/sampling.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import tokens


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    num_partitions: int | None = None,
    validate: bool = False,
) -> DataFrame:
    """Corpus vocabulary as (token, count, token_id), ``token_id`` dense in
    0..V-1 ordered by (count desc, token asc) — deterministic, ties broken
    lexicographically, stable under input repartitioning.

    Two jobs over the AGGREGATED vocab (persisted): one to learn the P
    per-partition sizes (P rows to the driver), one to stamp ids as
    partition offset + local index. The corpus itself is touched once, by
    the frequency aggregation.

    Lifetime note: the intermediate ranked vocab stays persisted for the
    lifetime of the returned plan (one (token, count) row per distinct
    token — small next to the corpus). Callers building vocabularies for
    many corpora in one session should materialize the result and then
    ``spark.catalog.clearCache()`` (or keep their own ``.persist()`` handle
    on the result); ids remain correct either way — see the invariant
    comment below.

    ``validate=True`` runs one extra aggregation over the stamped vocab and
    raises if ids are not exactly dense 0..V-1 — a cheap post-hoc guard on
    the partition-layout invariant (which rests on Spark's deterministic
    range-sampler recompute behavior, an implementation detail a future
    Spark could change silently). Use in debug/CI paths; the invariant is
    also pinned by ``test_build_vocab_ids_survive_cache_eviction``.
    """
    freq = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if min_count > 1:
        freq = freq.filter(F.col("count") >= min_count)
    p = num_partitions or freq.sparkSession.sparkContext.defaultParallelism
    # LOAD-BEARING INVARIANT: the sizes-collect job below and the final
    # mapInPandas job must observe the SAME repartitionByRange partition
    # boundaries, or ids would be stamped against stale offsets. Two things
    # guarantee it: (1) the persist pins the post-shuffle layout for both
    # jobs while cached; (2) if cached blocks are evicted (or a caller
    # clears the cache), recompute draws the range-sampler from the same
    # deterministic per-RDD seed, reproducing identical boundaries —
    # pinned by test_vocab.py::test_build_vocab_ids_survive_cache_eviction.
    ranked = (
        freq.repartitionByRange(p, F.desc("count"), F.asc("token"))
        .sortWithinPartitions(F.desc("count"), F.asc("token"))
        .persist()
    )
    sizes = {
        r["pid"]: r["n"]
        for r in ranked.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(max(sizes) + 1 if sizes else 0):
        offsets[pid] = acc
        acc += sizes.get(pid, 0)

    schema = T.StructType(
        [
            T.StructField("token", T.StringType()),
            T.StructField("count", T.LongType()),
            T.StructField("token_id", T.LongType()),
        ]
    )

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        base = offsets.get(TaskContext.get().partitionId(), 0)
        seen = 0
        for pdf in it:
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "token": pdf["token"].values,
                    "count": pdf["count"].astype("int64").values,
                    "token_id": pd.RangeIndex(base + seen, base + seen + n).astype("int64"),
                }
            )
            seen += n

    out = ranked.mapInPandas(assign, schema)
    if validate:
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("token_id").alias("lo"),
            F.max("token_id").alias("hi"),
            F.count_distinct("token_id").alias("nd"),
        ).collect()[0]
        if row["n"] and not (row["lo"] == 0 and row["hi"] == row["n"] - 1 and row["nd"] == row["n"]):
            raise AssertionError(
                f"build_vocab ids not dense 0..V-1: n={row['n']} min={row['lo']} "
                f"max={row['hi']} distinct={row['nd']} — partition-layout invariant violated"
            )
    return out


def encode_documents(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    unk_id: int = -1,
) -> DataFrame:
    """Encode documents to (id, n_tokens, token_ids: array<long>) under a
    :func:`build_vocab` vocabulary; out-of-vocabulary tokens map to
    ``unk_id``.

    The join carries a composite 128-bit token hash on both sides — two
    differently-seeded ``xxhash64`` draws, same scheme as
    ``dedup._line_membership_hashes`` — so only 16-byte keys (plus ids)
    shuffle, never document or vocabulary text. 128 bits rather than 64
    because a collision here is not merely a wrong id: two VOCAB tokens
    sharing one hash would both match every occurrence and DUPLICATE join
    rows, inflating ``n_tokens``. Web-scale vocabularies reach 1e8–1e9
    distinct types, where 64-bit birthday collisions are expected; at 128
    bits a 1e9-type vocabulary expects ~1.5e-21 colliding pairs. Token
    order is restored by sorting (pos, id) structs inside the aggregated
    array (``array_sort`` on the leading struct field), not with a window.
    """
    from .dedup import _line_membership_hashes

    def _th(c):
        h = _line_membership_hashes(c)
        return [h[0].alias("th"), h[1].alias("th2")]

    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
    ).select(id_col, "pos", *_th(F.col("token")))
    vocab_slim = vocab.select(*_th(F.col("token")), "token_id")
    joined = toks.join(vocab_slim, ["th", "th2"], "left")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "token_id"))),
            lambda s: F.coalesce(s["token_id"], F.lit(unk_id)),
        ).alias("token_ids"),
    )
