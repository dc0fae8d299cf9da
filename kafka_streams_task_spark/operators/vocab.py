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
    """:func:`build_vocab_with_cleanup` without the release handle — for
    callers that build one vocabulary and let the session end (the driver
    catalog). Long-lived sessions building many vocabularies should use
    the ``_with_cleanup`` variant and release each checkpoint once the
    result is materialized."""
    out, _release = build_vocab_with_cleanup(
        df, text_col, min_count, num_partitions, validate
    )
    return out


def build_vocab_with_cleanup(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    num_partitions: int | None = None,
    validate: bool = False,
):
    """Corpus vocabulary as (token, count, token_id), ``token_id`` dense in
    0..V-1 ordered by (count desc, token asc) — deterministic, ties broken
    lexicographically, stable under input repartitioning. Returns
    ``(vocab_df, release)``.

    Two jobs over the AGGREGATED vocab (locally checkpointed): one to
    learn the P per-partition sizes (P rows to the driver), one to stamp
    ids as partition offset + local index. The corpus itself is touched
    once, by the frequency aggregation.

    Lifetime: the ranked intermediate is ``localCheckpoint(eager=True)``
    (one (token, count) row per distinct token — small next to the
    corpus). Checkpointing makes the partition-layout invariant
    unconditional — both downstream jobs read the SAME materialized
    blocks, with no recompute path that could redraw range boundaries (an
    executor loss fails the job loudly instead). The checkpoint blocks
    are NOT registered with the cache registry, but from a PySpark
    session the ContextCleaner never observes the plan becoming
    unreachable (py4j proxies hold JVM references), so ``release()`` is
    the explicit lifecycle: call it once ``vocab_df`` (and everything
    derived from it) has been materialized; afterwards re-executing the
    plan raises rather than silently recomputing with fresh boundaries.

    ``validate=True`` runs one extra aggregation over the stamped vocab
    and raises if ids are not exactly dense 0..V-1 — a cheap post-hoc
    guard for debug/CI paths; the invariant is also pinned by
    ``test_build_vocab_ids_stable_and_released``.
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
    # boundaries, or ids would be stamped against stale offsets. The eager
    # localCheckpoint guarantees it unconditionally: the layout is
    # materialized once and both jobs read those blocks — there is no
    # recompute path that could redraw the range-sampler boundaries — see
    # test_vocab.py::test_build_vocab_ids_stable_and_released.
    ranked = (
        freq.repartitionByRange(p, F.desc("count"), F.asc("token"))
        .sortWithinPartitions(F.desc("count"), F.asc("token"))
        .localCheckpoint(eager=True)
    )

    def release() -> None:
        # the checkpointed plan root is a LogicalRDD wrapping the
        # materialized internal RDD; unpersisting it frees the blocks and
        # removes the persistent-RDD registry entry
        ranked._jdf.queryExecution().analyzed().rdd().unpersist(False)
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
    return out, release


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
