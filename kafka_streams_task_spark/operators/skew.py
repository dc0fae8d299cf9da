"""Skew- and layout-aware helpers: key salting and bucketed tables.

AQE's skew-join splitting (enabled in plans/session.py) handles most skew at
runtime; these helpers cover the two cases it can't:
  * skewed AGGREGATION keys (AQE only splits skewed join partitions) —
    ``salted_agg`` does a two-level aggregate via a random salt;
  * repeated co-located joins — ``write_bucketed`` persists a table
    hash-bucketed by the join key so subsequent joins skip the shuffle
    entirely (verified by plan test: no Exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _content_salt(df: DataFrame, n_salts: int, salt_col: str | None):
    """Deterministic, layout-independent salt in 0..n_salts-1.

    ``xxhash64`` over ``salt_col`` (when the caller has a row id) or over
    every column — NOT ``F.rand(seed)``, whose per-partition streams make
    the salt assignment depend on the physical partition layout, and NOT a
    hash of the grouping key, which would map a hot key to a single salt
    and defeat the spreading. Fully identical rows do collapse onto one
    salt; pass a distinct ``salt_col`` if the input carries mass-duplicate
    rows under a hot key.
    """
    cols = [F.col(salt_col)] if salt_col else [F.col(c) for c in df.columns]
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-level aggregation with a deterministic salt on the first level.

    ``aggs`` maps output column name -> (fn, input column), fn one of
    sum/count/min/max. These are
    the re-aggregatable functions (avg = sum/count composed by the caller).
    A hot key's rows spread over ``n_salts`` first-level groups, so no
    single reducer sees the whole key. For uniform data this adds one cheap
    extra shuffle — use it when a key's share is large enough to stall a
    reducer (rule of thumb: > a few percent of rows). The salt is a content
    hash (see ``_content_salt``), so the plan is stable under input
    repartitioning — rerunning after a repartition produces identical
    first-level groups, like every other operator in the engine.
    """
    first_fns = {"sum": F.sum, "count": lambda c: F.count(F.lit(1)), "min": F.min, "max": F.max}
    second_fns = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}

    salted = df.withColumn("_salt", _content_salt(df, n_salts, salt_col))
    level1 = salted.groupBy(*keys, "_salt").agg(
        *[first_fns[fn](col).alias(out) for out, (fn, col) in aggs.items()]
    )
    return level1.groupBy(*keys).agg(
        *[second_fns[fn](out).alias(out) for out, (fn, _col) in aggs.items()]
    )


def explode_salt_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_col: str | None = None,
) -> DataFrame:
    """Salted equi-join for a skewed big side when the small side is too
    large to broadcast: big rows get a deterministic content-hash salt
    (layout-independent — see ``_content_salt``), small rows are
    replicated across all salts, and the join runs on (key, salt) —
    splitting each hot key over ``n_salts`` reducers.

    (With AQE skew-join on, prefer letting AQE handle it; this is the
    explicit fallback for engines/paths where it can't, e.g. non-shuffle
    join children or aggregations layered above the join.)
    """
    big_salted = big.withColumn("_salt", _content_salt(big, n_salts, salt_col))
    small_exploded = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_salted.join(small_exploded, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist as a hash-bucketed (optionally sorted) managed table.

    Two tables bucketed by the same key with the same bucket count join
    WITHOUT a shuffle (SortMergeJoin over pre-bucketed scans) — the batch
    analogue of Kafka Streams' co-partitioned topics (the reference relies
    on co-partitioning for every join, WeatherHotelsApp.java:134-142).
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)
