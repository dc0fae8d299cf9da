"""Multi-dimensional clustering layout (z-order) for write-time data skipping.

One-dimensional sort-on-write (``repartitionByRange + sortWithinPartitions``,
see ``tests/test_sources.py::test_range_sorted_layout_tightens_rowgroup_stats``)
gives tight parquet row-group min/max stats on ONE column only; every other
filter column still spans the full domain in every row group, so footer-based
skipping does nothing for it. At 100 TB, query mixes filter on several columns
(date AND user, lang AND quality score), and re-sorting per query is not an
option — the layout must serve them all.

Z-ordering fixes this by sorting on a space-filling-curve key: each clustered
column is bucketed to a fixed-width integer, and the buckets' bits are
interleaved into one long. Rows close on the z-key are close in EVERY
clustered dimension, so each row group covers a small hyper-rectangle and its
footer stats are tight on all clustered columns at once (the same layout
discipline Delta Lake's ``OPTIMIZE ZORDER BY`` and Iceberg's sort-order
z-transform apply; Morton 1966 curve).

Scale notes (100 TB):
- The z-key is a pure native column expression (``width_bucket`` + shift/or
  chain — whole-stage codegen, no Python, no UDF), verified by
  ``tests/test_layout.py::test_zorder_plan_is_native``.
- Column stats for bucketing come from ONE map-side-combined aggregate over
  the input (2 scalars per column to the driver); pass precomputed ``stats``
  to skip even that (e.g. reuse catalog-level stats).
- The write itself is the same single range shuffle a 1-D sorted write costs:
  ``repartitionByRange(z) + sortWithinPartitions(z)``. Z-order is free at
  write time relative to any sorted layout; the win is at read time.
- Equi-width buckets (not equi-depth): no per-column quantile job, and
  range-partitioning on the z-key re-balances file sizes even when the value
  distribution is skewed (skewed values collapse into few buckets, but the
  range partitioner splits them by frequency).

Reference parity: the reference engine (Kafka Streams, 812 LoC Java) has no
table-layout surface at all — this module is part of the beyond-reference
storage-efficiency mandate, alongside bucketed writes (operators/skew.py:70)
and partitioned layouts (tests/test_sources.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def column_stats(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """(min, max) per numeric clustered column, in one aggregate pass.

    Non-numeric columns are hash-bucketed and need no stats; they are skipped
    here and absent from the returned dict.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    numeric = [c for c in cols if isinstance(_ensure(fields, c), _NUMERIC + (T.DateType, T.TimestampType))]
    if not numeric:
        return {}
    aggs = []
    for c in numeric:
        v = _as_double(F.col(c), fields[c])
        aggs += [F.min(v).alias(f"__lo_{c}"), F.max(v).alias(f"__hi_{c}")]
    row = df.agg(*aggs).first()
    return {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in numeric}


def _ensure(fields: dict[str, T.DataType], c: str) -> T.DataType:
    if c not in fields:
        raise ValueError(f"zorder column {c!r} not in schema: {sorted(fields)}")
    return fields[c]


def _as_double(col: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, T.DateType):
        return col.cast("timestamp").cast("double")
    if isinstance(dtype, T.TimestampType):
        return col.cast("double")
    return col.cast("double")


def _bucket(col: Column, dtype: T.DataType, stats: tuple[float, float] | None, bits: int) -> Column:
    """Fixed-width bucket id in [0, 2**bits) as a native expression.

    Numeric: equi-width ``width_bucket`` over the [min, max] stats range
    (clamped; nulls and NaNs to bucket 0). Other types: ``xxhash64`` masked to
    ``bits`` — equal values still co-cluster, ranges do not (documented).
    """
    n = 1 << bits
    if isinstance(dtype, _NUMERIC + (T.DateType, T.TimestampType)):
        if stats is None:
            raise ValueError("numeric zorder column requires (min, max) stats")
        lo, hi = stats
        if lo is None or hi is None or float(lo) == float(hi):
            return F.lit(0).cast("long")
        v = _as_double(col, dtype)
        wb = F.width_bucket(v, F.lit(float(lo)), F.lit(float(hi)), F.lit(n)) - F.lit(1)
        clamped = F.least(F.greatest(wb, F.lit(0)), F.lit(n - 1))
        return F.coalesce(clamped, F.lit(0)).cast("long")
    return F.coalesce(
        F.xxhash64(col).bitwiseAND(F.lit(n - 1)), F.lit(0)
    ).cast("long")


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    stats: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """Morton (z-order) key over ``cols``: per-column ``bits``-wide buckets,
    bit-interleaved into one non-negative long.

    Bit ``b`` of column ``i``'s bucket lands at position ``b*len(cols) + i``,
    so the key's high bits alternate across columns — a range of z-keys is a
    hyper-rectangle touching every clustered dimension.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(f"bits*len(cols) = {bits * len(cols)} exceeds 63 (long)")
    fields = {f.name: f.dataType for f in df.schema.fields}
    if stats is None:
        stats = column_stats(df, cols)
    buckets = [_bucket(F.col(c), _ensure(fields, c), stats.get(c), bits) for c in cols]
    n = len(cols)
    parts = [
        F.shiftleft(F.shiftright(bk, b).bitwiseAND(F.lit(1)), b * n + i)
        for b in range(bits)
        for i, bk in enumerate(buckets)
    ]
    return reduce(lambda a, c: a.bitwiseOR(c), parts).alias("zkey")


def target_file_count(total_bytes: int, target_mb: int) -> int:
    """ceil(total / target) with a floor of one file — the shared sizing
    rule for both compaction verbs (here and ``snapshots.py``)."""
    if target_mb <= 0:
        raise ValueError(f"target_mb must be positive, got {target_mb}")
    return max(1, -(-int(total_bytes) // (target_mb * 1024 * 1024)))


def compact_small_files(
    spark,
    path: str,
    target_mb: int = 512,
    out_path: str | None = None,
    sort_col: str | None = None,
    fmt: str = "parquet",
) -> int:
    """Rewrite a fragmented dataset into ~``target_mb``-sized files.

    Small-files pathology is the dominant operational failure of long-running
    100 TB ingest: streaming sinks and per-partition appends leave thousands
    of KB-scale files per directory, and every downstream scan then pays a
    task per file (driver scheduling pressure, no vectorized-read
    amortization, metadata-bound listing). Compaction is the fix Delta's
    ``OPTIMIZE`` / Iceberg's ``rewrite_data_files`` apply on a schedule.

    File count is computed from the dataset's actual on-disk bytes (Hadoop
    FileSystem listing — no data read), then one shuffle rewrites:
    round-robin ``repartition(n)`` for pure compaction, or
    ``repartitionByRange(n, sort_col) + sortWithinPartitions`` to restore
    1-D clustering in the same pass (combine with :func:`write_zordered` for
    multi-dim layouts). Returns the target file count.

    Writes to ``out_path`` (default ``path + "_compacted"``): an
    atomic-rename swap is the caller's/table-format's job — overwriting the
    input in place while readers stream it is not safe on plain directories.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    total = fs.getContentSummary(jpath).getLength()
    n = target_file_count(int(total), target_mb)

    df = spark.read.format(fmt).load(path)
    if sort_col is not None:
        out = df.repartitionByRange(n, sort_col).sortWithinPartitions(sort_col)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").format(fmt).save(out_path or f"{path}_compacted")
    return n


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    stats: dict[str, tuple[float, float]] | None = None,
) -> None:
    """Write ``df`` clustered on the z-order of ``cols``.

    One range shuffle on the z-key (sampled equi-frequency boundaries →
    balanced file sizes even under value skew), sorted within partitions so
    parquet row groups inside each file stay tight too. The helper column is
    dropped before the write; the output schema equals ``df.schema``.
    """
    z = zorder_key(df, cols, bits=bits, stats=stats)
    out = df.withColumn("__zkey", z)
    n = num_files or out.sparkSession.conf.get("spark.sql.shuffle.partitions")
    out = (
        out.repartitionByRange(int(n), "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
    out.write.mode(mode).format(fmt).save(path)
