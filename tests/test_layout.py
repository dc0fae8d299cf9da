"""Z-order clustering layout: interleave math vs a python reference, native
(codegen) plan shape, and footer-verified multi-dimension row-group locality
— the read-time data-skipping contract that 1-D sort-on-write can't give
(tests/test_sources.py::test_range_sorted_layout_tightens_rowgroup_stats is
the 1-D counterpart)."""

from __future__ import annotations

import math
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.layout import (
    column_stats,
    write_zordered,
    zorder_key,
)
from kafka_streams_task_spark.schemas import load_table


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="layout_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _ref_bucket(v, lo, hi, bits):
    if v is None or lo == hi:
        return 0
    n = 1 << bits
    wb = math.floor((v - lo) * n / (hi - lo))
    return min(max(wb, 0), n - 1)


def _ref_zkey(vals, los, his, bits):
    buckets = [_ref_bucket(v, lo, hi, bits) for v, lo, hi in zip(vals, los, his)]
    n = len(vals)
    z = 0
    for b in range(bits):
        for i, bk in enumerate(buckets):
            z |= ((bk >> b) & 1) << (b * n + i)
    return z


def test_zorder_key_matches_reference(spark):
    rows = [(x, y) for x in [0, 3, 7, 100, 255, 256] for y in [0.0, 0.5, 63.9, 64.0]]
    df = spark.createDataFrame(rows, ["x", "y"])
    stats = {"x": (0.0, 256.0), "y": (0.0, 64.0)}
    got = {
        (r["x"], r["y"]): r["zkey"]
        for r in df.select("x", "y", zorder_key(df, ["x", "y"], bits=4, stats=stats)).collect()
    }
    for x, y in rows:
        want = _ref_zkey([x, y], [0.0, 0.0], [256.0, 64.0], 4)
        assert got[(x, y)] == want, (x, y)


def test_zorder_nulls_strings_and_degenerate_stats(spark):
    df = spark.createDataFrame(
        [(1, "en", 5.0), (None, None, 5.0), (3, "de", 5.0)], ["k", "lang", "const"]
    )
    out = df.select(zorder_key(df, ["k", "lang", "const"], bits=4)).collect()
    keys = [r["zkey"] for r in out]
    assert all(k is not None and k >= 0 for k in keys)
    # constant column contributes bucket 0 everywhere; string column buckets by
    # hash (deterministic across calls)
    again = [r["zkey"] for r in df.select(zorder_key(df, ["k", "lang", "const"], bits=4)).collect()]
    assert keys == again


def test_zorder_plan_is_native(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = events.select(zorder_key(events, ["user_id", "value"], bits=8))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zorder_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    with pytest.raises(ValueError):
        zorder_key(df, [])
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b"], bits=32)
    with pytest.raises(ValueError):
        zorder_key(df, ["nope"])


def test_zorder_layout_tightens_both_dims(spark, sf_dir, tmpdir):
    """Footer stats (DuckDB parquet_metadata): z-ordered files are tight on
    BOTH clustered columns; the 1-D sorted layout is tight on its sort column
    only and spans ~the full domain on the other."""
    import duckdb

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    write_zordered(events, f"{tmpdir}/zorder", ["user_id", "value"], bits=8, num_files=16)
    events.repartitionByRange(16, "user_id").sortWithinPartitions(
        "user_id"
    ).write.mode("overwrite").parquet(f"{tmpdir}/sorted1d")

    con = duckdb.connect()

    def avg_span(path: str, col: str) -> float:
        return con.sql(
            f"""
            SELECT avg(CAST(stats_max AS DOUBLE) - CAST(stats_min AS DOUBLE))
            FROM parquet_metadata('{path}/*.parquet')
            WHERE path_in_schema = '{col}'
            """
        ).fetchone()[0]

    domains = {}
    for col in ("user_id", "value"):
        lo, hi = events.agg(F.min(col), F.max(col)).first()
        domains[col] = float(hi) - float(lo)

    # z-order: every clustered dim tight (16 files over 2 dims ~ domain/4 per
    # dim in the uniform case; assert the conservative half-domain bound)
    assert avg_span(f"{tmpdir}/zorder", "user_id") < 0.5 * domains["user_id"]
    assert avg_span(f"{tmpdir}/zorder", "value") < 0.3 * domains["value"]
    # 1-D sort: tight on the sort column, blind on the other — the z-ordered
    # layout must beat it decisively (>=2x) on the non-sort dimension
    assert avg_span(f"{tmpdir}/sorted1d", "user_id") < 0.25 * domains["user_id"]
    assert avg_span(f"{tmpdir}/sorted1d", "value") > 2 * avg_span(f"{tmpdir}/zorder", "value")

    # layout preserves content and schema
    back = spark.read.parquet(f"{tmpdir}/zorder")
    assert back.schema == events.schema
    assert back.count() == events.count()


def test_compact_small_files(spark, sf_dir, tmpdir):
    """A fragmented write (many tiny files) compacts to the byte-budgeted
    file count; rows and schema survive; sort_col variant restores clustered
    footer stats in the same pass."""
    import glob

    from kafka_streams_task_spark.operators.layout import compact_small_files

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    events.repartition(64).write.mode("overwrite").parquet(f"{tmpdir}/frag")
    n_frag = len(glob.glob(f"{tmpdir}/frag/*.parquet"))
    assert n_frag == 64

    n = compact_small_files(spark, f"{tmpdir}/frag", target_mb=512, out_path=f"{tmpdir}/one")
    assert n == 1  # sf0.001 events << 512 MB
    assert len(glob.glob(f"{tmpdir}/one/*.parquet")) == 1
    back = spark.read.parquet(f"{tmpdir}/one")
    assert back.count() == events.count()
    assert set(back.columns) == set(events.columns)

    # sorted compaction: the rewrite restores 1-D locality too
    compact_small_files(
        spark, f"{tmpdir}/frag", target_mb=1, out_path=f"{tmpdir}/sorted", sort_col="user_id"
    )
    srt = spark.read.parquet(f"{tmpdir}/sorted")
    assert srt.count() == events.count()


def test_column_stats_single_pass(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    st = column_stats(events, ["user_id", "value", "event_type"])
    assert set(st) == {"user_id", "value"}  # strings hash-bucket, no stats
    lo, hi = st["user_id"]
    assert lo <= hi
