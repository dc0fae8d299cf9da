"""Versioned corpus snapshots (operators/snapshots.py): append reuse,
time travel, rollback, vacuum, crash-orphan handling."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.snapshots import (
    snapshot_compact,
    snapshot_read,
    snapshot_rollback,
    snapshot_vacuum,
    snapshot_versions,
    snapshot_write,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("doc_id"))


def test_append_overwrite_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = snapshot_write(spark, _df(spark, 0, 10), t)
    v2 = snapshot_write(spark, _df(spark, 10, 15), t)            # append
    v3 = snapshot_write(spark, _df(spark, 100, 103), t, mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)
    assert snapshot_read(spark, t, 1).count() == 10
    assert snapshot_read(spark, t, 2).count() == 15
    assert sorted(r.doc_id for r in snapshot_read(spark, t, 3).collect()) == [100, 101, 102]
    assert snapshot_read(spark, t).count() == 3  # latest = v3
    # append reuses parent bytes: v2 has 2 dirs, one is v1's
    meta = {r.version: r for r in snapshot_versions(spark, t).collect()}
    assert meta[2].n_dirs == 2 and meta[2].n_rows == 15
    assert meta[3].n_dirs == 1 and meta[3].is_latest
    assert not meta[1].is_latest


def test_naive_parquet_read_sees_only_data(spark, tmp_path):
    """Metadata lives in underscore paths Spark ignores; a naive read of
    data/ never double-counts a row across versions' dirs? No — dirs
    accumulate; the point is metadata INVISIBILITY, not dedup."""
    t = str(tmp_path / "tbl")
    snapshot_write(spark, _df(spark, 0, 5), t)
    # _versions and _latest don't break a direct read of one data dir
    assert spark.read.parquet(f"{t}/data/v00001").count() == 5


def test_rollback_and_next_write_branches(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snapshot_write(spark, _df(spark, 0, 10), t)
    snapshot_write(spark, _df(spark, 10, 20), t)
    snapshot_rollback(spark, t, 1)
    assert snapshot_read(spark, t).count() == 10      # latest is v1 again
    assert snapshot_read(spark, t, 2).count() == 20   # v2 still readable
    with pytest.raises(ValueError, match="does not exist"):
        snapshot_rollback(spark, t, 5)
    # re-promoting a version past the current pointer is a roll-FORWARD,
    # which the rollback verb refuses (write a new version instead)
    with pytest.raises(ValueError, match="roll forward"):
        snapshot_rollback(spark, t, 2)
    # a write after rollback claims the next FREE number (3), appending
    # onto the rolled-back latest (v1), not onto orphaned v2
    v = snapshot_write(spark, _df(spark, 50, 52), t)
    assert v == 3
    assert sorted(r.doc_id for r in snapshot_read(spark, t).collect()) == [
        *range(10), 50, 51,
    ]


def test_missing_version_and_empty_table_errors(spark, tmp_path):
    t = str(tmp_path / "tbl")
    with pytest.raises(ValueError, match="no committed"):
        snapshot_read(spark, t)
    snapshot_write(spark, _df(spark, 0, 3), t)
    with pytest.raises(ValueError, match="does not exist"):
        snapshot_read(spark, t, 7)
    with pytest.raises(ValueError, match="mode"):
        snapshot_write(spark, _df(spark, 0, 3), t, mode="upsert")


def test_crash_orphan_is_invisible_and_not_resurrected(spark, tmp_path):
    """Simulate a crash after manifest write but before the pointer
    swap: the orphan version is unreadable by default, excluded from
    snapshot_versions, and the next write skips its number."""
    import json

    t = str(tmp_path / "tbl")
    snapshot_write(spark, _df(spark, 0, 5), t)
    # forge the orphan: data dir + manifest for v2, NO pointer update
    _df(spark, 90, 95).write.parquet(f"{t}/data/v00002")
    os.makedirs(f"{t}/_versions", exist_ok=True)
    with open(f"{t}/_versions/v00002.json", "w") as f:
        json.dump(
            {"version": 2, "op": "append",
             "dirs": ["data/v00001", "data/v00002"],
             "n_rows": 10, "committed_at": 0.0},
            f,
        )
    assert snapshot_read(spark, t).count() == 5          # latest is still v1
    assert snapshot_versions(spark, t).count() == 1      # orphan excluded
    v = snapshot_write(spark, _df(spark, 5, 8), t)       # skips the orphan's number
    assert v == 3
    assert snapshot_read(spark, t).count() == 8          # orphan rows never join


def test_vacuum_keeps_referenced_dirs(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snapshot_write(spark, _df(spark, 0, 10), t)               # v1
    snapshot_write(spark, _df(spark, 10, 20), t)              # v2 = v1 dir + new
    snapshot_write(spark, _df(spark, 20, 30), t)              # v3 = v1+v2+new
    removed = snapshot_vacuum(spark, t, keep_last=2)
    assert removed == 1                                       # v1 manifest dropped
    # v1's DATA dir survives: v2/v3 reference it
    assert snapshot_read(spark, t, 3).count() == 30
    assert snapshot_read(spark, t, 2).count() == 20
    with pytest.raises(ValueError, match="does not exist"):
        snapshot_read(spark, t, 1)
    # overwrite then vacuum to 1: old dirs now unreferenced -> gone
    snapshot_write(spark, _df(spark, 0, 4), t, mode="overwrite")  # v4
    assert snapshot_vacuum(spark, t, keep_last=1) == 2            # v2, v3
    assert snapshot_read(spark, t).count() == 4
    assert not os.path.exists(f"{t}/data/v00001")


def test_crash_on_first_commit_does_not_wedge_appends(spark, tmp_path):
    """Orphan v1 manifest with _latest still absent: the next append
    must start a fresh lineage at v2, not look up version 0 (review
    r7)."""
    import json

    t = str(tmp_path / "tbl")
    _df(spark, 90, 95).write.parquet(f"{t}/data/v00001")
    os.makedirs(f"{t}/_versions", exist_ok=True)
    with open(f"{t}/_versions/v00001.json", "w") as f:
        json.dump({"version": 1, "op": "append", "dirs": ["data/v00001"],
                   "n_rows": 5, "committed_at": 0.0}, f)
    v = snapshot_write(spark, _df(spark, 0, 3), t)  # mode defaults to append
    assert v == 2
    assert snapshot_read(spark, t).count() == 3  # orphan rows never join


def test_versions_listing_survives_vacuum(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snapshot_write(spark, _df(spark, 0, 10), t)
    snapshot_write(spark, _df(spark, 10, 20), t)
    snapshot_write(spark, _df(spark, 20, 30), t)
    snapshot_vacuum(spark, t, keep_last=1)
    rows = snapshot_versions(spark, t).collect()
    assert [r.version for r in rows] == [3]  # vacuumed v1/v2 skipped, no raise
    assert rows[0].is_latest


def test_snapshot_compact_collapses_dirs_and_keeps_rows(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for lo in range(0, 50, 10):                      # 5 appends -> 5 dirs
        snapshot_write(spark, _df(spark, lo, lo + 10), t)
    assert snapshot_versions(spark, t).filter("is_latest").collect()[0].n_dirs == 5
    v = snapshot_compact(spark, t)
    assert v == 6
    meta = {r.version: r for r in snapshot_versions(spark, t).collect()}
    assert meta[6].n_dirs == 1 and meta[6].op == "overwrite" and meta[6].is_latest
    assert sorted(r.doc_id for r in snapshot_read(spark, t).collect()) == list(range(50))
    # pre-compaction history still readable
    assert snapshot_read(spark, t, 5).count() == 50
    with pytest.raises(ValueError, match="no committed"):
        snapshot_compact(spark, str(tmp_path / "empty"))
    with pytest.raises(ValueError, match="target_mb"):
        snapshot_compact(spark, t, target_mb=0)


def test_parquet_footer_count_matches_scan(spark, tmp_path):
    """The r8 footer-metadata audit count must equal a full scan count,
    including through partition directories; missing path counts 0."""
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.operators.merge import parquet_footer_count

    df = spark.range(0, 1234).withColumn("p", F.col("id") % 3)
    out = str(tmp_path / "part")
    df.write.partitionBy("p").parquet(out)
    assert parquet_footer_count(spark, out) == 1234
    assert parquet_footer_count(spark, str(tmp_path / "absent")) == 0
    flat = str(tmp_path / "flat")
    spark.range(0, 77).write.parquet(flat)
    assert parquet_footer_count(spark, flat) == 77


def test_snapshot_diff_added_removed_updated(spark, tmp_path):
    """r8 snapshot_diff: version-to-version governance diff — keys only
    in 'to' are added, only in 'from' removed, changed payload or
    multiplicity updated, unchanged rows absent; shuffle carries
    (key, hash) only."""
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.operators.snapshots import (
        snapshot_diff,
        snapshot_write,
    )

    path = str(tmp_path / "tbl")
    v1_df = spark.range(0, 10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )
    v1 = snapshot_write(spark, v1_df, path, mode="overwrite")
    v2_df = (
        spark.range(2, 12)  # 0,1 removed; 10,11 added
        .select(
            F.col("id").alias("doc_id"),
            # doc 5 gets new text -> updated
            F.when(F.col("id") == 5, F.lit("CHANGED"))
            .otherwise(F.concat(F.lit("text-"), F.col("id")))
            .alias("text"),
        )
        # doc 7 duplicated -> multiplicity change -> updated
        .unionByName(
            spark.range(7, 8).select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("text-"), F.col("id")).alias("text"),
            )
        )
    )
    v2 = snapshot_write(spark, v2_df, path, mode="overwrite")
    diff = snapshot_diff(spark, path, v1, v2, ["doc_id"])
    got = {(r.doc_id, r.change) for r in diff.collect()}
    assert got == {
        (0, "removed"), (1, "removed"),
        (10, "added"), (11, "added"),
        (5, "updated"), (7, "updated"),
    }
    # append version pair: pure adds
    v3_df = spark.range(100, 103).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )
    v3 = snapshot_write(spark, v3_df, path, mode="append")
    d23 = snapshot_diff(spark, path, v2, v3, ["doc_id"]).collect()
    assert {r.change for r in d23} == {"added"}
    assert {r.doc_id for r in d23} == {100, 101, 102}
    # plan: payload never shuffles — the join inputs are (key, count, hash)
    plan = snapshot_diff(spark, path, v1, v2, ["doc_id"])._jdf.queryExecution().executedPlan().toString()
    import re
    for ex in re.findall(r"Exchange hashpartitioning[^\n]*", plan):
        assert "text" not in ex


def test_snapshot_diff_requires_keys(spark, tmp_path):
    import pytest

    from kafka_streams_task_spark.operators.snapshots import snapshot_diff

    with pytest.raises(ValueError, match="key_cols"):
        snapshot_diff(spark, str(tmp_path), 1, 2, [])


def test_snapshot_diff_null_keys_match_null_safely(spark, tmp_path):
    """NULL keys must match themselves across versions (eqNullSafe),
    not surface as a spurious added+removed pair."""
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.operators.snapshots import (
        snapshot_diff,
        snapshot_write,
    )

    path = str(tmp_path / "tbl")
    mk = lambda text: spark.createDataFrame(
        [(None, text), (1, "one")], "doc_id bigint, text string"
    )
    v1 = snapshot_write(spark, mk("null-doc"), path, mode="overwrite")
    v2 = snapshot_write(spark, mk("null-doc"), path, mode="overwrite")
    assert snapshot_diff(spark, path, v1, v2, ["doc_id"]).count() == 0
    v3 = snapshot_write(spark, mk("null-doc CHANGED"), path, mode="overwrite")
    d = snapshot_diff(spark, path, v2, v3, ["doc_id"]).collect()
    assert len(d) == 1 and d[0].change == "updated" and d[0].doc_id is None


def test_snapshot_write_expectation_gate(spark, tmp_path):
    """r8 quality-gated commits: violations on the STAGED bytes refuse
    the commit (no manifest, no pointer move, dir reclaimed); clean
    data commits; the version number is reusable after a refusal."""
    import pytest
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.operators.snapshots import (
        snapshot_read,
        snapshot_versions,
        snapshot_write,
    )

    path = str(tmp_path / "tbl")
    good = spark.range(0, 10).select(
        F.col("id").alias("doc_id"), F.lit(100).alias("n_chars")
    )
    v1 = snapshot_write(
        spark, good, path,
        expectations={"chars_positive": "n_chars > 0"},
        unique_keys={"pk": ["doc_id"]},
    )
    assert v1 == 1

    bad = spark.range(0, 4).select(
        F.col("id").alias("doc_id"), (F.lit(50) - F.col("id") * 30).alias("n_chars")
    )  # two rows violate n_chars > 0
    with pytest.raises(ValueError, match="chars_positive"):
        snapshot_write(spark, bad, path,
                       expectations={"chars_positive": "n_chars > 0"})
    # readers still see v1; no orphan manifest; number reusable
    assert snapshot_read(spark, path).count() == 10
    assert snapshot_versions(spark, path).count() == 1
    v2 = snapshot_write(spark, good, path,
                        expectations={"chars_positive": "n_chars > 0"})
    assert v2 == 2 and snapshot_read(spark, path, 2).count() == 20

    # duplicate-key violation also refuses
    dup = good.unionByName(good.limit(1))
    with pytest.raises(ValueError, match="pk"):
        snapshot_write(spark, dup, path, unique_keys={"pk": ["doc_id"]})


def test_snapshot_diff_across_compaction_is_empty(spark, tmp_path):
    """Compaction rewrites files but not content — the governance diff
    across a compaction version must be EMPTY (physical layout changes
    are invisible to the content identity)."""
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.operators.snapshots import (
        snapshot_compact,
        snapshot_diff,
        snapshot_write,
    )

    path = str(tmp_path / "tbl")
    df = spark.range(0, 200, 1, 8).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
    )
    v1 = snapshot_write(spark, df, path)
    v2 = snapshot_compact(spark, path, target_mb=512)
    assert v2 == v1 + 1
    assert snapshot_diff(spark, path, v1, v2, ["doc_id"]).count() == 0


def test_snapshot_diff_null_vs_sentinel_and_cancellation(spark, tmp_path):
    """r9 (ADVICE r8): the row fingerprint hashes NULL-ness separately,
    so NULL vs a look-alike literal is a detected 'updated'; and the
    duplicate-key combine re-hashes before summing, so a swap of two
    payloads between duplicate rows of one key still nets out equal
    (order independence) while genuine changes never cancel."""
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.operators.snapshots import (
        snapshot_diff,
        snapshot_write,
    )

    path = str(tmp_path / "tbl")
    # NULL -> '\x00' literal (the old sentinel) must be 'updated'
    v1 = snapshot_write(
        spark,
        spark.createDataFrame([(1, None)], "doc_id bigint, text string"),
        path, mode="overwrite",
    )
    v2 = snapshot_write(
        spark,
        spark.createDataFrame([(1, "\x00")], "doc_id bigint, text string"),
        path, mode="overwrite",
    )
    d = snapshot_diff(spark, path, v1, v2, ["doc_id"]).collect()
    assert len(d) == 1 and d[0].change == "updated"
    # duplicate-key group: same multiset of payloads in either order is
    # unchanged; replacing ONE payload is updated
    mk = lambda rows: spark.createDataFrame(rows, "doc_id bigint, text string")
    v3 = snapshot_write(spark, mk([(7, "a"), (7, "b")]), path, mode="overwrite")
    v4 = snapshot_write(spark, mk([(7, "b"), (7, "a")]), path, mode="overwrite")
    assert snapshot_diff(spark, path, v3, v4, ["doc_id"]).count() == 0
    v5 = snapshot_write(spark, mk([(7, "b"), (7, "c")]), path, mode="overwrite")
    d45 = snapshot_diff(spark, path, v4, v5, ["doc_id"]).collect()
    assert len(d45) == 1 and d45[0].change == "updated"


def test_snapshot_write_append_uniqueness_is_table_level(spark, tmp_path):
    """r9 (ADVICE r8): in append mode a uniqueness rule evaluates over
    the would-be FULL version — a staged increment that is internally
    unique but re-inserts committed keys is refused; disjoint keys
    commit; overwrite mode stays staged-only."""
    import pytest
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.operators.snapshots import (
        snapshot_read,
        snapshot_versions,
        snapshot_write,
    )

    path = str(tmp_path / "tbl")
    base = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    v1 = snapshot_write(spark, base, path, unique_keys={"pk": ["doc_id"]})
    assert v1 == 1
    # internally-unique increment that collides with v1's keys: refused
    overlap = spark.range(5, 15).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="pk"):
        snapshot_write(spark, overlap, path, unique_keys={"pk": ["doc_id"]})
    assert snapshot_versions(spark, path).count() == 1
    # disjoint increment commits
    fresh = spark.range(10, 15).select(F.col("id").alias("doc_id"))
    v2 = snapshot_write(spark, fresh, path, unique_keys={"pk": ["doc_id"]})
    assert v2 == 2 and snapshot_read(spark, path, v2).count() == 15
    # overwrite ignores the parent: same keys as v1 are fine
    v3 = snapshot_write(
        spark, base, path, mode="overwrite", unique_keys={"pk": ["doc_id"]}
    )
    assert v3 == 3 and snapshot_read(spark, path, v3).count() == 10


def test_append_uniqueness_does_not_wedge_on_parent_internal_dups(
    spark, tmp_path
):
    """r9 review: duplicates already INSIDE the parent (committed via
    an ungated path) must not refuse every later disjoint gated append
    forever — the gate checks the increment's own integrity (internal
    dups + committed-key re-inserts), not the parent's old sins. NULL
    keys still match null-safely across versions."""
    import pytest
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.operators.snapshots import (
        snapshot_read,
        snapshot_write,
    )

    path = str(tmp_path / "tbl")
    dirty = spark.createDataFrame(
        [(1, "a"), (1, "a2"), (None, "n")], "doc_id bigint, text string"
    )
    snapshot_write(spark, dirty, path)  # ungated commit with dup key 1
    # disjoint gated append: commits despite the parent's internal dup
    fresh = spark.createDataFrame([(5, "e")], "doc_id bigint, text string")
    v2 = snapshot_write(spark, fresh, path, unique_keys={"pk": ["doc_id"]})
    assert snapshot_read(spark, path, v2).count() == 4
    # re-inserting a committed key is still refused, with the re-insert
    # surfaced by name
    clash = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="re-insert"):
        snapshot_write(spark, clash, path, unique_keys={"pk": ["doc_id"]})
    # NULL keys collide null-safely across versions
    nclash = spark.createDataFrame(
        [(None, "y")], "doc_id bigint, text string"
    )
    with pytest.raises(ValueError, match="re-insert"):
        snapshot_write(spark, nclash, path, unique_keys={"pk": ["doc_id"]})
