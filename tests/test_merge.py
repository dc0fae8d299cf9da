"""CDC merge / upsert (operators/merge.py): latest-wins semantics,
delete handling, tie determinism, and the partition-pruned in-place
merge including the all-rows-deleted partition edge."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.merge import (
    OP_DELETE,
    OP_UPSERT,
    apply_changes,
    latest_changes,
    merge_into_partitioned,
)


def _snapshot(spark):
    return spark.createDataFrame(
        [
            Row(k=1, part="a", v="one"),
            Row(k=2, part="a", v="two"),
            Row(k=3, part="b", v="three"),
            Row(k=4, part="b", v="four"),
        ]
    )


def _changes(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, part=p, v=v, op=op, version=ver) for k, p, v, op, ver in rows],
        schema="k bigint, part string, v string, op string, version bigint",
    )


def test_apply_changes_upsert_delete_insert(spark):
    snap = _snapshot(spark)
    changes = _changes(
        spark,
        [
            (2, "a", "TWO", OP_UPSERT, 10),      # update existing
            (3, "b", None, OP_DELETE, 10),        # delete existing
            (9, "b", "nine", OP_UPSERT, 10),      # insert new key
        ],
    )
    out = {
        r.k: (r.part, r.v)
        for r in apply_changes(snap, changes, ["k"]).collect()
    }
    assert out == {
        1: ("a", "one"),
        2: ("a", "TWO"),
        4: ("b", "four"),
        9: ("b", "nine"),
    }


def test_apply_changes_latest_version_wins(spark):
    snap = _snapshot(spark)
    changes = _changes(
        spark,
        [
            (2, "a", "v10", OP_UPSERT, 10),
            (2, "a", "v30", OP_UPSERT, 30),
            (2, "a", "v20", OP_UPSERT, 20),
            (1, "a", None, OP_DELETE, 5),
            (1, "a", "resurrected", OP_UPSERT, 6),  # upsert AFTER delete wins
            (4, "b", "late-delete", OP_UPSERT, 7),
            (4, "b", None, OP_DELETE, 8),           # delete AFTER upsert wins
        ],
    )
    out = {r.k: r.v for r in apply_changes(snap, changes, ["k"]).collect()}
    assert out == {1: "resurrected", 2: "v30", 3: "three"}


def test_latest_changes_tie_break_is_deterministic(spark):
    """Equal versions for one key must resolve identically regardless of
    input partition layout (struct ordering tie-break, not partition
    order)."""
    rows = [
        (7, "a", "zzz", OP_UPSERT, 1),
        (7, "a", "aaa", OP_UPSERT, 1),
        (7, "a", "mmm", OP_UPSERT, 1),
    ]
    picked = set()
    for n_parts in (1, 3, 7):
        ch = _changes(spark, rows).repartition(n_parts)
        got = latest_changes(ch, ["k"]).collect()
        assert len(got) == 1
        picked.add(got[0].v)
    assert picked == {"zzz"}  # max over (version, op, payload): 'zzz' sorts last


def test_apply_changes_column_order_and_count(spark):
    snap = _snapshot(spark)
    changes = _changes(spark, [(1, "a", "ONE", OP_UPSERT, 1)])
    out = apply_changes(snap, changes, ["k"])
    assert out.columns == snap.columns
    assert out.count() == 4


def test_merge_into_partitioned_rewrites_only_touched(spark, tmpdir):
    path = os.path.join(str(tmpdir), "snap")
    _snapshot(spark).write.partitionBy("part").parquet(path)
    # record partition 'b' file mtimes to prove it is untouched
    b_dir = os.path.join(path, "part=b")
    before = {f: os.path.getmtime(os.path.join(b_dir, f)) for f in os.listdir(b_dir)}

    changes = _changes(spark, [(2, "a", "TWO", OP_UPSERT, 1), (8, "a", "eight", OP_UPSERT, 1)])
    touched = merge_into_partitioned(spark, path, changes, ["k", "part"], "part")
    assert touched == ["a"]

    after = {f: os.path.getmtime(os.path.join(b_dir, f)) for f in os.listdir(b_dir)}
    assert after == before, "untouched partition was rewritten"

    out = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert out == {1: "one", 2: "TWO", 3: "three", 4: "four", 8: "eight"}


def test_merge_into_partitioned_drops_emptied_partition(spark, tmpdir):
    path = os.path.join(str(tmpdir), "snap")
    _snapshot(spark).write.partitionBy("part").parquet(path)
    changes = _changes(
        spark,
        [(3, "b", None, OP_DELETE, 1), (4, "b", None, OP_DELETE, 1)],
    )
    merge_into_partitioned(spark, path, changes, ["k", "part"], "part")
    out = {r.k for r in spark.read.parquet(path).collect()}
    assert out == {1, 2}
    assert not os.path.isdir(os.path.join(path, "part=b")), (
        "fully-deleted partition directory must be dropped"
    )


def test_merge_matches_sql_merge_semantics(spark, sf_dir):
    """Events-scale randomized check: merge result equals the set algebra
    (snapshot minus changed keys) ∪ latest upserts, computed independently
    with plain DataFrame ops on a different formulation (window instead
    of max_by)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "user_id", "value"
    )
    # synthesize a deterministic delta: every 10th id deleted, every 7th upserted
    ch = (
        ev.filter((F.col("event_id") % 7 == 0) | (F.col("event_id") % 10 == 0))
        .select(
            "event_id",
            "user_id",
            (F.col("value") + 1000).alias("value"),
            F.when(F.col("event_id") % 10 == 0, F.lit(OP_DELETE))
            .otherwise(F.lit(OP_UPSERT))
            .alias("op"),
            (F.col("event_id") % 3).alias("version"),
        )
    )
    got = apply_changes(ev, ch, ["event_id"])

    w = Window.partitionBy("event_id").orderBy(
        F.desc("version"), F.desc("op"), F.desc("value")
    )
    latest = (
        ch.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
    expect = (
        ev.join(latest.select("event_id"), "event_id", "left_anti")
        .unionByName(latest.filter(F.col("op") == OP_UPSERT).select(*ev.columns))
    )
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0


def test_affected_partition_requires_key_stability(spark):
    changes = _changes(spark, [(1, "a", "x", OP_UPSERT, 1)])
    # r6: ValueError, not assert — the contract violation corrupts data
    # and must survive `python -O` (ADVICE r5)
    with pytest.raises(ValueError, match="key-stable"):
        merge_into_partitioned(spark, "/nonexistent", changes, ["k"], "part")


# ------------------------------------------------------------------- SCD2

from kafka_streams_task_spark.operators.merge import scd2_apply, scd2_init


def test_scd2_full_lifecycle(spark):
    snap = _snapshot(spark)
    hist = scd2_init(snap, 0)
    changes = _changes(
        spark,
        [
            (2, "a", "v5", OP_UPSERT, 5),
            (2, "a", "v8", OP_UPSERT, 8),
            (3, "b", None, OP_DELETE, 4),      # closes, no reopen
            (3, "b", "back", OP_UPSERT, 6),    # resurrect after delete
            (9, "b", "nine", OP_UPSERT, 7),    # brand-new key
        ],
    )
    out = scd2_apply(hist, changes, ["k"])
    rows = {(r.k, r.valid_from): (r.v, r.valid_to) for r in out.collect()}
    assert rows == {
        (1, 0): ("one", None),        # untouched: still current
        (2, 0): ("two", 5),           # closed by first change
        (2, 5): ("v5", 8),            # superseded by v8
        (2, 8): ("v8", None),         # current
        (3, 0): ("three", 4),         # closed by delete
        (3, 6): ("back", None),       # resurrected
        (4, 0): ("four", None),       # untouched
        (9, 7): ("nine", None),       # insert
    }


def test_scd2_current_view_equals_apply_changes(spark, sf_dir):
    """Law: the current slice (valid_to IS NULL) of the SCD2 history must
    equal the latest-wins merge of the same delta."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "user_id", "value"
    )
    ch = (
        ev.filter((F.col("event_id") % 5 == 0) | (F.col("event_id") % 7 == 0))
        .select(
            "event_id",
            "user_id",
            (F.col("value") + 1).alias("value"),
            F.when(F.col("event_id") % 5 == 0, F.lit(OP_DELETE))
            .otherwise(F.lit(OP_UPSERT))
            .alias("op"),
            (F.col("event_id") % 11).alias("version"),
        )
    )
    hist = scd2_init(ev, -1)
    current = (
        scd2_apply(hist, ch, ["event_id"])
        .filter(F.col("valid_to").isNull())
        .select("event_id", "user_id", "value")
    )
    merged = apply_changes(ev, ch, ["event_id"])
    assert current.exceptAll(merged).count() == 0
    assert merged.exceptAll(current).count() == 0


def test_scd2_closed_rows_pass_through(spark):
    snap = _snapshot(spark)
    hist = scd2_apply(
        scd2_init(snap, 0),
        _changes(spark, [(1, "a", "mid", OP_UPSERT, 3)]),
        ["k"],
    )
    # second application touching a different key must not disturb the
    # closed (1, 0) row nor the open (1, 3) row
    out = scd2_apply(
        hist, _changes(spark, [(2, "a", "late", OP_UPSERT, 9)]), ["k"]
    )
    rows = {(r.k, r.valid_from): (r.v, r.valid_to) for r in out.collect()}
    assert rows[(1, 0)] == ("one", 3)
    assert rows[(1, 3)] == ("mid", None)
    assert rows[(2, 0)] == ("two", 9)
    assert rows[(2, 9)] == ("late", None)


def test_changes_validation_names_the_problem(spark):
    snap = _snapshot(spark)
    bad = spark.createDataFrame([Row(k=1, v="x")])  # no op/version
    with pytest.raises(ValueError, match="missing column"):
        apply_changes(snap, bad, ["k"])
    partial = spark.createDataFrame(
        [Row(k=1, op="U", version=1)]  # upsert without the payload columns
    )
    with pytest.raises(ValueError, match="full-row"):
        apply_changes(snap, partial, ["k"])


# ---------------------------------------------------------------------------
# r6: fail-fast validation (ADVICE items) and the write-audit-publish commit
# ---------------------------------------------------------------------------


def test_unknown_op_code_raises_instead_of_deleting(spark):
    """A malformed op verb ('u', 'I', 'c' from a foreign CDC producer)
    must error at execution, not silently drop the row (the anti-join
    removes every changed key; only OP_UPSERT rows re-insert)."""
    snap = _snapshot(spark)
    changes = _changes(spark, [(1, "a", "ONE", "u", 1)])  # lowercase verb
    with pytest.raises(Exception, match="unknown CDC op code"):
        apply_changes(snap, changes, ["k"]).collect()


def test_affected_partitions_contract_raises_value_error(spark):
    """partition_col not in key_cols corrupts the merged snapshot (stale
    rows in old partitions) — must be a ValueError, not an -O-stripped
    assert."""
    from kafka_streams_task_spark.operators.merge import affected_partition_values

    with pytest.raises(ValueError, match="key-stable"):
        affected_partition_values(
            _changes(spark, [(1, "a", "x", OP_UPSERT, 1)]), "part", ["k"]
        )


def test_scd2_validation_errors(spark):
    from kafka_streams_task_spark.operators.merge import scd2_apply, scd2_init

    snap = _snapshot(spark)
    hist = scd2_init(snap, 0)
    # seeding twice: interval columns collide
    with pytest.raises(ValueError, match="interval column"):
        scd2_init(hist, 1)
    # history without intervals
    with pytest.raises(ValueError, match="scd2_init"):
        scd2_apply(snap, _changes(spark, [(1, "a", "x", OP_UPSERT, 1)]), ["k"])
    # changes missing a payload column -> explicit error, not a deep
    # AnalysisException at the final select
    partial = _changes(spark, [(1, "a", "x", OP_UPSERT, 1)]).drop("v")
    with pytest.raises(ValueError, match="full-row images"):
        scd2_apply(hist, partial, ["k"])
    # changes carrying reserved interval columns
    clash = _changes(spark, [(1, "a", "x", OP_UPSERT, 1)]).withColumn(
        "valid_from", F.lit(9)
    )
    with pytest.raises(ValueError, match="reserved interval"):
        scd2_apply(hist, clash, ["k"])


def test_merge_partition_value_needing_escape(spark, tmpdir):
    """Partition values with characters Spark escapes in directory names
    (':' -> '%3A'): the emptied-partition delete must hit the REAL
    directory, or takedown-deleted rows silently survive (ADVICE r5
    medium)."""
    path = os.path.join(str(tmpdir), "snap")
    spark.createDataFrame(
        [Row(k=1, part="a:1", v="one"), Row(k=2, part="b 2", v="two")]
    ).write.partitionBy("part").parquet(path)
    assert os.path.isdir(os.path.join(path, "part=a%3A1"))

    changes = _changes(spark, [(1, "a:1", None, OP_DELETE, 1)])
    merge_into_partitioned(spark, path, changes, ["k", "part"], "part")
    assert not os.path.isdir(os.path.join(path, "part=a%3A1")), (
        "escaped partition directory must be dropped when fully deleted"
    )
    out = {r.k for r in spark.read.parquet(path).collect()}
    assert out == {2}


def test_merge_crash_before_manifest_leaves_prior_version(spark, tmpdir, monkeypatch):
    """Crash during the staged write / before the commit manifest: the
    live snapshot is untouched (prior version fully readable) and
    recover_merge cleans the orphan staging."""
    import kafka_streams_task_spark.operators.merge as m

    path = os.path.join(str(tmpdir), "snap")
    _snapshot(spark).write.partitionBy("part").parquet(path)
    before = {r.k: r.v for r in spark.read.parquet(path).collect()}

    def boom(*a, **kw):
        raise RuntimeError("injected crash before manifest")

    monkeypatch.setattr(m, "_write_manifest", boom)
    changes = _changes(spark, [(2, "a", "TWO", OP_UPSERT, 1)])
    with pytest.raises(RuntimeError, match="injected crash"):
        merge_into_partitioned(spark, path, changes, ["k", "part"], "part")

    assert {r.k: r.v for r in spark.read.parquet(path).collect()} == before, (
        "snapshot must stay at the prior version"
    )
    monkeypatch.undo()
    assert m.recover_merge(spark, path) in ("cleaned_orphan", "clean")
    assert {r.k: r.v for r in spark.read.parquet(path).collect()} == before


def test_merge_crash_between_partition_swaps_rolls_forward(spark, tmpdir, monkeypatch):
    """Crash BETWEEN partition swaps (manifest committed, publish
    partial): the manifest + staging contain everything needed, so
    recover_merge replays the publish idempotently and the snapshot
    lands at the merged state (the VERDICT r5 item 5 crash-injection
    gate)."""
    import kafka_streams_task_spark.operators.merge as m

    path = os.path.join(str(tmpdir), "snap")
    _snapshot(spark).write.partitionBy("part").parquet(path)

    real_publish = m._publish_from_manifest
    calls = {"n": 0}

    def partial_publish(spark_, snapshot_path, manifest):
        # simulate: first touched partition swapped, then crash
        calls["n"] += 1
        jvm, fs = m._fs(spark_, snapshot_path)
        Path = jvm.org.apache.hadoop.fs.Path
        staging = f"{snapshot_path}/{m._STAGING_DIR}/{manifest['commit']}"
        first = manifest["touched"][0]
        if first in set(manifest["surviving"]):
            dest = Path(f"{snapshot_path}/{first}")
            if fs.exists(dest):
                fs.delete(dest, True)
            fs.rename(Path(f"{staging}/{first}"), dest)
        raise RuntimeError("injected crash mid-publish")

    monkeypatch.setattr(m, "_publish_from_manifest", partial_publish)
    changes = _changes(
        spark, [(2, "a", "TWO", OP_UPSERT, 1), (3, "b", None, OP_DELETE, 1)]
    )
    with pytest.raises(RuntimeError, match="mid-publish"):
        merge_into_partitioned(spark, path, changes, ["k", "part"], "part")
    assert calls["n"] == 1

    # a new merge must refuse to start over the pending commit
    monkeypatch.setattr(m, "_publish_from_manifest", real_publish)
    with pytest.raises(RuntimeError, match="recover_merge"):
        merge_into_partitioned(spark, path, changes, ["k", "part"], "part")

    assert m.recover_merge(spark, path) == "rolled_forward"
    out = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert out == {1: "one", 2: "TWO", 4: "four"}, "roll-forward incomplete"
    # idempotent: a second recovery is a no-op
    assert m.recover_merge(spark, path) == "clean"
    assert {r.k: r.v for r in spark.read.parquet(path).collect()} == out


def test_null_key_delete_and_upsert(spark):
    """Null join keys: a plain on=key_cols anti-join (EqualTo) never
    matches null, silently no-opping null-keyed deletes and duplicating
    null-keyed upserts — the merge must be null-SAFE on its keys."""
    snap = spark.createDataFrame(
        [Row(k=None, v="nullrow"), Row(k=1, v="one")],
        schema="k bigint, v string",
    )
    # delete the null-keyed row
    deleted = apply_changes(
        snap,
        spark.createDataFrame(
            [Row(k=None, v=None, op=OP_DELETE, version=1)],
            schema="k bigint, v string, op string, version bigint",
        ),
        ["k"],
    ).collect()
    assert {r.k for r in deleted} == {1}, "null-keyed delete must remove the row"
    # upsert the null-keyed row: exactly one copy with the new value
    upserted = apply_changes(
        snap,
        spark.createDataFrame(
            [Row(k=None, v="NEW", op=OP_UPSERT, version=1)],
            schema="k bigint, v string, op string, version bigint",
        ),
        ["k"],
    ).collect()
    assert sorted(((r.k, r.v) for r in upserted), key=str) == sorted(
        [(None, "NEW"), (1, "one")], key=str
    )


def test_merge_boolean_partition_values(spark, tmpdir):
    """python str(True) is 'True' but Spark writes 'part=true': the
    manifest's dir names must come from Spark's own rendering or the
    publish silently discards the merged partition."""
    path = os.path.join(str(tmpdir), "snap")
    spark.createDataFrame(
        [Row(k=1, part=True, v="t"), Row(k=2, part=False, v="f")],
        schema="k bigint, part boolean, v string",
    ).write.partitionBy("part").parquet(path)
    assert os.path.isdir(os.path.join(path, "part=true"))

    changes = spark.createDataFrame(
        [Row(k=1, part=True, v="T2", op=OP_UPSERT, version=1),
         Row(k=2, part=False, v=None, op=OP_DELETE, version=1)],
        schema="k bigint, part boolean, v string, op string, version bigint",
    )
    merge_into_partitioned(spark, path, changes, ["k", "part"], "part")
    # (read-back infers the partition column as string 'true' — partition
    # type inference has no boolean arm; the VALUES are what matter here)
    out = {(r.k, str(r.part).lower()): r.v for r in spark.read.parquet(path).collect()}
    assert out == {(1, "true"): "T2"}, out
    assert not os.path.isdir(os.path.join(path, "part=false")), (
        "fully-deleted boolean partition directory must be dropped"
    )


def test_merge_rejects_empty_string_partition(spark, tmpdir):
    """'' is written as __HIVE_DEFAULT_PARTITION__ and read back as NULL
    — not round-trippable; merging on it would overwrite the directory
    without reading its rows. Must refuse."""
    path = os.path.join(str(tmpdir), "snap")
    _snapshot(spark).write.partitionBy("part").parquet(path)
    changes = _changes(spark, [(1, "", "x", OP_UPSERT, 1)])
    with pytest.raises(ValueError, match="round-trippable"):
        merge_into_partitioned(spark, path, changes, ["k", "part"], "part")


def test_scd2_null_key_interval_closes(spark):
    from kafka_streams_task_spark.operators.merge import scd2_apply, scd2_init

    hist = scd2_init(
        spark.createDataFrame([Row(k=None, v="old")], schema="k bigint, v string"), 0
    )
    out = scd2_apply(
        hist,
        spark.createDataFrame(
            [Row(k=None, v="new", op=OP_UPSERT, version=5)],
            schema="k bigint, v string, op string, version bigint",
        ),
        ["k"],
    ).collect()
    rows = sorted(((r.v, r.valid_from, r.valid_to) for r in out))
    assert rows == [("new", 5, None), ("old", 0, 5)], (
        "null-keyed current interval must close at the incoming version"
    )


def test_merge_narrowing_delta_partition_type_renders_correctly(spark, tmpdir):
    """int delta on a double-partitioned snapshot: merged coerces to the
    snapshot's double, and dir names must render '1.0' (the review's
    confirmed silent-loss case)."""
    path = os.path.join(str(tmpdir), "snap")
    spark.createDataFrame(
        [Row(k=1, part=1.0, v="one"), Row(k=2, part=2.0, v="two")],
        schema="k bigint, part double, v string",
    ).write.partitionBy("part").parquet(path)
    assert os.path.isdir(os.path.join(path, "part=1.0"))

    changes = spark.createDataFrame(
        [Row(k=1, part=1, v="ONE", op=OP_UPSERT, version=1)],
        schema="k bigint, part int, v string, op string, version bigint",
    )
    merge_into_partitioned(spark, path, changes, ["k", "part"], "part")
    out = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert out == {1: "ONE", 2: "two"}, out
    assert os.path.isdir(os.path.join(path, "part=1.0"))
    assert not os.path.isdir(os.path.join(path, "part=1")), (
        "delta-typed directory must not appear beside the snapshot's"
    )


def test_merge_widening_delta_partition_type_refused(spark, tmpdir):
    """double delta on an int-partitioned snapshot would stage 'part=1.0'
    beside the live 'part=1' and double the data — must refuse."""
    path = os.path.join(str(tmpdir), "snap")
    spark.createDataFrame(
        [Row(k=1, part=1, v="one")], schema="k bigint, part int, v string"
    ).write.partitionBy("part").parquet(path)
    changes = spark.createDataFrame(
        [Row(k=1, part=1.0, v="ONE", op=OP_UPSERT, version=1)],
        schema="k bigint, part double, v string, op string, version bigint",
    )
    with pytest.raises(ValueError, match="renders partition directories differently"):
        merge_into_partitioned(spark, path, changes, ["k", "part"], "part")
