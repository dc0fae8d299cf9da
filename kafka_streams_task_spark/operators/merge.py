"""CDC merge / upsert: apply a change stream to a snapshot table.

The incremental-maintenance primitive a 100 TB corpus needs between full
rebuilds: crawls, label fixes, and takedown requests arrive as (key, op,
version) change rows, and the curated snapshot must advance to
latest-wins state without rewriting data that did not change. The
reference repo has no analogue (its KTables are changelog-backed by the
broker); this is the batch re-expression of "KTable = latest value per
key" (SURVEY.md §2.3 A6) generalized to upsert+delete with explicit
versions — i.e. the MERGE INTO shape, built from anti-join + union so it
runs on plain parquet without a table format.

Scale shape:
  * ``latest_changes`` is one partial+final ``max_by`` aggregate over the
    change set — the change set is the SMALL side by definition (a day's
    crawl delta vs the corpus), and only it shuffles fully.
  * ``apply_changes`` touches the snapshot with exactly one join (anti on
    the changed keys). Catalyst broadcasts the aggregated key set when it
    fits ``autoBroadcastJoinThreshold``, making the merge a single
    broadcast-anti scan over the snapshot — the snapshot itself never
    shuffles. With a huge delta it degrades to one shuffle join on the
    key, which is the floor for any merge.
  * ``merge_into_partitioned`` confines the REWRITE to partitions the
    delta actually touches: untouched partition directories are neither
    read nor written (partition pruning on the read, dynamic overwrite on
    the write). A 10 TB/day delta against a 100 TB corpus rewrites only
    the affected date/source partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: Change-operation codes (the Debezium-ish two-verb reduction: creates
#: and updates are both "upsert in full", deletes are tombstones).
OP_UPSERT = "U"
OP_DELETE = "D"


def _validate_changes(
    changes: DataFrame, key_cols: list[str], version_col: str, op_col: str
) -> None:
    """Fail fast with a names-the-problem error instead of an analysis
    exception three operators deep."""
    missing = [
        c for c in (*key_cols, version_col, op_col) if c not in changes.columns
    ]
    if missing:
        raise ValueError(
            f"change stream is missing column(s) {missing}; have "
            f"{changes.columns} (keys={key_cols}, version={version_col!r}, "
            f"op={op_col!r})"
        )


def latest_changes(
    changes: DataFrame,
    key_cols: list[str],
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """Collapse a change stream to one latest row per key.

    One ``max_by`` hash aggregation (partial+final — the same no-window
    shape as ``latest_per_key``, operators/weather.py): the ordering key
    is ``(version, op, payload...)`` as a struct, so ties on ``version``
    still resolve to ONE deterministic winner (lexicographic on the
    remaining columns) instead of a partition-order coin flip — replays
    and speculative tasks agree. Callers with a total version order per
    key (the normal CDC contract) never reach the tie-break.
    """
    _validate_changes(changes, key_cols, version_col, op_col)
    payload = [c for c in changes.columns if c not in key_cols]
    ordering = F.struct(
        F.col(version_col), F.col(op_col),
        *[F.col(c) for c in payload if c not in (version_col, op_col)],
    )
    picked = changes.groupBy(*key_cols).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), ordering).alias("_row")
    )
    return picked.select(*key_cols, *[F.col(f"_row.{c}").alias(c) for c in payload])


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """Latest-wins merge: the snapshot advanced by the change stream.

    ``changes`` carries the snapshot's columns plus ``op_col``
    (``OP_UPSERT``/``OP_DELETE``) and ``version_col``; upserts replace the
    whole row (full-row CDC images, not partial patches). Semantics:

      * a key whose latest change is an upsert takes the change's payload
        (insert if absent from the snapshot);
      * a key whose latest change is a delete disappears;
      * every other snapshot row passes through untouched.

    Exactly one aggregate over the delta and one anti-join against the
    snapshot; column order of the result matches the snapshot.
    """
    _validate_changes(changes, key_cols, version_col, op_col)
    extra = [c for c in snapshot.columns if c not in changes.columns]
    if extra:
        raise ValueError(
            f"changes lack snapshot column(s) {extra} — upserts are full-row "
            "images (partial patches are not supported)"
        )
    latest = latest_changes(changes, key_cols, version_col, op_col)
    kept = snapshot.join(latest.select(*key_cols), on=key_cols, how="left_anti")
    upserts = latest.filter(F.col(op_col) == OP_UPSERT).select(*snapshot.columns)
    return kept.unionByName(upserts)


def scd2_init(
    snapshot: DataFrame,
    version,
    version_type: str = "long",
) -> DataFrame:
    """Seed an SCD Type-2 history from a plain snapshot: every row
    becomes an open interval ``[version, null)``. Column layout:
    payload columns + ``valid_from`` + ``valid_to`` (null = current).
    ``version_type`` sets the interval columns' type (long versions by
    default; pass ``"timestamp"`` for event-time histories)."""
    return snapshot.select(
        "*",
        F.lit(version).cast(version_type).alias("valid_from"),
        F.lit(None).cast(version_type).alias("valid_to"),
    )


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """Slowly-changing-dimension Type 2: apply a versioned change stream
    to an interval history, KEEPING every superseded row (the audit /
    time-travel form of :func:`apply_changes` — "what did this key look
    like at version v?" stays answerable).

    Semantics (all changes apply, in version order per key — not just the
    latest): each upsert opens an interval ``[version, next-change
    version)``; the key's previously-current interval closes at the
    key's FIRST incoming change; a delete closes the open interval
    without opening one (the key has no current row until a later
    upsert). Already-closed history rows pass through untouched.
    Versions must be unique per key (the CDC contract); the change
    ordering still tie-breaks deterministically on (version, op,
    payload) like :func:`latest_changes`.

    Scale shape: one window over the CHANGE SET per key (the small side
    — lead() gives each upsert its closing version with no self-join),
    one min aggregate over the change set, and one key-partitioned
    left join against ONLY the history's current slice; closed history
    (the bulk at 100 TB — years of audit rows) is touched by nothing
    but the final union."""
    _validate_changes(changes, key_cols, version_col, op_col)
    payload = [c for c in changes.columns if c not in (op_col,)]
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col), F.col(op_col),
        *[F.col(c) for c in payload if c not in (version_col, *key_cols)],
    )
    ch = changes.withColumn("_next_v", F.lead(version_col).over(w))
    new_rows = ch.filter(F.col(op_col) == OP_UPSERT).select(
        *[c for c in payload if c != version_col],
        F.col(version_col).alias("valid_from"),
        F.col("_next_v").alias("valid_to"),
    )
    first_v = changes.groupBy(*key_cols).agg(
        F.min(version_col).alias("_first_v")
    )
    current = history.filter(F.col("valid_to").isNull())
    closed_now = (
        current.join(first_v, on=key_cols, how="left")
        .withColumn("valid_to", F.coalesce(F.col("_first_v"), F.col("valid_to")))
        .drop("_first_v")
    )
    was_closed = history.filter(F.col("valid_to").isNotNull())
    return was_closed.unionByName(closed_now).unionByName(
        new_rows.select(*history.columns)
    )


def affected_partition_values(
    changes: DataFrame,
    partition_col: str,
    key_cols: list[str],
    version_col: str = "version",
    op_col: str = "op",
) -> list:
    """Distinct partition values the delta touches — the bounded driver
    collect (one row per touched partition, NOT per change row) that lets
    the merge prune its snapshot read. Deletes count: removing a key
    rewrites its partition. Requires the partition column to be part of
    the key (else an update could move a row across partitions and the
    old partition would need a tombstone scan — that layout should merge
    unpartitioned)."""
    assert partition_col in key_cols, (
        "partition column must be key-stable; merge unpartitioned otherwise"
    )
    return [
        r[0] for r in changes.select(partition_col).distinct().collect()
    ]


def merge_into_partitioned(
    spark: SparkSession,
    snapshot_path: str,
    changes: DataFrame,
    key_cols: list[str],
    partition_col: str,
    version_col: str = "version",
    op_col: str = "op",
) -> list:
    """MERGE INTO a partitioned parquet snapshot in place, rewriting ONLY
    the partitions the delta touches. Returns the touched partition values.

    Read side: the ``isin(touched)`` filter prunes to the affected
    partition directories (partition pruning — untouched data is never
    read). Write side: dynamic partition overwrite replaces exactly the
    directories present in the output; Spark cannot overwrite a path it
    is concurrently reading, so the merged partitions stage through a
    localCheckpoint — sized by the touched partitions only, not the
    snapshot. A touched partition whose rows are ALL deleted produces no
    output rows, so dynamic overwrite would silently leave its stale
    directory behind — those directories are dropped explicitly through
    the Hadoop FileSystem API (same JVM handle the writer uses)."""
    touched = affected_partition_values(changes, partition_col, key_cols, version_col, op_col)
    if not touched:
        return touched
    prior = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    snap = spark.read.parquet(snapshot_path).filter(F.col(partition_col).isin(touched))
    merged = apply_changes(
        snap, changes, key_cols, version_col, op_col
    ).localCheckpoint(eager=True)
    try:
        surviving = {r[0] for r in merged.select(partition_col).distinct().collect()}
        try:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            merged.write.mode("overwrite").partitionBy(partition_col).parquet(snapshot_path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prior)
    finally:
        # the staged merge blocks die with the call (no-cached-blocks standard)
        merged._jdf.queryExecution().analyzed().rdd().unpersist(False)
    jvm = spark._jvm
    jsc = spark._jsc
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(jsc.hadoopConfiguration())
    for value in set(touched) - surviving:
        p = jvm.org.apache.hadoop.fs.Path(f"{snapshot_path}/{partition_col}={value}")
        if fs.exists(p):
            fs.delete(p, True)
    return touched
