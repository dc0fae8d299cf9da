"""Shared durable-state helpers for the foreachBatch operators.

The versioned-parquet commit protocol (``_SUCCESS``-marked directories,
Hadoop FS API so any reachable scheme works) backs both the rollup state
(``decoupled.rollup_via_foreach_batch``) and the near-dedup index shards
(``dedup.streaming_dedup_near``) — one implementation, so commit-protocol
fixes cannot drift between them.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def path_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe through the Hadoop FS API, so state dirs on ANY
    reachable scheme (file://, hdfs://, s3a://) resolve correctly —
    ``os.path.exists`` on a non-local URI is always False and silently
    disables whatever check rides on it (review r13)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def meta_committed(spark: SparkSession, meta_path: str) -> bool:
    """True iff a single-row parquet meta directory is fully COMMITTED —
    i.e. carries the ``_SUCCESS`` marker parquet publishes last. Bare
    ``path_exists`` on the directory is not enough: a crash mid-first-
    write leaves a directory that exists but is unreadable, turning
    every later batch/read into an opaque schema-inference failure
    instead of a self-healing rewrite (advice r14). The versioned state
    dirs already gate on ``_SUCCESS`` via :func:`committed_versions`;
    this is the same discipline for the parameter metas."""
    return path_exists(spark, f"{meta_path}/_SUCCESS")


def committed_versions(spark: SparkSession, root_dir: str, pfx: str) -> list[int]:
    """Sorted versions N for which ``{root_dir}/{pfx}{N}/_SUCCESS``
    exists — i.e. fully committed parquet state directories."""
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    root = Path(root_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    versions: list[int] = []
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith(pfx):
                try:
                    v = int(name[len(pfx):])
                except ValueError:
                    continue
                if fs.exists(Path(st.getPath(), "_SUCCESS")):
                    versions.append(v)
    versions.sort()
    return versions


def bind_state_to_checkpoint(spark: SparkSession, state_dir: str, checkpoint_dir: str) -> None:
    """Pair a durable state directory with ONE streaming checkpoint for
    life. foreachBatch redelivery detection keys on the checkpoint's
    batch_id sequence, which restarts at 0 under a fresh checkpoint — so
    feeding an existing state dir from a NEW checkpoint would silently
    mistake its first batches for redeliveries and drop them. Writes a
    ``_checkpoint`` marker on first use; raises if the dir is already
    bound to a different checkpoint (restarts on the SAME checkpoint pass
    unhindered — that is the supported recovery path)."""
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    root = Path(state_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    marker = Path(state_dir, "_checkpoint")
    if fs.exists(marker):
        stream = fs.open(marker)
        try:
            bound = bytes(stream.readAllBytes()).decode("utf-8").strip()
        finally:
            stream.close()
        if bound != checkpoint_dir:
            raise ValueError(
                f"state dir {state_dir!r} is bound to checkpoint {bound!r}; "
                f"starting it under {checkpoint_dir!r} would replay batch ids "
                "and silently skip real batches. Use the original checkpoint "
                "dir to resume, or a fresh state dir for a new ingest run."
            )
        return
    fs.mkdirs(root)
    out = fs.create(marker, True)
    try:
        out.write(bytearray(checkpoint_dir.encode("utf-8")))
    finally:
        out.close()


def committed_index_state(
    spark: SparkSession, root_dir: str, pfx: str
) -> tuple[str | None, int, list[int]]:
    """``(compact_path, covered_hi, live_shard_versions)`` — the read
    view of a compactable shard index: the newest committed
    ``{pfx}compact_{hi}`` directory (None / hi=-1 when never compacted
    — batch ids start at 0, so 0 is a REAL coverable version, not a
    sentinel) plus the committed per-batch shards with version > hi.
    Shards <= hi and older compact dirs are leftovers of a crash between
    a compaction's publish and its cleanup — correct to ignore (their
    rows live in the newest compact dir) and deleted lazily by the next
    :func:`compact_index_shards`."""
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    root = Path(root_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    compact_hi, shards = -1, []
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith(pfx)):
                continue
            suffix = name[len(pfx):]
            if not fs.exists(Path(st.getPath(), "_SUCCESS")):
                continue
            if suffix.startswith("compact_"):
                try:
                    compact_hi = max(compact_hi, int(suffix[len("compact_"):]))
                except ValueError:
                    continue
            else:
                try:
                    shards.append(int(suffix))
                except ValueError:
                    continue
    live = sorted(v for v in shards if v > compact_hi)
    path = (
        f"{root_dir}/{pfx}compact_{compact_hi}" if compact_hi >= 0 else None
    )
    return path, compact_hi, live


def compact_index_shards(
    spark: SparkSession, root_dir: str, pfx: str, defer_cleanup: bool = False
) -> str | None:
    """Merge the current compact root (if any) and every live committed
    shard into ONE new ``{pfx}compact_{hi}`` directory (hi = newest
    merged shard version), then delete the covered shards and older
    compact dirs. Returns the new compact path, or None when there was
    nothing to merge.

    ``defer_cleanup`` (r15, for shard dirs with EXTERNAL readers — the
    streaming ANN index): delete only what the PREVIOUS compact root
    already covered, keeping this round's newly-covered shards (and the
    previous compact root) on disk until the NEXT compaction. Readers
    resolve the newest committed compact root and ignore covered
    shards, so the leftovers are correctness-neutral (exactly the
    crash-leftover case below) — but a reader that LISTED the dir just
    before this publish keeps every root it planned to scan for a full
    compaction interval, instead of racing the delete into a
    FileNotFound. The single-reader streams (dedup) keep the default
    immediate cleanup.

    Keeps a long-lived stream's per-batch index read at one parquet
    root + the few shards since the last compaction, instead of one
    root per ever-committed batch (advice r9: O(N^2) cumulative listing
    and scan cost). Crash-safe by construction: the merged dir is
    published by its own ``_SUCCESS`` (a half-written attempt is
    invisible and simply overwritten by the retry), readers resolve the
    NEWEST committed compact dir and ignore shards it covers, and the
    covered-shard deletes after publish are pure cleanup — a crash
    between publish and delete leaves harmless leftovers the next
    compaction removes. Write amplification is the usual log-structured
    trade: each compaction rewrites the index once, so run it every K
    batches (K ~ tens) — reads stay O(K) roots, writes stay O(N/K)
    full rewrites over the stream's life."""
    compact_path, old_hi, live = committed_index_state(spark, root_dir, pfx)
    if not live:
        return None
    roots = ([compact_path] if compact_path else []) + [
        f"{root_dir}/{pfx}{v}" for v in live
    ]
    new_hi = live[-1]
    new_path = f"{root_dir}/{pfx}compact_{new_hi}"
    spark.read.parquet(*roots).write.mode("overwrite").parquet(new_path)
    # cleanup AFTER publish: everything below is now covered by new_path
    # (with defer_cleanup, only below the PREVIOUS cover — see docstring)
    cut = old_hi if defer_cleanup else new_hi
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    root = Path(root_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(pfx)):
            continue
        suffix = name[len(pfx):]
        if suffix.startswith("compact_"):
            try:
                stale = int(suffix[len("compact_"):]) < cut
            except ValueError:
                continue
        else:
            try:
                stale = int(suffix) <= cut
            except ValueError:
                continue
        if stale:
            fs.delete(st.getPath(), True)
    return new_path


def prune_state_versions(
    spark: SparkSession, root_dir: str, pfx: str, keep_last: int = 2
) -> list[int]:
    """Delete old SELF-CONTAINED state versions, keeping the newest
    ``keep_last`` — the retention side of the versioned-parquet
    protocol. Every sketch/sample/mixing family writes one
    self-contained version per micro-batch (each version is the full
    cumulative state, not a delta), so an always-on stream accumulates
    one parquet dir per batch forever; this bounds the dir at
    O(keep_last) without touching correctness: readers resolve
    ``max(committed_versions)``, which is always kept, and redelivery
    detection only needs the batch's OWN version to be present —
    pruning batch N-5 cannot make a redelivered batch N-5 misfire
    because foreachBatch redelivers only the LATEST uncommitted batch
    under availableNow/checkpoint semantics; a redelivered batch whose
    version was pruned would recompute from the kept predecessor, which
    is the same deterministic merge. Keep at least 2 so a reader that
    resolved the previous max just before a new commit never races a
    delete.

    Only ``{pfx}N`` version directories are touched — parameter metas,
    ``_checkpoint`` markers, and compact/shard dirs (which have their
    own lifecycle, :func:`compact_index_shards`) are never candidates.
    Crash-safe: deletion is pure cleanup of fully-committed dirs; a
    crash mid-prune leaves some extra old versions for the next prune.
    Returns the pruned version numbers."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    versions = committed_versions(spark, root_dir, pfx)
    victims = versions[:-keep_last] if len(versions) > keep_last else []
    if not victims:
        return []
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    root = Path(root_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    for v in victims:
        fs.delete(Path(root_dir, f"{pfx}{v}"), True)
    return victims
