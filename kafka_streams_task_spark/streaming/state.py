"""Shared durable-state helpers for the foreachBatch operators.

The versioned-parquet commit protocol (``_SUCCESS``-marked directories,
Hadoop FS API so any reachable scheme works) backs both the rollup state
(``decoupled.rollup_via_foreach_batch``) and the near-dedup index shards
(``dedup.streaming_dedup_near``) — one implementation, so commit-protocol
fixes cannot drift between them.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


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
