"""Streaming heavy-hitter tracking: a durable Misra–Gries summary
maintained across micro-batches.

The corpus-profiling question a 100 TB always-on ingest actually asks —
"what are the top tokens/domains/urls flowing in RIGHT NOW, cumulatively"
— cannot afford a full token-domain aggregate per batch. Mergeable MG
summaries (Agarwal et al. 2012; ``operators.sketch``) make the state a
bounded object: each batch contributes its own O(capacity)-per-partition
candidates, the committed summary merges with them (one summary-sized
groupBy), and the result is a NEW summary with the single-pass guarantee
intact — total undercount ≤ N_cumulative/(capacity+1), every token with
cumulative count above that threshold retained.

Exactly-once under foreachBatch's at-least-once contract, via the
family's versioned-parquet protocol (``streaming/state.py``): batch N
writes ``summary_v{N}`` (overwrite-idempotent — the summary is a
deterministic function of the predecessor summary and the batch), a
redelivered batch whose version is committed skips wholesale, and the
state dir is bound to its checkpoint for life. State size on disk is
O(capacity) rows per version; old versions are prunable (each version
is self-contained — no shard union) via
``streaming.state.prune_state_versions`` (r16: run it every K batches
or from a janitor job; readers always resolve the kept max).

Reference parity: no analogue — beyond-reference training-data mandate
(SURVEY.md north-star extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_distinct_count",
    "read_theta_distinct",
    "read_theta_sample",
    "read_theta_sketch",
    "read_token_frequencies",
    "read_top_tokens",
    "read_value_quantiles",
    "streaming_distinct_values",
    "streaming_theta_sample",
    "streaming_theta_sketch",
    "streaming_token_frequencies",
    "streaming_top_tokens",
    "streaming_value_quantiles",
]

_PFX = "summary_v"


def _meta_dict(spark: SparkSession, meta_path: str) -> dict:
    """The single meta row as a plain dict. ``.get`` semantics matter:
    metas written by earlier releases lack later-added OPTIONAL columns
    (dd_meta gained max_buckets/group_col in r15, hll_meta group_col) —
    absent must read as None (the old default), not raise, or every
    pre-existing durable state dir dies on first contact after an
    upgrade (review r15)."""
    return spark.read.parquet(meta_path).collect()[0].asDict()


def streaming_top_tokens(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    capacity: int = 4096,
    text_col: str = "text",
):
    """Maintain a cumulative Misra–Gries token summary over a document
    stream. Returns the StreamingQuery; read the current heavy hitters
    with :func:`read_top_tokens` (lower-bound ranking — counts are
    conservative undercounts within N/(capacity+1); run the batch
    :func:`~..operators.sketch.topk_tokens_sketched` over the landed
    corpus when exact counts matter)."""
    from ..operators.sketch import merge_mg_summaries, misra_gries_candidates
    from .state import bind_state_to_checkpoint, committed_versions

    bind_state_to_checkpoint(stream.sparkSession, state_dir, checkpoint_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        versions = committed_versions(spark, state_dir, _PFX)
        if batch_id in versions:
            return  # redelivery: this batch's summary is already durable
        prev = [v for v in versions if v < batch_id]
        batch_cands = misra_gries_candidates(batch_df, text_col, capacity)
        if prev:
            committed = spark.read.parquet(f"{state_dir}/{_PFX}{max(prev)}")
            unioned = committed.unionByName(batch_cands)
        else:
            unioned = batch_cands
        merged = merge_mg_summaries(unioned, capacity)
        merged.write.mode("overwrite").parquet(f"{state_dir}/{_PFX}{batch_id}")

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_top_tokens(spark: SparkSession, state_dir: str, k: int = 20) -> DataFrame:
    """Current top-``k`` heavy hitters from the latest committed summary:
    ``(token, lower_bound, rank)``, ranked by the conservative MG lower
    bound (ties to token ASC). Raises if no summary has committed yet."""
    from .state import committed_versions

    versions = committed_versions(spark, state_dir, _PFX)
    if not versions:
        raise ValueError(f"no committed summary under {state_dir}")
    s = spark.read.parquet(f"{state_dir}/{_PFX}{max(versions)}")
    top = s.orderBy(F.col("lower_bound").desc(), F.col("token").asc()).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("lower_bound").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "token", "lower_bound", "rank"
    )


_CMS_PFX = "cms_v"


def streaming_token_frequencies(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    depth: int = 4,
    width: int = 4096,
    text_col: str = "text",
):
    """Maintain a cumulative count-min sketch over a document stream —
    the point-frequency twin of :func:`streaming_top_tokens`. Unlike the
    MG merge, the CMS merge (cell-wise sum) is EXACT: the committed
    sketch after batch N is bit-identical to the batch
    :func:`~..operators.sketch.count_min_table` over everything ingested
    so far (pinned by tests/test_sketch.py), so estimates from
    :func:`read_token_frequencies` carry the standard one-pass CMS
    guarantee (est >= true cumulative count; overcount bounded by the
    colliding mass in the min row) forever, in O(depth x width) state
    per version.

    Exactly-once under foreachBatch's at-least-once contract via the
    family's versioned-parquet protocol (``streaming/state.py``):
    overwrite-idempotent versions, redelivered batches skip wholesale,
    state dir bound to its checkpoint. The build parameters persist WITH
    the state (``cms_meta``) and are validated on every batch and every
    read — a mismatched ``width`` against durable counters would produce
    silent garbage (review r13), so it raises instead."""
    from ..operators.sketch import count_min_table, merge_cms_tables
    from .state import bind_state_to_checkpoint, committed_versions

    bind_state_to_checkpoint(stream.sparkSession, state_dir, checkpoint_dir)
    _check_or_write_cms_meta(stream.sparkSession, state_dir, depth, width)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _check_or_write_cms_meta(spark, state_dir, depth, width)
        versions = committed_versions(spark, state_dir, _CMS_PFX)
        if batch_id in versions:
            return  # redelivery: this batch's sketch is already durable
        prev = [v for v in versions if v < batch_id]
        batch_cms = count_min_table(batch_df, text_col, depth, width)
        if prev:
            committed = spark.read.parquet(f"{state_dir}/{_CMS_PFX}{max(prev)}")
            merged = merge_cms_tables(committed, batch_cms)
        else:
            merged = batch_cms
        merged.write.mode("overwrite").parquet(f"{state_dir}/{_CMS_PFX}{batch_id}")

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _check_or_write_cms_meta(
    spark: SparkSession, state_dir: str, depth: int, width: int
) -> None:
    """Persist (depth, width) beside the versioned sketches on first
    contact; afterwards REFUSE any caller whose parameters disagree with
    the durable state (hashing with a different width reads arbitrary
    cells — a silent-garbage mode, review r13). Probed through the
    Hadoop FS API so non-local state dirs (hdfs://, s3a://) validate too.

    Single-writer contract: like every versioned-parquet state dir, the
    meta is owned by ONE streaming query (``bind_state_to_checkpoint``
    binds the dir to one checkpoint for life). Two writers racing the
    first-contact write with different parameters is outside that
    contract and is not detected here — the loser's parameters would be
    overwritten, then refused on its NEXT batch."""
    from .state import meta_committed

    meta_path = f"{state_dir}/cms_meta"
    if meta_committed(spark, meta_path):
        row = spark.read.parquet(meta_path).collect()[0]
        if (row["depth"], row["width"]) != (depth, width):
            raise ValueError(
                f"CMS state at {state_dir} was built with depth="
                f"{row['depth']}/width={row['width']}; got {depth}/{width}"
            )
    else:
        # absent OR present-without-_SUCCESS (crash mid-first-write):
        # mode("overwrite") rewrites the half-written attempt, so the
        # state self-heals instead of failing every later read (advice r14)
        spark.createDataFrame(
            [(int(depth), int(width))], "depth int, width int"
        ).coalesce(1).write.mode("overwrite").parquet(meta_path)


def read_token_frequencies(
    spark: SparkSession,
    state_dir: str,
    probes: DataFrame,
    depth: int | None = None,
    width: int | None = None,
) -> DataFrame:
    """Point-frequency estimates ``(token, est)`` for a probe relation
    against the latest committed cumulative sketch. ``depth``/``width``
    default to the build parameters persisted with the state
    (``cms_meta``); passing values that disagree with the durable state
    raises rather than reading garbage cells (review r13). Raises if no
    sketch has committed yet, and raises — rather than trusting
    caller-supplied parameters against durable state of unknown
    provenance — when committed sketches exist WITHOUT their meta
    (partial state-dir cleanup; advice r14)."""
    from ..operators.sketch import cms_estimate
    from .state import committed_versions, meta_committed

    versions = committed_versions(spark, state_dir, _CMS_PFX)
    if not versions:
        raise ValueError(f"no committed sketch under {state_dir}")
    meta_path = f"{state_dir}/cms_meta"
    if not meta_committed(spark, meta_path):
        raise ValueError(
            f"no cms_meta under {state_dir} but committed sketches exist — "
            "the durable state's build parameters are unknown (partial "
            "state-dir cleanup?), so caller-supplied depth/width cannot be "
            "trusted against it"
        )
    row = spark.read.parquet(meta_path).collect()[0]
    depth = row["depth"] if depth is None else depth
    width = row["width"] if width is None else width
    _check_or_write_cms_meta(spark, state_dir, depth, width)
    cms = spark.read.parquet(f"{state_dir}/{_CMS_PFX}{max(versions)}")
    return cms_estimate(cms, probes, depth=depth, width=width)


_DD_PFX = "dd_v"


def streaming_value_quantiles(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str = "value",
    gamma: float = 1.02,
    max_buckets: int | None = None,
    group_col: str | None = None,
    *,
    max_groups: int | None = None,
):
    """Maintain a cumulative DDSketch over a value stream — the quantile
    twin of :func:`streaming_token_frequencies`. The DDSketch merge
    (cell-wise sum over deterministic buckets) is EXACT: the committed
    sketch after batch N is bit-identical to the batch
    :func:`~..operators.sketch.dd_sketch_table` over everything ingested
    so far (pinned by tests/test_sketch.py), so quantiles from
    :func:`read_value_quantiles` carry the full relative-error guarantee
    (|est - x_q| <= alpha * x_q, alpha = (gamma-1)/(gamma+1)) forever,
    in O(bucket domain) state per version.

    ``max_buckets`` (r15, VERDICT r14 item 5): bound the bucket state of
    an ALWAYS-ON stream over a growing value range by applying the
    paper's collapse (:func:`~..operators.sketch.dd_collapse`) AFTER the
    merge each batch — the documented exactness-preserving order: the
    collapse cut (the max_buckets-th highest bucket index seen) is
    non-decreasing as data arrives and the fold-up map composes under
    increasing cuts, so the committed state after batch N is
    bit-identical to ``dd_collapse(dd_sketch_table(everything), max_
    buckets)`` (pinned by tests/test_sketch.py) — NOT the lossier merge
    of pre-collapsed shards. Upper quantiles (the p95/p99 deployment)
    keep the full alpha guarantee; ranks inside the collapsed low mass
    degrade to "at most the collapse boundary", the paper's trade.

    ``group_col`` (r15): maintain PER-GROUP sketches instead — "p99 per
    endpoint maintained over the stream", the sketch's canonical
    always-on shape — via the grouped builder/merge/collapse (each
    group behaves exactly as its own global sketch; ``max_buckets``
    bounds EACH group's buckets).

    ``max_groups`` (keyword-only, r16 — VERDICT r15 item 7): grouped
    state grows as |groups| x buckets, so an UNBOUNDED group domain
    (raw URLs, user ids) grows state without limit no matter how
    tightly each group's buckets are collapsed. The cap REFUSES the
    batch (loudly, BEFORE any version is written — the last committed
    state stays intact and readable) when the post-merge distinct group
    count would exceed it, instead of growing silently until the job
    dies of state size with no named cause. Refusal over eviction is
    deliberate: evicting groups would break the documented
    stream==batch bit-equality, and the correct 100 TB remedy is
    upstream — quantize or pre-filter the grouping key to a bounded
    domain (the ``streaming/mixing.py`` prescription) — after which the
    stream resumes on the same checkpoint and state. Requires
    ``group_col``; persisted and validated in ``dd_meta`` like every
    other build parameter (a different cap on reattach is refused, not
    silently adopted).

    Exactly-once via the family's versioned-parquet protocol:
    overwrite-idempotent versions, redelivered batches skip wholesale,
    state dir bound to its checkpoint. ``gamma``, ``max_buckets`` AND
    ``group_col`` persist WITH the state (``dd_meta``) and are validated
    on every batch and read — mismatched gamma against durable buckets
    reads arbitrary value ranges, a mismatched collapse budget silently
    changes which ranks carry the guarantee, and grouped vs global
    buckets are different sketches, so all three raise instead."""
    from ..operators.sketch import (
        dd_collapse,
        dd_collapse_grouped,
        dd_sketch_table,
        dd_sketch_table_grouped,
        merge_dd_sketches,
        merge_dd_sketches_grouped,
    )
    from .state import bind_state_to_checkpoint, committed_versions

    if gamma <= 1.0:
        raise ValueError(f"gamma must be > 1, got {gamma}")
    if max_buckets is not None and max_buckets < 1:
        raise ValueError(f"max_buckets must be >= 1, got {max_buckets}")
    _check_group_cap_args(max_groups, group_col)
    bind_state_to_checkpoint(stream.sparkSession, state_dir, checkpoint_dir)
    _check_or_write_dd_meta(
        stream.sparkSession, state_dir, gamma, max_buckets, group_col, max_groups
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _check_or_write_dd_meta(
            spark, state_dir, gamma, max_buckets, group_col, max_groups
        )
        versions = committed_versions(spark, state_dir, _DD_PFX)
        if batch_id in versions:
            return  # redelivery: this batch's sketch is already durable
        prev = [v for v in versions if v < batch_id]
        if group_col is None:
            batch_dd = dd_sketch_table(batch_df, value_col, gamma)
            merge, collapse = merge_dd_sketches, dd_collapse
        else:
            batch_dd = dd_sketch_table_grouped(
                batch_df, group_col, value_col, gamma
            )
            merge, collapse = merge_dd_sketches_grouped, dd_collapse_grouped
        if prev:
            committed = spark.read.parquet(f"{state_dir}/{_DD_PFX}{max(prev)}")
            merged = merge(committed, batch_dd)
        else:
            merged = batch_dd
        if max_buckets is not None:
            merged = collapse(merged, max_buckets)
        _enforce_group_cap(merged, max_groups, state_dir, "DDSketch")
        merged.write.mode("overwrite").parquet(f"{state_dir}/{_DD_PFX}{batch_id}")

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _check_group_cap_args(max_groups: int | None, group_col: str | None) -> None:
    """Shared validation for the grouped-state cap (r16): the knob only
    means anything for grouped state, and a silent no-op on a global
    build would read as protection that is not there."""
    if max_groups is not None:
        if max_groups < 1:
            raise ValueError(f"max_groups must be >= 1, got {max_groups}")
        if group_col is None:
            raise ValueError(
                "max_groups bounds PER-GROUP state and requires group_col; "
                "global sketch state is already bounded by construction"
            )


def _enforce_group_cap(
    merged: DataFrame, max_groups: int | None, state_dir: str, family: str
) -> None:
    """Refuse the batch BEFORE its version is written when the merged
    state's distinct group count exceeds the persisted cap — the last
    committed version stays intact and readable, and the stream resumes
    on the same checkpoint once the group domain is bounded upstream.
    One cheap distinct-count over the summary-sized state, only when a
    cap is set."""
    if max_groups is None:
        return
    n_groups = merged.select("grp").distinct().count()
    if n_groups > max_groups:
        raise ValueError(
            f"{family} grouped state at {state_dir} would hold {n_groups} "
            f"groups, over the persisted max_groups={max_groups} cap — "
            "refusing the batch (last committed version is intact). "
            "Grouped sketch state grows as |groups| x buckets; bound the "
            "grouping key upstream (quantize it, or pre-filter to the "
            "monitored domain) and resume on the same checkpoint, or "
            "start a fresh state dir with a higher cap."
        )


def _check_or_write_dd_meta(
    spark: SparkSession,
    state_dir: str,
    gamma: float,
    max_buckets: int | None = None,
    group_col: str | None = None,
    max_groups: int | None = None,
) -> None:
    """Persist (gamma, max_buckets, group_col, max_groups) beside the
    versioned sketches on first contact; afterwards REFUSE any caller
    who disagrees with the durable state about any of them — a
    different gamma reads arbitrary value ranges, a different collapse
    budget silently changes which ranks carry the alpha guarantee,
    grouped vs global buckets are different sketches, and a different
    group cap silently changes which domains are refused.
    ``_SUCCESS``-gated probe (half-written metas self-heal) and
    single-writer contract as :func:`_check_or_write_cms_meta`; metas
    written before an optional column existed read it as None."""
    from .state import meta_committed

    meta_path = f"{state_dir}/dd_meta"
    if meta_committed(spark, meta_path):
        row = _meta_dict(spark, meta_path)
        got = (
            row["gamma"],
            row.get("max_buckets"),
            row.get("group_col"),
            row.get("max_groups"),
        )
        if got != (gamma, max_buckets, group_col, max_groups):
            raise ValueError(
                f"DDSketch state at {state_dir} was built with gamma="
                f"{got[0]}/max_buckets={got[1]}/group_col={got[2]!r}/"
                f"max_groups={got[3]}; got {gamma}/{max_buckets}/"
                f"{group_col!r}/{max_groups}"
            )
    else:
        spark.createDataFrame(
            [(float(gamma), max_buckets, group_col, max_groups)],
            "gamma double, max_buckets int, group_col string, max_groups int",
        ).coalesce(1).write.mode("overwrite").parquet(meta_path)


def read_value_quantiles(
    spark: SparkSession,
    state_dir: str,
    qs: list[float],
    gamma: float | None = None,
) -> DataFrame:
    """Quantile estimates against the latest committed cumulative
    sketch: ``(q, est)`` rows for global state, or ``(grp, q, est)`` per
    group when the state was built with a ``group_col`` (the shape is
    the durable state's own, read from ``dd_meta``). ``gamma`` defaults
    to the build value persisted with the state; passing a disagreeing
    value raises rather than reading garbage ranges. Raises if no
    sketch has committed yet, and raises — rather than trusting a
    caller-supplied gamma against durable state of unknown provenance —
    when committed sketches exist WITHOUT their meta (advice r14)."""
    from ..operators.sketch import dd_quantiles, dd_quantiles_grouped
    from .state import committed_versions, meta_committed

    versions = committed_versions(spark, state_dir, _DD_PFX)
    if not versions:
        raise ValueError(f"no committed sketch under {state_dir}")
    meta_path = f"{state_dir}/dd_meta"
    if not meta_committed(spark, meta_path):
        raise ValueError(
            f"no dd_meta under {state_dir} but committed sketches exist — "
            "the durable state's gamma is unknown (partial state-dir "
            "cleanup?), so a caller-supplied gamma cannot be trusted "
            "against it"
        )
    row = _meta_dict(spark, meta_path)
    built = row["gamma"]
    if gamma is None:
        gamma = built
    elif gamma != built:
        raise ValueError(
            f"DDSketch state at {state_dir} was built with gamma={built}; "
            f"got {gamma}"
        )
    dd = spark.read.parquet(f"{state_dir}/{_DD_PFX}{max(versions)}")
    if row.get("group_col") is None:
        return dd_quantiles(dd, qs, gamma=gamma)
    return dd_quantiles_grouped(dd, qs, gamma=gamma)


_HLL_PFX = "hll_v"


def streaming_distinct_values(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str = "value",
    b: int = 10,
    group_col: str | None = None,
    *,
    max_groups: int | None = None,
):
    """Maintain a cumulative HyperLogLog register table over a value
    stream — the distinct-count twin of the MG/CMS/DDSketch family. The
    HLL merge (element-wise MAX) is not just exact but IDEMPOTENT, so
    even outside the versioned protocol a redelivered batch could not
    corrupt the registers; the family's versioned-parquet discipline is
    kept anyway for uniform reads, auditability, and version pruning.
    The committed table after batch N is bit-identical to the batch
    :func:`~..operators.sketch.hll_register_table` over everything
    ingested (pinned by tests/test_sketch.py). ``b`` persists with the
    state (``hll_meta``) and is validated on every batch and read —
    registers indexed under a different b are a different sketch.

    ``group_col``: maintain PER-GROUP register tables instead — "distinct
    users per key", the canonical always-on form — via the grouped
    builder/merge (same per-cell arithmetic; state is the
    |groups| x 2^b domain). The grouping column persists in ``hll_meta``
    alongside b and is validated identically: grouped and global
    registers are different sketches, so a caller disagreeing about
    either is refused.

    ``max_groups`` (keyword-only, r16): |groups| x 2^b is bounded only
    while the GROUP domain is — cap it and the over-cap batch is
    REFUSED before any version is written (committed state intact),
    with the bound-the-key-upstream remedy named in the error. Same
    rationale, persistence, and validation as the DDSketch twin's cap
    (see :func:`streaming_value_quantiles`); requires ``group_col``."""
    from ..operators.sketch import (
        hll_register_table,
        hll_register_table_grouped,
        merge_hll_tables,
        merge_hll_tables_grouped,
    )
    from .state import bind_state_to_checkpoint, committed_versions

    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16], got {b}")
    _check_group_cap_args(max_groups, group_col)
    bind_state_to_checkpoint(stream.sparkSession, state_dir, checkpoint_dir)
    _check_or_write_hll_meta(
        stream.sparkSession, state_dir, b, group_col, max_groups
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _check_or_write_hll_meta(spark, state_dir, b, group_col, max_groups)
        versions = committed_versions(spark, state_dir, _HLL_PFX)
        if batch_id in versions:
            return  # redelivery: this batch's registers are already durable
        prev = [v for v in versions if v < batch_id]
        if group_col is None:
            batch_hll = hll_register_table(batch_df, value_col, b)
            merge = merge_hll_tables
        else:
            batch_hll = hll_register_table_grouped(
                batch_df, group_col, value_col, b
            )
            merge = merge_hll_tables_grouped
        if prev:
            committed = spark.read.parquet(f"{state_dir}/{_HLL_PFX}{max(prev)}")
            merged = merge(committed, batch_hll)
        else:
            merged = batch_hll
        _enforce_group_cap(merged, max_groups, state_dir, "HLL")
        merged.write.mode("overwrite").parquet(f"{state_dir}/{_HLL_PFX}{batch_id}")

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _check_or_write_hll_meta(
    spark: SparkSession,
    state_dir: str,
    b: int,
    group_col: str | None = None,
    max_groups: int | None = None,
) -> None:
    """Persist (b, group_col, max_groups) on first contact; refuse
    disagreeing callers — a grouped register table and a global one are
    DIFFERENT sketches even at the same b, and a different group cap
    silently changes which domains are refused. ``_SUCCESS``-gated
    probe and single-writer contract as the CMS/DDSketch metas; metas
    written before an optional column existed read it as None."""
    from .state import meta_committed

    meta_path = f"{state_dir}/hll_meta"
    if meta_committed(spark, meta_path):
        row = _meta_dict(spark, meta_path)
        got = (row["b"], row.get("group_col"), row.get("max_groups"))
        if got != (b, group_col, max_groups):
            raise ValueError(
                f"HLL state at {state_dir} was built with b={got[0]}/"
                f"group_col={got[1]!r}/max_groups={got[2]}; "
                f"got {b}/{group_col!r}/{max_groups}"
            )
    else:
        spark.createDataFrame(
            [(int(b), group_col, max_groups)],
            "b int, group_col string, max_groups int",
        ).coalesce(1).write.mode("overwrite").parquet(meta_path)


def read_distinct_count(
    spark: SparkSession, state_dir: str, b: int | None = None
) -> DataFrame:
    """Cumulative distinct-count estimate from the latest committed
    register table: one ``(n_registers, est)`` row for global state, or
    ``(grp, n_registers, est)`` per group when the state was built with
    a ``group_col`` (the shape is the durable state's own, read from
    ``hll_meta``). ``b`` defaults to the persisted build value; a
    disagreeing value raises. Raises if nothing has committed yet, and
    raises — rather than trusting a caller-supplied b against durable
    state of unknown provenance — when committed registers exist
    WITHOUT their meta (advice r14)."""
    from ..operators.sketch import hll_cardinality, hll_cardinality_grouped
    from .state import committed_versions, meta_committed

    versions = committed_versions(spark, state_dir, _HLL_PFX)
    if not versions:
        raise ValueError(f"no committed registers under {state_dir}")
    meta_path = f"{state_dir}/hll_meta"
    if not meta_committed(spark, meta_path):
        raise ValueError(
            f"no hll_meta under {state_dir} but committed registers exist — "
            "the durable state's b is unknown (partial state-dir cleanup?), "
            "so a caller-supplied b cannot be trusted against it"
        )
    row = _meta_dict(spark, meta_path)
    group_col = row.get("group_col")
    if b is None:
        b = row["b"]
    else:
        _check_or_write_hll_meta(spark, state_dir, b, group_col)
    regs = spark.read.parquet(f"{state_dir}/{_HLL_PFX}{max(versions)}")
    if group_col is None:
        return hll_cardinality(regs, b=b)
    return hll_cardinality_grouped(regs, b=b)


_TH_PFX = "theta_v"


def streaming_theta_sketch(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str = "value",
    k: int = 512,
):
    """Maintain a cumulative KMV theta sketch over a value stream — the
    SET-OPERATION member of the MG/CMS/DDSketch/HLL family (r16):
    the durable state is the k smallest distinct hashes of everything
    ever ingested, so two streams' states answer corpus-overlap
    questions (``operators.sketch.theta_intersect`` / ``theta_a_not_b``
    / ``theta_union`` over the two read sketches) with no corpus
    re-scan. The merge (k smallest distinct of committed ∪ batch,
    :func:`~..operators.sketch.theta_union`) is EXACT and IDEMPOTENT —
    the committed sketch after batch N is bit-identical to the batch
    build over everything ingested (pinned by tests/test_sketch.py) —
    and state per version is at most k rows, corpus-independent.

    Exactly-once via the family's versioned-parquet protocol:
    overwrite-idempotent versions, redelivered batches skip wholesale,
    state dir bound to its checkpoint. ``k`` persists WITH the state
    (``theta_meta``) and is validated on every batch and read — a
    sketch truncated at a different k is a different summary, so it
    raises instead (the ``cms_meta`` discipline)."""
    from ..operators.sketch import theta_sketch_table, theta_union
    from .state import bind_state_to_checkpoint, committed_versions

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    bind_state_to_checkpoint(stream.sparkSession, state_dir, checkpoint_dir)
    _check_or_write_theta_meta(stream.sparkSession, state_dir, k)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _check_or_write_theta_meta(spark, state_dir, k)
        versions = committed_versions(spark, state_dir, _TH_PFX)
        if batch_id in versions:
            return  # redelivery: this batch's sketch is already durable
        prev = [v for v in versions if v < batch_id]
        batch_sk = theta_sketch_table(batch_df, value_col, k)
        if prev:
            committed = spark.read.parquet(f"{state_dir}/{_TH_PFX}{max(prev)}")
            merged = theta_union(committed, batch_sk, k)
        else:
            merged = batch_sk
        merged.write.mode("overwrite").parquet(f"{state_dir}/{_TH_PFX}{batch_id}")

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _check_or_write_theta_meta(
    spark: SparkSession, state_dir: str, k: int
) -> None:
    """Persist k on first contact; refuse disagreeing callers — the
    k-truncation IS the sketch's identity. ``_SUCCESS``-gated probe
    (half-written metas self-heal) and single-writer contract as the
    CMS/DDSketch/HLL metas."""
    from .state import meta_committed

    meta_path = f"{state_dir}/theta_meta"
    if meta_committed(spark, meta_path):
        row = _meta_dict(spark, meta_path)
        if row["k"] != k:
            raise ValueError(
                f"theta state at {state_dir} was built with k={row['k']}; "
                f"got {k}"
            )
    else:
        spark.createDataFrame([(int(k),)], "k int").coalesce(1).write.mode(
            "overwrite"
        ).parquet(meta_path)


def read_theta_sketch(spark: SparkSession, state_dir: str) -> DataFrame:
    """The latest committed cumulative sketch (``(h)``, <= k rows) —
    feed it to the batch set-operation estimators (``theta_union`` /
    ``theta_intersect`` / ``theta_a_not_b`` / ``theta_distinct``) with
    the k returned by the persisted meta. Raises if nothing has
    committed yet, and raises — rather than trusting caller context
    against durable state of unknown provenance — when committed
    sketches exist WITHOUT their meta."""
    from .state import committed_versions, meta_committed

    versions = committed_versions(spark, state_dir, _TH_PFX)
    if not versions:
        raise ValueError(f"no committed sketch under {state_dir}")
    if not meta_committed(spark, f"{state_dir}/theta_meta"):
        raise ValueError(
            f"no theta_meta under {state_dir} but committed sketches exist "
            "— the durable state's k is unknown (partial state-dir "
            "cleanup?)"
        )
    return spark.read.parquet(f"{state_dir}/{_TH_PFX}{max(versions)}")


def read_theta_distinct(spark: SparkSession, state_dir: str) -> DataFrame:
    """Cumulative distinct-count estimate from the latest committed
    sketch: one ``(n_kept, est)`` row, k from the persisted meta."""
    from ..operators.sketch import theta_distinct

    sketch = read_theta_sketch(spark, state_dir)
    k = _meta_dict(spark, f"{state_dir}/theta_meta")["k"]
    return theta_distinct(sketch, k=k)


_SAMP_PFX = "sample_v"


def streaming_theta_sample(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str = "value",
    k: int = 512,
):
    """Maintain a cumulative bottom-k uniform sample of DISTINCT values
    over a stream (``operators.sketch.theta_sample``'s twin): the
    durable state is the k smallest distinct hashes WITH their values —
    a reproducible uniform-without-replacement draw from the distinct
    domain of everything ever ingested ("show me 512 random distinct
    urls seen so far"), whose ``h`` column is simultaneously the theta
    sketch (feed :func:`read_theta_sample` output to the batch set-op
    estimators directly). The merge (k smallest distinct of committed ∪
    batch, values riding their hashes) is EXACT and IDEMPOTENT — the
    committed sample after batch N is bit-identical to the batch
    ``theta_sample`` over everything ingested (pinned) — and state per
    version is at most k rows, corpus-independent.

    Exactly-once via the family's versioned-parquet protocol; ``k``
    persists in ``sample_meta`` and is validated on every batch and
    read (the ``theta_meta`` discipline)."""
    from ..operators.sketch import theta_sample
    from .state import bind_state_to_checkpoint, committed_versions

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    bind_state_to_checkpoint(stream.sparkSession, state_dir, checkpoint_dir)
    _check_or_write_sample_meta(stream.sparkSession, state_dir, k)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _check_or_write_sample_meta(spark, state_dir, k)
        versions = committed_versions(spark, state_dir, _SAMP_PFX)
        if batch_id in versions:
            return  # redelivery: this batch's sample is already durable
        prev = [v for v in versions if v < batch_id]
        batch_s = theta_sample(batch_df, value_col, k)
        if prev:
            committed = spark.read.parquet(f"{state_dir}/{_SAMP_PFX}{max(prev)}")
            merged = (
                committed.unionByName(batch_s)
                .dropDuplicates(["h"])
                .orderBy("h")
                .limit(k)
            )
        else:
            merged = batch_s
        merged.write.mode("overwrite").parquet(
            f"{state_dir}/{_SAMP_PFX}{batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _check_or_write_sample_meta(
    spark: SparkSession, state_dir: str, k: int
) -> None:
    """The ``theta_meta`` discipline for the sample state: persist k on
    first contact, refuse disagreement, ``_SUCCESS``-gated self-heal."""
    from .state import meta_committed

    meta_path = f"{state_dir}/sample_meta"
    if meta_committed(spark, meta_path):
        row = _meta_dict(spark, meta_path)
        if row["k"] != k:
            raise ValueError(
                f"sample state at {state_dir} was built with k={row['k']}; "
                f"got {k}"
            )
    else:
        spark.createDataFrame([(int(k),)], "k int").coalesce(1).write.mode(
            "overwrite"
        ).parquet(meta_path)


def read_theta_sample(spark: SparkSession, state_dir: str) -> DataFrame:
    """The latest committed cumulative sample ``(h, value)`` (<= k
    rows). Raises if nothing has committed, or when committed versions
    exist WITHOUT their meta (unknown provenance)."""
    from .state import committed_versions, meta_committed

    versions = committed_versions(spark, state_dir, _SAMP_PFX)
    if not versions:
        raise ValueError(f"no committed sample under {state_dir}")
    if not meta_committed(spark, f"{state_dir}/sample_meta"):
        raise ValueError(
            f"no sample_meta under {state_dir} but committed samples exist "
            "— the durable state's k is unknown (partial state-dir "
            "cleanup?)"
        )
    return spark.read.parquet(f"{state_dir}/{_SAMP_PFX}{max(versions)}")
