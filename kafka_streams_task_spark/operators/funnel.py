"""Ordered-event funnel analysis over an event stream.

The product-analytics shape (did the user view → click → purchase, and
when?) the reference's event topology never needed but any events table
gets asked — and, in an LLM-data setting, the same operator measures
multi-stage pipeline progression per document (crawled → cleaned →
deduped → packed) from job-event logs.

Semantics: GREEDY EARLIEST chain. ``t_1`` is the user's earliest
``steps[0]`` event; ``t_k`` is the earliest ``steps[k]`` event STRICTLY
after ``t_{k-1}``. If any completing chain exists, the greedy earliest
one exists (each greedy prefix time is minimal, so any later chain's
suffix remains admissible), so "reached stage k" is chain-order exact —
not the count-based approximation that over-counts out-of-order events.

Scale shape: stage k is one filtered partial+final min aggregate joined
to the previous stage's (user, time) table — k-1 user-keyed joins of
aggregated (one row per user) relations; the events table is scanned
per stage THROUGH ITS STAGE FILTER (predicate-pushdown-friendly;
``event_type`` partition/z-order layouts prune it to the stage's slice).
No windows, no per-user sorts, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """``(user_col, t_1 .. t_k)``: greedy-earliest chain times, null from
    the first uncompleted stage on. Users with no ``steps[0]`` event are
    absent (they never entered the funnel)."""
    assert len(steps) >= 1
    out = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(out.select(user_col, f"t_{i - 1}"), user_col)
            .filter(F.col(ts_col) > F.col(f"t_{i - 1}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{i}"))
        )
        out = out.join(nxt, user_col, "left")
    return out


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """``(user_col, stage_reached, t_final)`` per entered user:
    the furthest 1-based stage completed and its completion time."""
    times = funnel_times(events, steps, user_col, ts_col, type_col)
    k = len(steps)
    stage = F.lit(1)
    for i in range(2, k + 1):
        stage = F.when(F.col(f"t_{i}").isNotNull(), F.lit(i)).otherwise(stage)
    return times.select(
        user_col,
        stage.alias("stage_reached"),
        F.coalesce(*[F.col(f"t_{i}") for i in range(k, 0, -1)]).alias("t_final"),
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per stage: ``(stage, step, n_users)`` with n_users = users
    whose greedy chain reached that stage — the conversion curve."""
    times = funnel_times(events, steps, user_col, ts_col, type_col)
    counts = times.agg(
        *[
            F.count(F.col(f"t_{i}")).alias(f"n_{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    rows = None
    for i, step in enumerate(steps, start=1):
        r = counts.select(
            F.lit(i).alias("stage"), F.lit(step).alias("step"),
            F.col(f"n_{i}").alias("n_users"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily cohort retention: ``(cohort_date, day_offset, n_users)`` —
    users whose FIRST event fell on ``cohort_date`` and who were active
    again ``day_offset`` days later (offset 0 = the cohort's size). The
    companion curve to :func:`funnel_counts`: funnels measure conversion
    through steps, cohorts measure survival through time.

    Scale shape: one min-date aggregate (first activity), one distinct
    (user, date) projection, one user-keyed join, one final count-distinct
    by (cohort, offset) — all partial+final aggregates on bounded keys;
    no windows, no Python. Cohort granularity is the calendar DATE in the
    session timezone (the engine pins events loads to UTC —
    schemas.load_table), so offsets are whole days by construction.
    """
    d = F.to_date(F.col(ts_col))
    first = (
        events.groupBy(user_col).agg(F.min(d).alias("cohort_date"))
    )
    active = events.select(F.col(user_col), d.alias("_d")).distinct()
    return (
        active.join(first, user_col)
        .select(
            user_col,
            "cohort_date",
            F.datediff(F.col("_d"), F.col("cohort_date")).alias("day_offset"),
        )
        .groupBy("cohort_date", "day_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = "event_id",
    boundaries: bool = True,
) -> DataFrame:
    """First-order Markov transition table over per-user event
    journeys: ``(from_state, to_state, n, p)`` where ``p`` is the
    row-normalized transition probability (``n / Σ n`` over the
    ``from_state``).

    Each user's events order by ``(ts, tiebreak)`` — the tiebreak
    column is required whenever timestamps can collide, or the chain
    is nondeterministic (pass ``None`` only for known-unique
    timestamps). With ``boundaries=True`` the chain is wrapped in the
    standard ``__START__`` / ``__END__`` pseudo-states, so entry and
    exit probabilities fall out of the same table.

    Scale shape: one per-user window (``lead``) — the only shuffle is
    on the user key, then a (from, to) hash aggregate whose output is
    bounded by |state|², never the corpus. The per-from normalizer is
    a window over the tiny transition table itself.
    """
    cond = (
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
    )
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        # a NULL tiebreak makes the chain engine-dependent (Spark sorts
        # NULLs first, DuckDB last) — such rows drop with the other
        # unplaceable rows
        cond = cond & F.col(tiebreak_col).isNotNull()
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(user_col).orderBy(*order)
    seq = df.filter(cond).select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_from"),
        F.lead(type_col, 1).over(w).alias("_to"),
        F.row_number().over(w).alias("_rn"),
    )
    inner = seq.filter(F.col("_to").isNotNull()).select("_from", "_to")
    if boundaries:
        starts = seq.filter(F.col("_rn") == 1).select(
            F.lit("__START__").alias("_from"), F.col("_from").alias("_to")
        )
        ends = seq.filter(F.col("_to").isNull()).select(
            F.col("_from"), F.lit("__END__").alias("_to")
        )
        inner = inner.unionByName(starts).unionByName(ends)
    counts = inner.groupBy("_from", "_to").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wf = Window.partitionBy("_from")
    return counts.select(
        F.col("_from").alias("from_state"),
        F.col("_to").alias("to_state"),
        "n",
        (F.col("n") / F.sum("n").over(wf)).alias("p"),
    )
