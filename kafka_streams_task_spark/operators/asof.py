"""As-of join: for each left row, the latest right row with
right.on <= left.on (backward), the earliest with >= (forward), or the
closest in either direction (nearest, r12) — within the same key group.

Absent from both the reference and Spark's builtins (SURVEY §2.4 'absent').
Implementation is the sort-based union-window formulation, entirely
JVM-side: tag both inputs, union them, and carry the last (first) non-null
right payload across the per-key event-time order with a window frame.
One shuffle + sort on (key, time), whole-stage codegen, no Python — scales
like any window aggregate and beats the cogrouped pandas ``merge_asof``
formulation by ~an order of magnitude on many-small-groups data (per-group
Arrow framing dominates that path).

Tie semantics: among right rows sharing (by, on), the carried one is the
last in sort order (matching ``pd.merge_asof``); dedupe the right side per
(by, on) first for fully deterministic output. Null ``on`` values on the
right sort first (Spark default) and thus only ever match as "earliest".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    right_prefix: str = "r_",
    tolerance: float | None = None,
) -> DataFrame:
    """Backward/forward/nearest as-of join (left-join semantics: unmatched
    left rows keep nulls on the right side). ``nearest`` (r12) picks the
    closer of the backward and forward candidates, ties to backward —
    ``pd.merge_asof`` parity pinned by the random cross-check; with a
    tolerance the bound is the symmetric |left.on − right.on| <= tolerance.

    Output: all left columns + each right column (except ``by``) renamed
    with ``right_prefix``.

    ``tolerance`` (r11, the ``pd.merge_asof`` parameter): maximum
    allowed |left.on − matched right.on|, INCLUSIVE — a match farther
    away reverts the row to nulls. Numeric ``on`` columns compare
    directly; TIMESTAMP/TIMESTAMP_NTZ columns treat ``tolerance`` as
    SECONDS via interval arithmetic (never an epoch double cast —
    NTZ→double is ANSI-blocked and zone-dependent); DATE columns treat
    it as whole DAYS via ``datediff`` (r12, ADVICE r11 — the raw
    date−date subtraction yields an INTERVAL that cannot compare
    against a double). Any other ``on`` type with a tolerance raises
    ``ValueError`` up front rather than failing at analysis time.
    Applied as a post-projection on the carried payload, so the plan
    shape (one shuffle + one window) is unchanged.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction}"
        )
    if tolerance is not None and not tolerance >= 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")
    if tolerance is not None and not isinstance(
        left.schema[on].dataType,
        (T.TimestampType, T.TimestampNTZType, T.DateType, T.NumericType),
    ):
        raise ValueError(
            "tolerance supports numeric, timestamp, and date `on` columns; "
            f"got {left.schema[on].dataType.simpleString()} for {on!r}"
        )
    if (
        tolerance is not None
        and isinstance(left.schema[on].dataType, T.DateType)
        and float(tolerance) != int(tolerance)
    ):
        # the whole-DAYS contract: datediff is integral, so a fractional
        # tolerance would silently floor (2.5 behaving as 2) — reject it
        # up front instead (ADVICE r12).
        raise ValueError(
            f"tolerance for DATE `on` columns counts whole days; got {tolerance}"
        )

    right_cols = [c for c in right.columns if c != by]
    l_payload = F.struct(*[F.col(c) for c in left.columns if c != by])
    r_payload = F.struct(*[F.col(c) for c in right_cols])

    if direction == "nearest":
        # nearest (r12, completing the pd.merge_asof surface): two right
        # copies ride ONE union — a backward channel (_rb) and a forward
        # channel (_rf) — so both candidates come out of a single shuffle
        # + sort with two window frames over the same ordering. Side tags
        # encode exact-match inclusivity per channel: the backward frame
        # (preceding..current) sees same-timestamp rights iff they sort
        # BEFORE the left row, the forward frame (current..following) iff
        # they sort AFTER — allow_exact_matches flips both. Ties in
        # distance prefer the backward candidate (pd.merge_asof).
        rb_side = 0 if allow_exact_matches else 2
        rf_side = 2 if allow_exact_matches else 0
        r_struct = T.StructType([right.schema[c] for c in right_cols])
        l_struct = T.StructType(
            [left.schema[c] for c in left.columns if c != by]
        )
        null_r = F.lit(None).cast(r_struct)
        null_l = F.lit(None).cast(l_struct)
        l_tag = left.select(
            F.col(by).alias("_k"), F.col(on).alias("_t"),
            l_payload.alias("_l"), null_r.alias("_rb"), null_r.alias("_rf"),
            F.lit(1).alias("_side"),
        )
        rb_tag = right.select(
            F.col(by).alias("_k"), F.col(on).alias("_t"),
            null_l.alias("_l"), r_payload.alias("_rb"), null_r.alias("_rf"),
            F.lit(rb_side).alias("_side"),
        )
        rf_tag = right.select(
            F.col(by).alias("_k"), F.col(on).alias("_t"),
            null_l.alias("_l"), null_r.alias("_rb"), r_payload.alias("_rf"),
            F.lit(rf_side).alias("_side"),
        )
        u = l_tag.unionByName(rb_tag).unionByName(rf_tag)
        order = Window.partitionBy("_k").orderBy(
            F.col("_t").asc(), F.col("_side").asc()
        )
        wb = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wf = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        matched = (
            u.withColumn("_b", F.last("_rb", ignorenulls=True).over(wb))
            .withColumn("_f", F.first("_rf", ignorenulls=True).over(wf))
            .filter(F.col("_side") == 1)
        )
        lt, bt, ft = F.col("_t"), F.col(f"_b.{on}"), F.col(f"_f.{on}")
        choose_b = F.col("_f").isNull() | (
            F.col("_b").isNotNull() & ((lt - bt) <= (ft - lt))
        )
        matched = matched.withColumn(
            "_match", F.when(choose_b, F.col("_b")).otherwise(F.col("_f"))
        )
        if tolerance is not None:
            rt = F.col(f"_match.{on}")
            if isinstance(
                left.schema[on].dataType, (T.TimestampType, T.TimestampNTZType)
            ):
                iv = F.expr(f"INTERVAL '{float(tolerance)}' SECOND")
                ok = (rt >= lt - iv) & (rt <= lt + iv)
            elif isinstance(left.schema[on].dataType, T.DateType):
                ok = F.abs(F.datediff(lt, rt)) <= F.lit(float(tolerance))
            else:
                ok = F.abs(lt - rt) <= F.lit(float(tolerance))
            matched = matched.withColumn("_match", F.when(ok, F.col("_match")))
        return _asof_project(matched, left, by, right_prefix, right_cols)

    l_tagged = left.select(
        F.col(by).alias("_k"),
        F.col(on).alias("_t"),
        l_payload.alias("_l"),
        F.lit(None).cast(
            T.StructType([right.schema[c] for c in right_cols])
        ).alias("_r"),
        F.lit(1).alias("_side"),
    )
    # side ordering encodes match inclusivity: the right row must fall
    # inside the left row's window frame iff it is allowed to match at
    # equal timestamps.
    exact = allow_exact_matches == (direction == "backward")
    r_side = 0 if exact else 2
    r_tagged = right.select(
        F.col(by).alias("_k"),
        F.col(on).alias("_t"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        r_payload.alias("_r"),
        F.lit(r_side).alias("_side"),
    )
    u = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("_r", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_side").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = F.first("_r", ignorenulls=True).over(w)

    matched = u.withColumn("_match", carried).filter(F.col("_side") == 1)
    if tolerance is not None:
        lt, rt = F.col("_t"), F.col(f"_match.{on}")
        if isinstance(
            left.schema[on].dataType, (T.TimestampType, T.TimestampNTZType)
        ):
            iv = F.expr(f"INTERVAL '{float(tolerance)}' SECOND")
            ok = (rt >= lt - iv) if direction == "backward" else (rt <= lt + iv)
        elif isinstance(left.schema[on].dataType, T.DateType):
            # tolerance counts whole DAYS for DATE on-columns
            delta = (
                F.datediff(lt, rt) if direction == "backward" else F.datediff(rt, lt)
            )
            ok = delta <= F.lit(float(tolerance))
        else:
            delta = (lt - rt) if direction == "backward" else (rt - lt)
            ok = delta <= F.lit(float(tolerance))
        matched = matched.withColumn("_match", F.when(ok, F.col("_match")))
    return _asof_project(matched, left, by, right_prefix, right_cols)


def _asof_project(
    matched: DataFrame,
    left: DataFrame,
    by: str,
    right_prefix: str,
    right_cols: list,
) -> DataFrame:
    """Shared output projection of every direction: unpack the left
    payload, prefix the carried right columns, restore the caller's
    left column order."""
    left_out = [F.col("_k").alias(by)] + [
        F.col(f"_l.{c}").alias(c) for c in left.columns if c != by
    ]
    right_out = [
        F.col(f"_match.{c}").alias(f"{right_prefix}{c}") for c in right_cols
    ]
    out = matched.select(*left_out, *right_out)
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"{right_prefix}{c}") for c in right_cols],
    )
