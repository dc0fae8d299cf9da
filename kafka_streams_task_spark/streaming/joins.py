"""Watermarked stream-stream interval join.

The reference joins a stream only against a TABLE (stream-table lookup,
`WeatherHotelsApp.java:134-142`); joining two LIVE streams — "every
purchase to the clicks of the same user within the preceding hour" — is
the missing half of the join surface, and it is exactly where Spark's
Structured Streaming model does real work: both sides buffer in state,
and the event-time range condition plus the two watermarks let the
engine PROVE when buffered rows can never match again and evict them
(unbounded-state joins are refused for outer modes by Spark itself).

This module is one declarative construction used for BOTH batch and
streaming frames: on batch inputs the same call is a per-key band join
(the equivalence tests pin stream == batch row-for-row on in-order
data); on streams it compiles to StreamingSymmetricHashJoin with state
watermarks derived from the range condition.

Semantics:
- pair (l, r) joins iff ``l.key == r.key`` and ``r.ts`` is within
  ``[l.ts + lower_s, l.ts + upper_s]`` seconds (bounds inclusive;
  negative bounds look backward: clicks-before-purchase is
  ``lower_s=-3600, upper_s=0``);
- right columns come back prefixed (default ``r_``) so self-joins and
  shared schemas never collide;
- rows later than their side's watermark are dropped from state
  consideration per Structured Streaming's contract — the stream twin
  of the batch join only matches the batch result for data whose
  disorder stays inside the watermark delays.

Scale shape: one shuffle per side on the join key; state per key is
bounded by (watermark delay + interval width) x arrival rate, evicted
by the engine. No Python stages.

Reference provenance: SURVEY §2.4 lists stream-stream joins absent
from the reference; beyond-reference streaming surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]

_HOWS = ("inner", "left_outer", "right_outer", "full_outer")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    left_watermark: str = "10 minutes",
    right_watermark: str = "10 minutes",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join ``left`` and ``right`` on ``key`` where ``right_ts`` lies in
    ``[left_ts + lower_s, left_ts + upper_s]`` (seconds, inclusive).

    Works on two streams (watermarks applied here; the range condition
    is written directly on the two event-time columns so Spark derives
    state-eviction watermarks from it), on two batch frames (watermarks
    are no-ops; the call becomes a keyed band join — the batch twin),
    and on mixed stream/batch (stream-static join; Spark ignores the
    static side's watermark)."""
    if how not in _HOWS:
        raise ValueError(f"how must be one of {_HOWS}, got {how!r}")
    if lower_s > upper_s:
        raise ValueError(f"lower_s={lower_s} > upper_s={upper_s}")
    # r12 (ADVICE r11): the join condition references unqualified
    # F.col(right_prefix + name) — an empty prefix or a left column that
    # already carries a prefixed right name would make those references
    # ambiguous or silently bind to the LEFT side. Refuse up front.
    if not right_prefix:
        raise ValueError("right_prefix must be non-empty")
    collisions = {f"{right_prefix}{c}" for c in right.columns} & set(left.columns)
    if collisions:
        raise ValueError(
            "left columns collide with prefixed right columns (the join "
            f"condition would be ambiguous): {sorted(collisions)}; pick a "
            "different right_prefix"
        )

    lw = left.withWatermark(left_ts, left_watermark)
    rp = right.select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    )
    if rp.isStreaming:
        rp = rp.withWatermark(f"{right_prefix}{right_ts}", right_watermark)
    r_ts = F.col(f"{right_prefix}{right_ts}")
    l_ts = F.col(left_ts)
    cond = (
        (F.col(key) == F.col(f"{right_prefix}{key}"))
        & (r_ts >= l_ts + F.expr(f"INTERVAL '{int(lower_s)}' SECOND"))
        & (r_ts <= l_ts + F.expr(f"INTERVAL '{int(upper_s)}' SECOND"))
    )
    return lw.join(rp, cond, how)
