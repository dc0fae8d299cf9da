"""Rolling z-score anomaly detection over ordered series.

The monitoring primitive every metrics pipeline ships (and, in a
training-data setting, the drift tripwire over ingestion volumes /
quality scores per source): score each point against the mean and
standard deviation of its own TRAILING window — strictly preceding
rows only, so the anomaly cannot contaminate its own baseline and the
scorer is streamable by construction.

Numerics are stated explicitly so an oracle can replay them exactly:
mean = s/n, var = (ss − s·s/n)/(n−1), std = sqrt(greatest(var, 0)) —
never the engine's stddev aggregate (Welford-vs-naive differences
across engines would make cross-engine comparison a fiction). The
greatest() guard absorbs the tiny negative var float cancellation can
produce on near-constant windows; a zero std yields NULL z (a constant
baseline has no scale — flagging there is the caller's policy call).

Scale shape: one window over (series, order) — shuffle on the series
key only; sums/counts are O(1) per row under Spark's sliding frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rolling_zscore"]


def rolling_zscore(
    df: DataFrame,
    series_cols: list[str],
    order_cols: list[str],
    value_col: str,
    window_n: int = 24,
    min_periods: int = 12,
    threshold: float = 3.0,
) -> DataFrame:
    """Append ``baseline_n``, ``z`` and ``is_anomaly`` to ``df``.

    ``z`` is NULL until the trailing window holds ``min_periods``
    points (and whenever its std is 0); ``is_anomaly`` is
    ``|z| > threshold`` (NULL z → 0 — no baseline, no alarm).
    ``order_cols`` must be a deterministic total order per series
    (include a tiebreak column when the primary order can collide).
    """
    if window_n < 2 or min_periods < 2:
        raise ValueError("window_n and min_periods must be >= 2")
    if min_periods > window_n:
        raise ValueError("min_periods cannot exceed window_n")
    clash = {"baseline_n", "z", "is_anomaly"} & {
        c.lower() for c in df.columns
    }
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with the scorer's "
            "output columns — rename them first (resolution is "
            "case-insensitive)"
        )
    v = F.col(value_col).cast("double")
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-window_n, -1)
    )
    s = F.sum(v).over(w)
    ss = F.sum(v * v).over(w)
    n = F.count(v).over(w)
    mean = s / n
    var = (ss - s * s / n) / (n - 1)
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(
        (n >= F.lit(int(min_periods))) & (std > 0), (v - mean) / std
    )
    return df.select(
        "*",
        n.cast("long").alias("baseline_n"),
        z.alias("z"),
        F.coalesce(
            (F.abs(z) > F.lit(float(threshold))).cast("int"), F.lit(0)
        ).alias("is_anomaly"),
    )
