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

__all__ = ["rolling_zscore", "cusum_by_series"]


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


def cusum_by_series(
    df: DataFrame,
    series_cols: list[str],
    order_cols: list[str],
    value_col: str,
    slack_k: float = 0.5,
    threshold_h: float = 5.0,
    target_col: str | None = None,
) -> DataFrame:
    """Two-sided CUSUM change detection (Page 1954) per series.

    The textbook recursions ``S⁺_t = max(0, S⁺_{t-1} + (x_t − μ − k))``
    and ``S⁻_t = min(0, S⁻_{t-1} + (x_t − μ + k))`` look sequential,
    but both have the prefix-sum closed form
    ``S⁺_t = P_t − min(0, P_0..P_t)`` (resp. running max) with
    ``P_t = Σ d_i`` — so the whole detector is two window cumsums and
    two running extrema per series: pure JVM, no recursion, no Python,
    and an oracle can replay every operand.

    ``μ`` is the per-series target: ``target_col`` when given (a
    pre-agreed reference level riding each row), else the series' own
    global mean (retrospective/offline CUSUM — the mean sees the whole
    series including any shift; for online monitoring pass a trained
    target). ``slack_k`` and ``threshold_h`` are in VALUE units (the
    σ-scaled convention divides upstream). Output appends ``cusum_pos``
    (≥ 0), ``cusum_neg`` (≤ 0) and ``is_shift``
    (``cusum_pos > h`` or ``cusum_neg < −h``).
    """
    if slack_k < 0 or threshold_h <= 0:
        raise ValueError("slack_k must be >= 0 and threshold_h > 0")
    clash = {
        "cusum_pos", "cusum_neg", "is_shift",
        "_cusum_pp", "_cusum_pn", "_cusum_mu",
    } & {c.lower() for c in df.columns}
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with the detector's "
            "output/working columns — rename them first"
        )
    # NULL series keys drop in BOTH target modes (the own-mean join
    # would drop them silently while target_col mode kept them —
    # review catch); NULL values stay: aggregates skip their terms, so
    # they occupy positions without moving the cumsum
    keycond = F.lit(True)
    for c in series_cols:
        keycond = keycond & F.col(c).isNotNull()
    df = df.filter(keycond)
    v = F.col(value_col).cast("double")
    if target_col is not None:
        mu = F.col(target_col).cast("double")
        base = df
    else:
        means = df.groupBy(*series_cols).agg(
            F.avg(v).alias("_cusum_mu")
        )
        base = df.join(means, series_cols, "inner")
        mu = F.col("_cusum_mu")
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # windows cannot nest in one projection — materialize the prefix
    # sums, then take their running extrema in a second projection
    staged = base.select(
        "*",
        F.sum(v - mu - F.lit(float(slack_k))).over(w).alias("_cusum_pp"),
        F.sum(v - mu + F.lit(float(slack_k))).over(w).alias("_cusum_pn"),
    )
    s_pos = F.col("_cusum_pp") - F.least(
        F.lit(0.0), F.min("_cusum_pp").over(w)
    )
    s_neg = F.col("_cusum_pn") - F.greatest(
        F.lit(0.0), F.max("_cusum_pn").over(w)
    )
    out = staged.select(
        "*",
        s_pos.alias("cusum_pos"),
        s_neg.alias("cusum_neg"),
        F.coalesce(
            (
                (s_pos > F.lit(float(threshold_h)))
                | (s_neg < F.lit(-float(threshold_h)))
            ).cast("int"),
            F.lit(0),  # all-NULL prefix: no evidence, no alarm
        ).alias("is_shift"),
    ).drop("_cusum_pp", "_cusum_pn")
    if target_col is None:
        out = out.drop("_cusum_mu")
    return out
