"""Forecast baselines and trend extraction over ordered series.

The evaluation half of the time-series wing (gap filling → anomaly →
THIS): before anyone ships a forecasting model over pipeline metrics,
the seasonal-naive baseline ("tomorrow looks like yesterday") sets the
bar, and a least-squares trend says whether a series is drifting at
all. Both are closed-form window/aggregate math — no iteration, no
Python, and an oracle can replay every operand.

Numerics: the trend's normal equations are computed over bucket
indexes SHIFTED to each series' own origin (an exact integer shift) —
raw hour-from-2000 indexes are ~2·10⁵, and ``n·Σx² − (Σx)²`` on those
loses ~10 digits to cancellation; shifted x ∈ [0, range] keeps every
intermediate well-conditioned. Stated identically in the oracle.

Scale shape: seasonal-naive is one per-series lag window; the trend is
one hash aggregate of five sums per series. Nothing scans twice and
nothing shuffles payloads — both shuffle on the series key only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["seasonal_naive_eval", "linear_trend"]


def seasonal_naive_eval(
    df: DataFrame,
    series_cols: list[str],
    order_col: str,
    value_col: str,
    season: int,
) -> DataFrame:
    """Per-series error of the seasonal-naive forecast
    ``v̂(t) = v(t − season)`` (by ROW offset over ``order_col`` — run
    it on a dense grid, e.g. a `gapfill_series` output, so row offset
    IS time offset).

    Returns one row per series: ``n_eval`` (points with a
    season-behind reference), ``mae``, ``rmse``, and ``mape`` (over
    the nonzero-actual subset only, the standard dodge around MAPE's
    zero-division; ``n_mape`` counts them).
    """
    if season < 1:
        raise ValueError("season must be >= 1")
    w = Window.partitionBy(*series_cols).orderBy(order_col)
    v = F.col(value_col).cast("double")
    pred = F.lag(v, season).over(w)
    err = v - pred
    scored = df.select(
        *series_cols,
        v.alias("_v"),
        err.alias("_e"),
    ).filter(F.col("_e").isNotNull())
    return scored.groupBy(*series_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.avg(F.abs(F.col("_e"))).alias("mae"),
        F.sqrt(F.avg(F.col("_e") * F.col("_e"))).alias("rmse"),
        F.avg(
            F.when(
                F.col("_v") != 0.0, F.abs(F.col("_e")) / F.abs(F.col("_v"))
            )
        ).alias("mape"),
        F.sum((F.col("_v") != 0.0).cast("long")).cast("long").alias(
            "n_mape"
        ),
    )


def linear_trend(
    df: DataFrame,
    series_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Per-series least-squares line ``v ≈ intercept + slope·x`` over
    ``order_col`` (numeric), plus ``r2``.

    ``x`` is shifted to each series' own minimum before the normal
    equations (exact integer/float subtraction — see module
    docstring); the reported ``intercept`` is at the series' FIRST
    point (x′ = 0), which is also the natural anchor for drift
    reporting. Series with fewer than 2 points, or zero x- or
    y-variance, report NULL slope/r2 (a vertical or degenerate fit).
    """
    x0 = F.min(F.col(order_col)).over(Window.partitionBy(*series_cols))
    base = df.select(
        *series_cols,
        (F.col(order_col).cast("double") - x0.cast("double")).alias("_x"),
        F.col(value_col).cast("double").alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    agg = base.groupBy(*series_cols).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    n = F.col("_n")
    dxx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    dyy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    dxy = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    slope = F.when((n >= 2) & (dxx > 0), dxy / dxx)
    intercept = F.when(
        slope.isNotNull(),
        (F.col("_sy") - slope * F.col("_sx")) / n,
    )
    r2 = F.when(
        slope.isNotNull() & (dyy > 0), (dxy * dxy) / (dxx * dyy)
    )
    return agg.select(
        *series_cols,
        n.cast("long").alias("n_points"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )
