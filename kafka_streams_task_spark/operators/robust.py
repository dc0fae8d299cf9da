"""Robust per-group scaling: winsorization and median/MAD z-scores.

The data-cleaning primitives a quality pipeline runs before any
mean/variance statistic is trusted: clip tails at per-group exact
quantiles (winsorize), and standardize against median/MAD — estimators
with a 50% breakdown point, where mean/std break at a single planted
outlier (Huber & Ronchetti 2009, ch. 1).

Both are two-pass relational shapes: one exact-percentile aggregate
per group (Spark's ``percentile`` — the same ``p·(n−1)`` linear
interpolation DuckDB's ``quantile_cont`` states, an equivalence the
relational catalog's stats suite already gates), then a join of
the per-group cut table back onto the rows (|groups| rows — AQE
broadcasts it when small; the hint is deliberately NOT forced, a
wide group key must not be pushed onto the driver). MAD needs
one extra round trip (|v − median| is itself percentiled), so robust
scaling is two aggregate passes — still nothing but hash aggregates
and broadcast joins, no windows, no sort of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["winsorize_by_group", "robust_scale_by_group"]

#: Phi^-1(0.75): scales MAD to estimate sigma under normality
MAD_TO_SIGMA = 1.4826022185056018


def _valid(df: DataFrame, group_cols: list[str], value_col: str):
    cond = F.col(value_col).isNotNull()
    for c in group_cols:
        cond = cond & F.col(c).isNotNull()
    return df.filter(cond)


def winsorize_by_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    output_col: str = "winsorized",
) -> DataFrame:
    """Append ``output_col`` = ``value_col`` clipped to its group's
    exact [lower, upper] quantiles (type-7 interpolation). Rows with
    NULL value or group key drop (no group, no cut)."""
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError("need 0 <= lower < upper <= 1")
    clash = {"_lo", "_hi", output_col} & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with the "
            "winsorizer's output/working columns — rename them first"
        )
    base = _valid(df, group_cols, value_col)
    cuts = base.groupBy(*group_cols).agg(
        F.percentile(F.col(value_col), F.lit(float(lower))).alias("_lo"),
        F.percentile(F.col(value_col), F.lit(float(upper))).alias("_hi"),
    )
    return (
        base.join(cuts, group_cols, "inner")
        .withColumn(
            output_col,
            F.least(
                F.greatest(F.col(value_col).cast("double"), F.col("_lo")),
                F.col("_hi"),
            ),
        )
        .drop("_lo", "_hi")
    )


def robust_scale_by_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    output_col: str = "robust_z",
    scaled: bool = True,
) -> DataFrame:
    """Append ``output_col`` = ``(v − median) / (MAD·1.4826)`` per
    group (the normal-consistent robust z; ``scaled=False`` divides by
    the raw MAD). Zero-MAD groups (a majority-constant group has no
    robust scale) yield NULL — flagging there is the caller's policy,
    exactly like the rolling scorer's zero-std convention."""
    clash = {"_med", "_mad", output_col} & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with the scaler's "
            "output/working columns — rename them first"
        )
    base = _valid(df, group_cols, value_col)
    med = base.groupBy(*group_cols).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("_med")
    )
    with_med = base.join(med, group_cols, "inner")
    mad = with_med.groupBy(*group_cols).agg(
        F.percentile(
            F.abs(F.col(value_col).cast("double") - F.col("_med")),
            F.lit(0.5),
        ).alias("_mad")
    )
    denom = F.col("_mad") * F.lit(MAD_TO_SIGMA) if scaled else F.col("_mad")
    return (
        with_med.join(mad, group_cols, "inner")
        .withColumn(
            output_col,
            F.when(
                F.col("_mad") > 0,
                (F.col(value_col).cast("double") - F.col("_med")) / denom,
            ),
        )
        .drop("_med", "_mad")
    )
