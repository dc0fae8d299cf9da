"""Quantile normalization across groups.

Cross-source score calibration: different sources' quality scorers
live on incomparable scales (one classifier's 0.9 is another's 0.3),
so before mixing or global thresholding, map every row's score to the
POOLED distribution's value at the row's within-group rank fraction —
after which every group's scores share one scale and per-group rank
order is preserved exactly. (The microarray-normalization classic —
Bolstad et al. 2003 — applied to corpus curation.)

Definition (type-7 / linear-interpolation quantiles, the numpy/R
default): for a row with within-group ``percent_rank`` r (ties share
the min-rank fraction), the normalized score is the pooled multiset's
interpolated order statistic at position ``p = r·(N−1)``:
``v(⌊p⌋) + (v(⌈p⌉) − v(⌊p⌋))·(p − ⌊p⌋)``.

Scale design (no per-row binary search, no global sort of the fact
table):
- the pooled distribution lives as the distinct-score prefix table
  (``evaluation.score_rank_table`` — the engine's two-level
  distributed prefix sum, never a single-task window);
- order statistics materialize by exploding each distinct score over
  its OWN cumulative interval — O(N) small (k, v) rows total, i.e.
  one integer-keyed row per pooled observation;
- each fact row then needs exactly two integer equi-joins (⌊p⌋ and
  ⌈p⌉) against that table — shuffle-hash/broadcast territory, no
  range join, no BNLJ;
- the only driver traffic is the single pooled-count scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["quantile_normalize"]


def quantile_normalize(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    output_col: str = "qn_score",
) -> DataFrame:
    """Append ``output_col`` — the pooled-distribution quantile at each
    row's within-group rank fraction. Rows with a NULL or NaN score or
    a NULL group key are dropped (no rank, no pool membership — and
    Spark ranks NaN above every numeric while the pooled prefix table
    excludes it, so an unfiltered NaN would distort every rank
    fraction in its group). A
    single-member group maps to the pooled minimum (percent_rank 0);
    a pooled distribution of one value maps everything to it.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    reserved = {"_k0", "_k1", "_frac", "_v0", "_v1", "_qn_lbl", output_col}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with the "
            "normalizer's output/working columns — rename them first"
        )
    from .evaluation import score_rank_table

    cond = F.col(score_col).isNotNull() & ~F.isnan(
        F.col(score_col).cast("double")
    )
    for c in group_cols:
        cond = cond & F.col(c).isNotNull()
    valid = df.filter(cond)

    pooled = score_rank_table(
        valid.withColumn("_qn_lbl", F.lit(0)),
        label_col="_qn_lbl",
        score_col=score_col,
    ).select("score", "n", "cum_n")
    # one bounded scalar: the pooled count (the kn_lm discount-collect
    # precedent — never a data row)
    total = pooled.agg(F.sum("n").alias("t")).collect()[0]["t"] or 0
    if total == 0:
        return valid.withColumn(output_col, F.lit(None).cast("double"))

    order_stats = pooled.select(
        F.explode(
            F.sequence(
                F.col("cum_n"), F.col("cum_n") + F.col("n") - F.lit(1)
            )
        ).alias("_k"),
        F.col("score").alias("_v"),
    )

    wg = Window.partitionBy(*group_cols).orderBy(score_col)
    r = F.percent_rank().over(wg)
    p = r * F.lit(float(total - 1))
    ranked = valid.select(
        "*",
        F.floor(p).cast("long").alias("_k0"),
        F.least(F.floor(p).cast("long") + 1, F.lit(total - 1)).alias(
            "_k1"
        ),
        (p - F.floor(p)).alias("_frac"),
    )
    lo = order_stats.select(
        F.col("_k").alias("_k0"), F.col("_v").alias("_v0")
    )
    hi = order_stats.select(
        F.col("_k").alias("_k1"), F.col("_v").alias("_v1")
    )
    out = (
        ranked.join(lo, "_k0", "inner")
        .join(hi, "_k1", "inner")
        .withColumn(
            output_col,
            F.col("_v0")
            + (F.col("_v1") - F.col("_v0")) * F.col("_frac"),
        )
        .drop("_k0", "_k1", "_frac", "_v0", "_v1")
    )
    return out
