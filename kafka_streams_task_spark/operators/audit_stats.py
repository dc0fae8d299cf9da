"""Statistical data-quality audits: Benford digit test, chi-square
contingency test.

Two screening tests an ingestion pipeline runs over suspicious numeric
or categorical feeds:

- **Benford's law** (Newcomb 1881, Benford 1938): naturally-occurring
  multi-scale magnitudes put first digit d at frequency
  ``log10(1 + 1/d)``; fabricated or truncated feeds don't. The audit
  reports the observed first-digit distribution and the chi-square
  distance to Benford.
- **Chi-square independence** (Pearson 1900) between two categorical
  columns: observed vs ``row·col/N`` expected counts, the statistic,
  and the degrees of freedom. (The p-value needs the incomplete gamma
  — deliberately out: the statistic and dof are the distributable
  part; any caller can finish with scipy. Keeping the engine output
  closed-form keeps the oracle exact.)

Scale shape: each audit is one or two hash aggregates over its
key(s) — output bounded by 9 digits (Benford) or |A|×|B| categories
(chi-square; the marginals join back broadcast). Nothing else moves.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..schemas import local_table

__all__ = ["benford_audit", "chi_square_contingency"]

#: Benford expected first-digit probabilities, d = 1..9
BENFORD_P = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def benford_audit(
    df: DataFrame, value_col: str
) -> DataFrame:
    """First-digit distribution of ``|value|`` vs Benford.

    Rows with NULL, zero, NaN, or infinite values are excluded (no
    first significant digit). Returns one row per digit 1..9:
    ``digit, n, frac, expected, chi2_term`` —
    ``Σ chi2_term`` is the 8-dof Pearson statistic against Benford.
    Digits with zero observations still appear (their term is
    ``N·p_d``). The first digit comes from string formatting of the
    absolute value (strip sign/zeros/dot — exact for every finite
    double, no log10 edge cases at powers of ten).
    """
    v = F.col(value_col).cast("double")
    ok = (
        v.isNotNull()
        & ~F.isnan(v)
        & (v != 0.0)
        & (F.abs(v) != float("inf"))
    )
    # format_number-free route: cast abs to string, strip '0.', '.',
    # take the first char in '1'..'9'. Doubles print in scientific
    # form for tiny/huge magnitudes (e.g. 1.0E-7) — the mantissa's
    # first digit is still the leading char after cleanup.
    s = F.regexp_replace(
        F.abs(v).cast("string"), r"[^1-9]", ""
    )
    digit = F.substring(s, 1, 1).cast("int")
    counted = (
        df.filter(ok)
        .select(digit.alias("digit"))
        .filter(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    digits = local_table(
        df.sparkSession,
        [(d, BENFORD_P[d]) for d in range(1, 10)],
        "digit int, expected double",
    )
    total = F.sum("n").over(Window.partitionBy())
    out = (
        digits.join(counted, "digit", "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0).cast("long")))
    )
    # total over the 9-row digit table — a 9-row unpartitioned window
    # is bounded by construction, not a scale concern
    out = out.withColumn("_t", total.cast("double"))
    exp_n = F.col("_t") * F.col("expected")
    return out.select(
        "digit",
        "n",
        F.try_divide(F.col("n").cast("double"), F.col("_t")).alias(
            "frac"
        ),
        "expected",
        F.try_divide(
            (F.col("n").cast("double") - exp_n)
            * (F.col("n").cast("double") - exp_n),
            exp_n,
        ).alias("chi2_term"),
    )


def chi_square_contingency(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Observed-vs-expected contingency table between two categorical
    columns plus the Pearson chi-square machinery.

    Returns one row per observed (a, b) cell:
    ``a, b, n, expected, chi2_term`` — ``Σ chi2_term`` is the
    statistic with ``(|A|−1)·(|B|−1)`` dof over the OBSERVED cells
    (absent cells contribute 0 observed but nonzero expected; callers
    needing the dense-grid statistic cross-join the marginals — kept
    out of the default to avoid manufacturing |A|×|B| rows at scale).
    NULL categories are excluded.
    """
    base = df.filter(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
    cells = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ra = base.groupBy("a").agg(F.count(F.lit(1)).cast("double").alias("_ra"))
    rb = base.groupBy("b").agg(F.count(F.lit(1)).cast("double").alias("_rb"))
    tot = base.agg(F.count(F.lit(1)).cast("double").alias("_t"))
    out = (
        cells.join(ra, "a")
        .join(rb, "b")
        .crossJoin(F.broadcast(tot))  # 1 row — the quantile-gate shape
    )
    expected = F.col("_ra") * F.col("_rb") / F.col("_t")
    return out.select(
        "a",
        "b",
        "n",
        expected.alias("expected"),
        (
            (F.col("n").cast("double") - expected)
            * (F.col("n").cast("double") - expected)
            / expected
        ).alias("chi2_term"),
    )
