"""Privacy auditing: k-anonymity, l-diversity, suppression, generalization.

The governance pass a training-data pipeline runs before releasing a
corpus or an analytics extract: measure re-identification risk over the
quasi-identifier columns (Sweeney 2002, "k-anonymity: a model for
protecting privacy"), measure sensitive-attribute diversity inside each
equivalence class (Machanavajjhala et al. 2007, "l-diversity"), then
repair by suppression (drop rows in classes below k) or generalization
(coarsen a quasi-identifier and re-audit).

The reference repo (idavkaev/kafka-streams-task — a 2-join Kafka
topology, WeatherHotelsApp.java) has no privacy surface; this module is
a north-star extension of the engine's PII/quality wing
(`functions/text.py` PII detection operates on free text; this operates
on structured quasi-identifiers).

Scale design (the 100 TB story):
- Every audit is hash-aggregation on the quasi-identifier key — the
  shuffle carries ``(QI key, counts)``, never payload rows, and the
  class table is |distinct QI combos| << |rows|.
- l-diversity needs per-(class, sensitive value) counts first: a
  two-level aggregate (both levels map-side-combining), never a
  ``collect_set`` of sensitive values (which would ship value lists
  through the shuffle).
- Suppression joins rows against the kept-class key table — a hash
  join that Spark broadcasts automatically when the class table is
  small, null-safe on every QI column (NULL quasi-identifier values
  form their own equivalence class, matching groupBy semantics; a
  plain ``=`` join would silently drop them — see eqNullSafe note in
  the project traps).
- No windows anywhere: ``WindowExec`` over the QI key would add a
  per-partition sort the hash aggregate does not need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "equivalence_classes",
    "kanonymity_summary",
    "suppress_below_k",
    "generalize_numeric",
]


def equivalence_classes(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive: str | None = None,
) -> DataFrame:
    """Per-equivalence-class audit table.

    Groups ``df`` by the quasi-identifier columns and returns one row
    per class: the quasi columns, ``n`` (class size), and — when
    ``sensitive`` is given — ``l_distinct`` (distinct sensitive values
    in the class) and ``entropy_l`` (Shannon entropy of the sensitive
    distribution in nats; the entropy-l-diversity criterion asks for
    ``entropy_l >= ln(l)``).

    NULL quasi-identifier values group together (their own class),
    matching SQL GROUP BY; NULL sensitive values count as a value of
    their own for ``l_distinct``/entropy (a NULL sensitive attribute
    still leaks "this person's value is missing").
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if sensitive is None:
        return df.groupBy(*quasi_cols).agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
    # two-level aggregate: (class, sensitive value) counts, then per
    # class — both hash aggregates with map-side partials; NULL
    # sensitive values are made groupable/countable via an explicit
    # marker struct so count() does not skip them.
    per_value = df.groupBy(
        *quasi_cols,
        F.struct(
            F.col(sensitive).isNull().alias("is_null"),
            F.col(sensitive).alias("v"),
        ).alias("_sv"),
    ).agg(F.count(F.lit(1)).cast("double").alias("_c"))
    tot = F.sum("_c")
    return (
        per_value.groupBy(*quasi_cols)
        .agg(
            F.sum("_c").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("l_distinct"),
            # -Σ p ln p = ln(T) - Σ c ln c / T  (one pass, no p column)
            (
                F.log(tot)
                - F.try_divide(F.sum(F.col("_c") * F.log("_c")), tot)
            ).alias("entropy_l"),
        )
    )


def kanonymity_summary(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    sensitive: str | None = None,
) -> DataFrame:
    """One-row corpus-level risk summary.

    Columns: ``n_rows``, ``n_classes``, ``k_actual`` (the minimum class
    size — the dataset is k_actual-anonymous), ``classes_at_risk`` /
    ``rows_at_risk`` (classes smaller than ``k`` and the rows they
    hold), and — with ``sensitive`` — ``l_min`` (the worst class's
    distinct-l-diversity). Aggregating the class table keeps this a
    two-shuffle plan whose second shuffle carries one row per class.
    """
    classes = equivalence_classes(df, quasi_cols, sensitive=sensitive)
    at_risk = F.col("n") < F.lit(int(k))
    aggs = [
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("n").cast("long").alias("k_actual"),
        F.sum(at_risk.cast("long")).cast("long").alias("classes_at_risk"),
        F.sum(F.when(at_risk, F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_at_risk"),
    ]
    if sensitive is not None:
        aggs.append(F.min("l_distinct").cast("long").alias("l_min"))
    return classes.agg(*aggs)


def suppress_below_k(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Suppression repair: keep only rows whose equivalence class has
    at least ``k`` members. The surviving frame is k-anonymous over
    ``quasi_cols`` by construction.

    Implemented as a null-safe inner equi-join against the kept-class
    key table (broadcast when small). Aliased frames keep the
    eqNullSafe predicates real (shared-lineage column refs would
    otherwise collapse to trivially-true — project trap list).
    """
    kept = (
        equivalence_classes(df, quasi_cols)
        .filter(F.col("n") >= F.lit(int(k)))
        .select(*quasi_cols)
        .alias("_kanon_kept")
    )
    left = df.alias("_kanon_rows")
    cond = None
    for c in quasi_cols:
        p = F.col(f"_kanon_rows.{c}").eqNullSafe(F.col(f"_kanon_kept.{c}"))
        cond = p if cond is None else (cond & p)
    return left.join(kept, cond, "inner").select(
        *[F.col(f"_kanon_rows.{c}") for c in df.columns]
    )


def generalize_numeric(
    col: Column | str, width: float, anchor: float = 0.0
) -> Column:
    """Generalization helper: map a numeric quasi-identifier to its
    band index (``floor((x - anchor) / width)``). Coarsening a QI
    column this way merges equivalence classes, raising k_actual; the
    caller re-audits with the banded column in ``quasi_cols``. Pure
    codegen expression — no shuffle of its own.
    """
    c = F.col(col) if isinstance(col, str) else col
    if width <= 0:
        raise ValueError("width must be positive")
    return F.floor((c - F.lit(float(anchor))) / F.lit(float(width)))
