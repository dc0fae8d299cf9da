"""Declarative data-quality expectations (Deequ-lite).

Before a 100 TB ingest feeds the pipeline, the batch must prove basic
contracts: columns complete, keys unique, values in domain. This
operator turns a rule set into ONE aggregate pass over the data — every
predicate becomes a ``sum(cast(violation as long))`` running in the same
partial+final hash aggregate, so a 40-rule report costs exactly one scan
and one 1-row-per-nothing shuffle (plus one optional distinct-count pass
for uniqueness rules, which no single-agg trick avoids exactly).

Rules are plain SQL predicate strings (or Columns) asserting what GOOD
rows satisfy — the report counts rows where the predicate is false or
null (a null predicate result means the row could not satisfy it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectation_report(
    df: DataFrame,
    rules: dict[str, "Column | str"],
    unique_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """``(rule, n_rows, n_violations, pass)`` — one row per rule.

    ``rules``: rule name -> predicate GOOD rows satisfy; violations =
    rows where it evaluates false OR null. All predicate rules fuse into
    a single aggregate pass.

    ``unique_keys``: rule name -> column list that must be unique;
    violations = n_rows - n_distinct(key) (0 ⇔ unique). Each uniqueness
    rule is one exact distinct count — a real shuffle per rule, priced
    separately from the fused predicate pass by design (at crawl scale,
    prefer one uniqueness rule on the primary key; approximate variants
    belong in the HLL toolkit, catalog/llm.py approx_aggregates).
    """
    preds = {
        name: (F.expr(p) if isinstance(p, str) else p) for name, p in rules.items()
    }
    out = None
    if preds:
        aggs = [F.count(F.lit(1)).alias("_n")] + [
            F.coalesce(
                F.sum(
                    F.when(
                        F.coalesce(pred.cast("boolean"), F.lit(False)), F.lit(0)
                    ).otherwise(F.lit(1))
                ),
                F.lit(0),
            ).alias(f"_v_{i}")
            for i, pred in enumerate(preds.values())
        ]
        row = df.agg(*aggs)
        # unpivot the ONE aggregated row via stack — a union of per-rule
        # selects reads nicer but Catalyst re-derives the aggregate per
        # union branch (each with its own pruned scan): k rules would
        # cost k scans instead of one
        pairs = ", ".join(
            f"'{name.replace(chr(39), chr(39) * 2)}', _v_{i}"
            for i, name in enumerate(preds)
        )
        out = row.select(
            F.expr(f"stack({len(preds)}, {pairs}) AS (rule, n_violations)"),
            F.col("_n").alias("n_rows"),
        ).select("rule", "n_rows", "n_violations")
    for name, cols in (unique_keys or {}).items():
        u = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols])).alias(
                "n_violations"
            ),
        ).select(F.lit(name).alias("rule"), "n_rows", "n_violations")
        out = u if out is None else out.unionByName(u)
    assert out is not None, "no rules given"
    return out.select(
        "rule", "n_rows", "n_violations",
        (F.col("n_violations") == 0).cast("int").alias("pass"),
    )


def enforce_expectations(
    df: DataFrame,
    rules: dict[str, "Column | str"],
) -> DataFrame:
    """The row-level companion: KEEP only rows satisfying every rule —
    the quarantine filter after :func:`expectation_report` triage. One
    fused filter (a conjunction of the same predicates), map-only."""
    keep = F.lit(True)
    for p in rules.values():
        pred = F.expr(p) if isinstance(p, str) else p
        keep = keep & F.coalesce(pred.cast("boolean"), F.lit(False))
    return df.filter(keep)


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile — ``(column, n_rows, n_nulls, n_distinct_approx,
    min, max)`` with min/max as strings (one schema fits every type) and
    the distinct count HLL-approximate (the only exact alternative is one
    shuffle per column; the exact path for a SPECIFIC column is an
    ``expectation_report`` uniqueness rule).

    The whole profile is ONE aggregate pass (same stack-unpivot shape as
    :func:`expectation_report` — k columns, one scan), making "profile
    the new shard before it enters the pipeline" a map-side-combined
    O(scan) job at any width."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nl_{i}"),
            F.approx_count_distinct(c).alias(f"_nd_{i}"),
            F.min(c).cast("string").alias(f"_mn_{i}"),
            F.max(c).cast("string").alias(f"_mx_{i}"),
        ]
    row = df.agg(*aggs)
    quads = ", ".join(
        f"'{c.replace(chr(39), chr(39) * 2)}', _nl_{i}, _nd_{i}, _mn_{i}, _mx_{i}"
        for i, c in enumerate(cols)
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {quads}) AS (column, n_nulls, n_distinct_approx, min, max)"
        ),
        F.col("_n").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "n_distinct_approx", "min", "max")


def corpus_summary(
    df: DataFrame,
    *,
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """The dataset-card numbers (r6): one row per (group...) with doc
    count, exact char mass, whitespace-token mass, and approximate
    length quantiles — what a corpus release publishes per language /
    source slice, and what a mixing run reads to set temperature rates.

    One partial+final aggregate over one scan (token counts are
    ``size(split(...))`` — no explode, no Python); quantiles via the
    percentile_approx sketch (mergeable, bounded memory at any group
    cardinality). Output is one row per group — bounded driver data.
    """
    from ..functions.text import tokens

    n_tok = F.size(tokens(F.col(text_col)))
    return (
        df.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length(text_col).cast("long")).alias("n_chars"),
            F.sum(n_tok.cast("long")).alias("n_tokens"),
            F.min(n_tok).alias("min_tokens"),
            F.max(n_tok).alias("max_tokens"),
            F.percentile_approx(n_tok, [0.5, 0.9, 0.99]).alias("_q"),
        )
        .select(
            *group_cols,
            "n_docs",
            "n_chars",
            "n_tokens",
            "min_tokens",
            "max_tokens",
            F.element_at("_q", 1).alias("p50_tokens"),
            F.element_at("_q", 2).alias("p90_tokens"),
            F.element_at("_q", 3).alias("p99_tokens"),
        )
    )
