"""Shared suite plumbing: cross-engine rounding + canary legs.

Moved out of ``llm_suites.py`` in r12 so ``llm.py`` (which registers
BEFORE llm_suites and therefore cannot import from it) can build folded
suites with the same canary/rounding discipline. ``llm_suites`` re-exports
every name, so existing importers (extensions, relational, tests) are
unaffected.

Cross-engine rounding: floor-based half-up, identical IEEE operation order
in both engines (floor(x*scale + eps + 0.5)); no round() builtin anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from ..schemas import local_table


def fmicro_col(col: Column, scale: float = 1e6) -> Column:
    """Spark side of the suite micro-unit conversion: ``floor(x*scale +
    1e-9 + 0.5)`` as BIGINT. The 1e-9 nudge keeps mathematically-exact
    boundary values (x*scale an exact integer or half-integer) strictly
    inside the upper bucket in both engines; ``floor`` (unlike ``round``)
    has version-stable semantics in every engine."""
    return F.floor(col * F.lit(scale) + F.lit(1e-9) + F.lit(0.5)).cast("long")


def sql_fmicro(expr: str, scale: str = "1000000.0") -> str:
    """DuckDB twin of :func:`fmicro_col` — same ops, same order."""
    return f"CAST(floor(({expr}) * {scale} + 1e-09 + 0.5) AS BIGINT)"


def sql_floor6(expr: str) -> str:
    """DuckDB twin of ``stable_round(expr, 6)`` without the ``round``
    builtin: nearest-6dp via floor. Equal to ``round(expr + 1e-9, 6)``
    for every value not within float noise of a 0.5e-6 boundary (the
    1e-9 nudge covers the systematic exact-tie cases)."""
    return f"(floor((({expr}) + 1e-09) * 1000000.0 + 0.5) / 1000000.0)"


def py_floor6(v: float) -> float:
    """Python twin of :func:`sql_floor6` (same IEEE ops/order)."""
    return math.floor((v + 1e-09) * 1000000.0 + 0.5) / 1000000.0


# ---------------------------------------------------------------------------
# Canary legs: constant rows stated identically by both engines.
# ---------------------------------------------------------------------------

#: value pools cycled per (row, column) — every output type class appears:
#: positive/negative/zero, NULL, 2^53+1 (detects silent DOUBLE-ification,
#: which maps it to 2^53), int64 extremes, empty + unicode + numeric-looking
#: strings.
_CANARY_LONGS = [
    1,
    -1,
    0,
    None,
    9007199254740993,  # 2^53 + 1: changes value under any float64 round-trip
    -4611686018427387904,
    9223372036854775807,
]
_CANARY_STRS = ["plain", "", None, "Ünïcode-✓", "5.0"]


def _canary_rows(cols: list[tuple[str, str]]) -> list[tuple]:
    """5 deterministic rows for a suite shape ``cols`` (list of
    ``(name, 'long'|'string')`` payload columns after the leading leg
    tag; the first payload column must be a long and becomes the row
    id)."""
    rows = []
    for i in range(5):
        row: list = ["canary"]
        for j, (_name, kind) in enumerate(cols):
            if j == 0:
                row.append(i)
            elif kind == "long":
                row.append(_CANARY_LONGS[(i + j) % len(_CANARY_LONGS)])
            else:
                row.append(_CANARY_STRS[(i + j) % len(_CANARY_STRS)])
        rows.append(tuple(row))
    return rows


def canary_df(spark: SparkSession, cols: list[tuple[str, str]]) -> DataFrame:
    schema = "leg string, " + ", ".join(
        f"{n} {'long' if k == 'long' else 'string'}" for n, k in cols
    )
    return local_table(spark, _canary_rows(cols), schema)


def canary_sql(cols: list[tuple[str, str]]) -> str:
    def lit(v, kind: str) -> str:
        if v is None:
            return f"CAST(NULL AS {'BIGINT' if kind == 'long' else 'VARCHAR'})"
        if kind == "long":
            return f"CAST({v} AS BIGINT)"
        return "CAST('" + str(v).replace("'", "''") + "' AS VARCHAR)"

    branches = []
    for row in _canary_rows(cols):
        sels = ["CAST('canary' AS VARCHAR) AS leg"] + [
            f"{lit(v, k)} AS {n}" for v, (n, k) in zip(row[1:], cols)
        ]
        branches.append("SELECT " + ", ".join(sels))
    return " UNION ALL ".join(branches)


def typed_canary_sql(
    rows: list[tuple], kinds: list[str], names: list[str]
) -> str:
    """Shared literal renderer for suite canary rows with an explicit SQL
    type per column (``'VARCHAR' | 'BIGINT' | 'DOUBLE'``) — one place for
    NULL casting and quote escaping instead of a per-suite copy (review
    r13: five hand-rolled generators had already drifted stylistically).
    The Spark side states the same ``rows`` via ``createDataFrame``; keep
    double literals exact binary fractions so both engines render them
    identically."""

    def lit(v, kind: str) -> str:
        if v is None:
            return f"CAST(NULL AS {kind})"
        if kind == "VARCHAR":
            return "CAST('" + str(v).replace("'", "''") + "' AS VARCHAR)"
        return f"CAST({v!r} AS {kind})"

    return " UNION ALL ".join(
        "SELECT "
        + ", ".join(f"{lit(v, k)} AS {n}" for v, k, n in zip(row, kinds, names))
        for row in rows
    )
