"""Registry for catalog queries.

A query is a callable ``(spark, sf_dir) -> DataFrame`` plus (optionally) the
equivalent DuckDB SQL the driver runs as correctness oracle. Column names
must match between the two — the driver sorts columns by name before hashing
values (driver contract, __spark_entry__.py docstring).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => non-SQL-expressible (rows-only check)


CATALOG: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Register a catalog query under ``name`` with an optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in CATALOG:
            raise ValueError(f"duplicate catalog query: {name}")
        CATALOG[name] = QuerySpec(fn=fn, oracle=oracle)
        return fn

    return deco
