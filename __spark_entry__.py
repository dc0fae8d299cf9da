"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()`` — every implemented catalog operator, (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB oracle per query where SQL-expressible.

The catalog itself lives in ``kafka_streams_task_spark.catalog`` — one
registered (fn, oracle) pair per operator from SURVEY.md §2 plus the
LLM-pipeline extensions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_task_spark.catalog import CATALOG


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's complete
    canonical topology (geohash rekey -> two-level aggregation -> per-cell
    rollup -> enrichment join, SURVEY §7.2) on the events/customer tables."""
    from kafka_streams_task_spark.catalog.pipeline import weather_topology_full

    return weather_topology_full(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return {name: spec.fn for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every query in queries() — since r2 ALL
    50 entries carry a value-checking oracle (approximate/seeded operators
    are gated through SQL-stateable invariants computed in the same plan:
    planted-pair recall counts, recall-vs-brute-force floors, conservation
    laws); raw outputs of the seeded algorithms additionally keep property
    tests in tests/."""
    return {name: spec.oracle for name, spec in CATALOG.items() if spec.oracle is not None}
