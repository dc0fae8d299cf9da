"""SQL-surface registration: expose the engine's custom scalar functions to
``spark.sql`` users.

The reference engine is API-only (Java topology builders); a Spark-first
engine should serve SQL users too. Column-expression functions (geohash,
text metrics) register as SQL temp functions; pure-expression compositions
that Spark can't register directly are exposed as the equivalent SQL via
``F.expr``-compatible column builders in their own modules.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .geohash import geohash_udf


def register_sql_functions(spark: SparkSession, precision: int = 4) -> None:
    """Register the engine's custom scalar functions for ``spark.sql``:

    - ``geohash(lat, lng)`` — base-32 geohash at ``precision`` chars
      (vectorized numpy pandas_udf; the codegen-native ``geohash_expr``
      stays the DataFrame-API hot path — SQL callers get the Arrow batch
      path, still never row-at-a-time Python).
    """
    spark.udf.register("geohash", geohash_udf(precision))
