"""Salting and bucketing helpers: correctness + the plan properties they
exist for (no single hot reducer / no exchange on bucketed joins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_salted_agg_matches_plain(spark):
    from kafka_streams_task_spark.operators.skew import salted_agg

    # 90% of rows on one hot key
    rows = [("hot", float(i % 7)) for i in range(900)] + [
        (f"k{i}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    plain = {
        (r.k): (r.s, r.n, r.mx)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k): (r.s, r.n, r.mx)
        for r in salted_agg(
            df, ["k"], {"s": ("sum", "v"), "n": ("count", "v"), "mx": ("max", "v")}
        ).collect()
    }
    assert salted == plain


def test_explode_salt_join_matches_plain(spark):
    from kafka_streams_task_spark.operators.skew import explode_salt_join

    big = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(10)], ["k", "i"]
    )
    small = spark.createDataFrame([("hot", "H"), ("cold", "C"), ("never", "N")], ["k", "tag"])
    plain = big.join(small, on="k").groupBy("k", "tag").count().collect()
    salted = explode_salt_join(big, small, on="k").groupBy("k", "tag").count().collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Same-bucketed tables must join without a shuffle exchange."""
    from kafka_streams_task_spark.operators.skew import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df_a = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a")
        )
        df_b = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b")
        )
        write_bucketed(df_a, "bk_a", "k", 8, sort_col="k")
        write_bucketed(df_b, "bk_b", "k", 8, sort_col="k")
        joined = spark.table("bk_a").join(spark.table("bk_b"), on="k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_salted_agg_layout_independent(spark):
    """The content-hash salt must assign every row the same salt regardless
    of physical partitioning, so salted plans are repartition-stable like
    the rest of the engine (F.rand(seed) was only partition-deterministic:
    the same row drew a different salt after a repartition)."""
    from kafka_streams_task_spark.operators.skew import _content_salt

    rows = [("hot", float(i)) for i in range(200)] + [(f"k{i}", float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, ["k", "v"])
    a = df.repartition(3).select("k", "v", _content_salt(df, 16, None).alias("s"))
    b = df.repartition(11, "k").select("k", "v", _content_salt(df, 16, None).alias("s"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # and the hot key actually spreads over many salts
    n_salts = a.filter(F.col("k") == "hot").select("s").distinct().count()
    assert n_salts >= 8
