"""Relational operator catalog over the driver test tables.

The reference itself exercises only map/groupBy/aggregate/join
(SURVEY.md §2.7 lists everything absent), but the engine ships the full
relational surface as Spark built-ins; these queries are the tested,
oracle-checked catalog of that surface. Float aggregates are rounded in BOTH
engines so cross-engine summation-order ULP noise can't flip the value hash.

Scale notes are per-query docstrings: the physical plan each is designed to
produce at 100 TB (broadcast vs shuffle, partial aggregation, pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schemas import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation family
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round((sum(l_quantity)) + 1e-05, 2)                                       AS sum_qty,
           round((sum(l_extendedprice)) + 1e-05, 2)                                  AS sum_base_price,
           round((sum(l_extendedprice * (1 - l_discount))) + 1e-05, 2)               AS sum_disc_price,
           round((avg(l_quantity)) + 1e-07, 4)                                       AS avg_qty,
           round((avg(l_extendedprice)) + 1e-07, 4)                                  AS avg_price,
           round((avg(l_discount)) + 1e-09, 6)                                       AS avg_disc,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filter -> hash agg. Plan: parquet scan with pushed
    shipdate filter, partial+final HashAggregate on 6 groups — the scan
    dominates; at 100 TB only the 4 needed columns are read."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round((F.sum("l_quantity")) + 1e-05, 2).alias("sum_qty"),
            F.round((F.sum("l_extendedprice")) + 1e-05, 2).alias("sum_base_price"),
            F.round((F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))) + 1e-05, 2).alias("sum_disc_price"),
            F.round((F.avg("l_quantity")) + 1e-07, 4).alias("avg_qty"),
            F.round((F.avg("l_extendedprice")) + 1e-07, 4).alias("avg_price"),
            F.round((F.avg("l_discount")) + 1e-09, 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_stats_by_flag",
    oracle="""
    SELECT l_returnflag,
           count(*)                          AS n_rows,
           count(DISTINCT l_partkey)         AS n_parts,
           round((min(l_quantity)) + 1e-05, 2)         AS min_qty,
           round((max(l_quantity)) + 1e-05, 2)         AS max_qty,
           round((avg(l_extendedprice)) + 1e-07, 4)    AS avg_price,
           round((stddev_samp(l_quantity)) + 1e-07, 4) AS sd_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/count/countDistinct/stddev — the agg family the reference
    lacks (SURVEY §2.3 'absent'). countDistinct expands to a two-phase agg;
    everything else is partial+final."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.round((F.min("l_quantity")) + 1e-05, 2).alias("min_qty"),
        F.round((F.max("l_quantity")) + 1e-05, 2).alias("max_qty"),
        F.round((F.avg("l_extendedprice")) + 1e-07, 4).alias("avg_price"),
        F.round((F.stddev_samp("l_quantity")) + 1e-07, 4).alias("sd_qty"),
    )


@query(
    "rollup_lineitem_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           round((sum(l_quantity)) + 1e-05, 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP — hierarchical totals incl. grand total."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round((F.sum("l_quantity")) + 1e-05, 2).alias("sum_qty"),
    )


@query(
    "cube_order_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE — all grouping-set combinations."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Join family
# ---------------------------------------------------------------------------

@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round((sum(l_extendedprice * (1 - l_discount))) + 1e-05, 2) AS revenue,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> 3-way join -> agg -> top-k.
    customer is broadcast (small after the segment filter); lineitem⋈orders
    shuffles on orderkey. Top-k via orderBy+limit becomes TakeOrdered —
    no global sort at scale. Deterministic tiebreak on l_orderkey."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round((F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))) + 1e-05, 2).alias("revenue"))
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("date").cast("string").alias("orderdate"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, round((sum(l_extendedprice * (1 - l_discount))) + 1e-05, 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. region/nation/supplier/customer all
    broadcast (tiny dims); only orders⋈lineitem shuffles."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), (o.o_custkey == c.c_custkey))
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round((F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))) + 1e-05, 2).alias("revenue"))
    )


@query(
    "semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate < TIMESTAMP '1995-07-01 00:00:00')
    """,
)
def anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — customers with no orders in the first
    half of 1995 (date-bounded so the result is non-trivial at every sf)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-07-01 00:00:00").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "left_join_order_counts",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (J2 semantics on
    driver tables); count(col) skips nulls in both engines."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Sort / limit / distinct / set ops
# ---------------------------------------------------------------------------

@query(
    "top_customers_by_balance",
    oracle="""
    SELECT c_custkey, c_name, round((c_acctbal) + 1e-05, 2) AS acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 20
    """,
)
def top_customers_by_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: TakeOrdered physical op, no full sort."""
    return (
        _t(spark, sf_dir, "customer")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", F.round(F.col("c_acctbal") + 1e-05, 2).alias("acctbal"))
    )


@query(
    "distinct_segments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@query(
    "setop_nations_without_suppliers",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_nations_without_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference) — nations with no supplier (the
    supplier table covers only a subset of nations, so the result is
    non-empty at every scale factor)."""
    n = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return n.subtract(s)


@query(
    "setop_union_keys",
    oracle="""
    SELECT nationkey, count(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def setop_union_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + re-aggregation."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "setop_intersect_keys",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


# ---------------------------------------------------------------------------
# Window / analytic functions
# ---------------------------------------------------------------------------

@query(
    "window_top_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, round((o_totalprice) + 1e-05, 2) AS totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def window_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number ranking window; deterministic tiebreak on orderkey."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", F.round(F.col("o_totalprice") + 1e-05, 2).alias("totalprice"))
    )


@query(
    "window_running_user_value",
    oracle="""
    SELECT event_id,
           round((sum(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) + 1e-05, 2)
             AS running_value
    FROM events
    """,
)
def window_running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) aggregate window over event time per user."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", F.round((F.sum("value").over(w)) + 1e-05, 2).alias("running_value"))
    )


@query(
    "window_lag_value_delta",
    oracle="""
    SELECT event_id,
           round((value - lag(value, 1, 0.0) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id)) + 1e-05, 2) AS delta
    FROM events
    """,
)
def window_lag_value_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic — per-user delta vs previous event."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.round((F.col("value") - F.lag("value", 1, 0.0).over(w)) + 1e-05, 2).alias("delta"),
        )
    )


# ---------------------------------------------------------------------------
# Scalar function surface (string / date / json / math)
# ---------------------------------------------------------------------------

@query(
    "string_funcs_part",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)            AS brand_u,
           substr(p_name, 1, 8)      AS name_prefix,
           CAST(length(p_name) AS INT) AS name_len,
           concat(p_brand, '_', p_type) AS brand_type
    FROM part
    WHERE p_name LIKE '%a%'
    """,
)
def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface: upper/substr/length/concat/LIKE (F2/F3 family)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("_", "p_brand", "p_type").alias("brand_type"),
    )


@query(
    "split_key_parts",
    oracle="""
    SELECT p_partkey,
           string_split(p_type, ' ')[1] AS type_head,
           CAST(len(string_split(p_type, ' ')) AS INT) AS n_tokens
    FROM part
    """,
)
def split_key_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: split + index (the reference's key-unpack, WeatherHotelsApp.java:105),
    on driver data."""
    p = _t(spark, sf_dir, "part")
    tok = F.split(F.col("p_type"), " ")
    return p.select(
        "p_partkey",
        tok.getItem(0).alias("type_head"),
        F.size(tok).alias("n_tokens"),
    )


@query(
    "date_parts_orders",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT)  AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
           count(*) AS n_orders,
           round((sum(o_totalprice)) + 1e-05, 2) AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def date_parts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + group (beyond the reference, whose dates stay
    opaque strings — SURVEY §2.5 'absent')."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round((F.sum("o_totalprice")) + 1e-05, 2).alias("total"),
        )
    )


@query(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           round((avg(CAST(json_extract_string(props, '$.k') AS INT))) + 1e-07, 4) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/S7: JSON field extraction from a string column (the reference's
    ad-hoc readTree navigation, WeatherHotelsApp.java:72-81)."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.round((F.avg(k)) + 1e-07, 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "above_avg_balance",
    oracle="""
    SELECT c_custkey, round((c_acctbal) + 1e-05, 2) AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
)
def above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: compare to a global aggregate. Spark: the aggregate
    is a 1-row broadcast cross join — no driver-side collect."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = c.agg(F.avg("c_acctbal").alias("_avg"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .select("c_custkey", F.round(F.col("c_acctbal") + 1e-05, 2).alias("acctbal"))
    )


@query(
    "case_when_value_buckets",
    oracle="""
    SELECT CASE WHEN value < 50 THEN 'low'
                WHEN value < 200 THEN 'mid'
                ELSE 'high' END AS bucket,
           count(*) AS n,
           round((sum(value)) + 1e-05, 2) AS total
    FROM events
    GROUP BY 1
    """,
)
def case_when_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation."""
    e = _t(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 200, "mid")
        .otherwise("high")
    )
    return e.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round((F.sum("value")) + 1e-05, 2).alias("total"),
    )


# ---------------------------------------------------------------------------
# Extended join / agg / SQL surface
# ---------------------------------------------------------------------------


@query(
    "range_band_join",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('small', 0.0, 50000.0),
             ('mid', 50000.0, 200000.0),
             ('large', 200000.0, 1e18)
    )
    SELECT b.band, count(*) AS n_orders, round((sum(o_totalprice)) + 1e-05, 2) AS total
    FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a tiny literal band table — physical
    plan is BroadcastNestedLoopJoin with the band table broadcast; at any
    scale the big side streams through once."""
    o = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("small", 0.0, 50000.0), ("mid", 50000.0, 200000.0), ("large", 200000.0, 1e18)],
        ["band", "lo", "hi"],
    )
    return (
        o.join(F.broadcast(bands), (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice") + 1e-05, 2).alias("total"),
        )
    )


@query(
    "pivot_event_type_counts",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY user_id
    """,
)
def pivot_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation). Explicit value list keeps the
    plan single-pass (no distinct-values pre-query)."""
    e = _t(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    out = e.groupBy("user_id").pivot("event_type", kinds).count()
    # pivot-count yields null for empty cells; the SQL FILTER form yields 0
    return out.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )


@query(
    "percentiles_by_flag",
    oracle="""
    SELECT l_returnflag,
           round((median(l_quantity)) + 1e-07, 4)              AS med_qty,
           round((quantile_cont(l_quantity, 0.9)) + 1e-07, 4)  AS p90_qty,
           round((quantile_cont(l_extendedprice, 0.99)) + 1e-07, 4) AS p99_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def percentiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation) — Spark ``percentile``
    == DuckDB ``quantile_cont``. The approx variant (``percentile_approx``)
    is the 100 TB path but is engine-specific, so the oracle checks the
    exact one."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.5) + 1e-07, 4).alias("med_qty"),
        F.round(F.percentile("l_quantity", 0.9) + 1e-07, 4).alias("p90_qty"),
        F.round(F.percentile("l_extendedprice", 0.99) + 1e-07, 4).alias("p99_price"),
    )


@query(
    "grouping_sets_sql",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL API (same Catalyst plan as the DataFrame
    form; exercises the engine's SQL entry point)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@query(
    "array_funcs_tokens",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents)
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(t))[1:5], ',') AS first5_sorted,
           CAST(list_contains(t, 'spark') AS INT) AS has_spark,
           array_to_string(t[1:3], ' ') AS head3
    FROM tok
    """,
)
def array_funcs_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function surface: sort/distinct/slice/contains/join (F5 family
    generalized beyond the reference's list append/remove)."""
    d = _t(spark, sf_dir, "documents")
    t = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.array_join(F.slice(F.array_sort(F.array_distinct(t)), 1, 5), ",").alias("first5_sorted"),
        F.array_contains(t, "spark").cast("int").alias("has_spark"),
        F.array_join(F.slice(t, 1, 3), " ").alias("head3"),
    )


@query(
    "q6_revenue_forecast",
    oracle="""
    SELECT round((sum(l_extendedprice * l_discount)) + 1e-05, 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-sum. Every predicate pushes to the
    parquet reader; the whole query is one codegen stage + one partial/final
    agg pair — the canonical 'scan-bound at 100 TB' query."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")) + 1e-05, 2).alias("revenue"))
    )


@query(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_returnflag,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional aggregation."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_effect",
    oracle="""
    SELECT round((100.0 * sum(CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount))) + 1e-07, 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: broadcast dim join + conditional ratio aggregate."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type").like("PROMO%"), disc).otherwise(0.0)) / F.sum(disc)
                + 1e-07,
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    SELECT c_custkey, o_orderkey, round((o_totalprice) + 1e-05, 2) AS totalprice
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN big ON o_orderkey = big.l_orderkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING subquery as a semi-join input."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q")).filter(F.col("q") > 150)
    return (
        o.join(big.select("l_orderkey"), o.o_orderkey == F.col("l_orderkey"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_custkey", "o_orderkey", F.round(F.col("o_totalprice") + 1e-05, 2).alias("totalprice"))
    )


@query(
    "regex_extract_ids",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           CAST(regexp_matches(c_name, '0{2,}') AS INT) AS has_zero_run
    FROM customer
    """,
)
def regex_extract_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface: extract + boolean match (simple patterns evaluate
    identically under Java regex and RE2)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.regexp_like(F.col("c_name"), F.lit(r"0{2,}")).cast("int").alias("has_zero_run"),
    )


@query(
    "setop_except_all_keys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT ALL
    SELECT c_custkey FROM customer
    """,
)
def setop_except_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference): order custkeys minus one occurrence per
    customer row — multiplicity-aware set op."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.exceptAll(c)


@query(
    "unpivot_order_metrics",
    oracle="""
    SELECT o_orderkey, metric, round((val) + 1e-05, 2) AS val
    FROM (
      SELECT o_orderkey, o_totalprice AS totalprice,
             CAST(o_custkey AS DOUBLE) AS custkey_num
      FROM orders WHERE o_orderkey < 100
    ) UNPIVOT (val FOR metric IN (totalprice, custkey_num))
    """,
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide -> long). Spark's unpivot == SQL UNPIVOT."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100).select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey_num"),
    )
    out = o.unpivot("o_orderkey", ["totalprice", "custkey_num"], "metric", "val")
    return out.select("o_orderkey", "metric", F.round(F.col("val") + 1e-05, 2).alias("val"))


@query(
    "corr_covar_stats",
    oracle="""
    SELECT l_returnflag,
           round((corr(l_quantity, l_extendedprice)) + 1e-07, 4)       AS corr_qty_price,
           round((covar_samp(l_quantity, l_extendedprice)) + 1e-07, 4) AS covar_qty_price,
           round((var_samp(l_discount)) + 1e-09, 6)                    AS var_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def corr_covar_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family: corr/covar/variance."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice") + 1e-07, 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice") + 1e-07, 4).alias("covar_qty_price"),
        F.round(F.var_samp("l_discount") + 1e-09, 6).alias("var_disc"),
    )


@query(
    "explode_token_freq",
    oracle="""
    SELECT tok, count(*) AS n
    FROM (SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents)
    GROUP BY tok
    HAVING count(*) >= 10
    """,
)
def explode_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral/explode shape: flatten token arrays, global term frequency."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 10)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS -> left-semi join + agg."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    semi = o.join(
        li, (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate), "left_semi"
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round((sum(l_extendedprice * (1 - l_discount))) + 1e-05, 2) AS revenue,
           n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 4-way join, agg, top-20."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 1e-05, 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT round((sum(l_extendedprice * (1 - l_discount))) + 1e-05, 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicates across the join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 50))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 1e-05, 2).alias("revenue")
    )


@query(
    "salted_agg_by_nation",
    oracle="""
    SELECT c_nationkey,
           round((sum(c_acctbal)) + 1e-05, 2) AS total_bal,
           count(*) AS n,
           round((max(c_acctbal)) + 1e-05, 2) AS max_bal
    FROM customer
    GROUP BY c_nationkey
    """,
)
def salted_agg_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-safe two-level salted aggregation (operators/skew.py) —
    results identical to a plain GROUP BY (which is exactly what the oracle
    runs); the salt only changes the physical distribution."""
    from ..operators.skew import salted_agg

    c = _t(spark, sf_dir, "customer")
    out = salted_agg(
        c,
        ["c_nationkey"],
        {"total_bal": ("sum", "c_acctbal"), "n": ("count", "c_acctbal"), "max_bal": ("max", "c_acctbal")},
        n_salts=8,
    )
    return out.select(
        "c_nationkey",
        F.round(F.col("total_bal") + 1e-05, 2).alias("total_bal"),
        "n",
        F.round(F.col("max_bal") + 1e-05, 2).alias("max_bal"),
    )


@query(
    "window_analytics_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           first_value(o_orderkey) OVER w AS first_key,
           round((cume_dist() OVER w) + 1e-09, 6) AS cdist,
           round((o_totalprice - avg(o_totalprice) OVER (PARTITION BY o_orderpriority)) + 1e-05, 2)
             AS delta_vs_priority_avg
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_analytics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window surface: ntile, first_value, cume_dist, and an
    unordered (whole-partition) aggregate window."""
    from pyspark.sql import Window as W

    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wp = W.partitionBy("o_orderpriority")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.round(F.cume_dist().over(w) + 1e-09, 6).alias("cdist"),
        F.round(F.col("o_totalprice") - F.avg("o_totalprice").over(wp) + 1e-05, 2).alias(
            "delta_vs_priority_avg"
        ),
    )


@query(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS DATE)::VARCHAR AS due_date,
           CAST(date_trunc('quarter', o_orderdate) AS DATE)::VARCHAR AS quarter_start,
           CAST(EXTRACT(dow FROM o_orderdate) AS INT) AS dow
    FROM orders WHERE o_orderkey < 200
    """,
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic surface (absent from the reference, whose
    dates stay opaque strings — SURVEY §2.5): diffs, offsets, truncation,
    day-of-week. (Spark dayofweek is 1=Sunday; DuckDB dow is 0=Sunday.)"""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.date_add(d, 90).cast("string").alias("due_date"),
        F.date_trunc("quarter", F.col("o_orderdate")).cast("date").cast("string").alias("quarter_start"),
        (F.dayofweek("o_orderdate") - F.lit(1)).alias("dow"),
    )


@query(
    "null_semantics",
    oracle="""
    SELECT e.event_id,
           coalesce(json_extract_string(e.props, '$.missing'), 'absent') AS fallback,
           CAST(e.value IS NOT DISTINCT FROM v2.value AS INT) AS nullsafe_eq,
           nullif(e.event_type, 'error') AS type_or_null
    FROM events e
    JOIN (SELECT event_id, CASE WHEN value > 250 THEN NULL ELSE value END AS value
          FROM events) v2 ON e.event_id = v2.event_id
    WHERE e.event_id < 500
    """,
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling surface: coalesce, nullif, null-safe equality
    (<=> / IS NOT DISTINCT FROM)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    v2 = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("value") > 250, None).otherwise(F.col("value")).alias("value2"),
    )
    return (
        e.join(v2, on="event_id")
        .select(
            "event_id",
            F.coalesce(F.get_json_object("props", "$.missing"), F.lit("absent")).alias("fallback"),
            F.col("value").eqNullSafe(F.col("value2")).cast("int").alias("nullsafe_eq"),
            F.nullif(F.col("event_type"), F.lit("error")).alias("type_or_null"),
        )
    )


@query(
    "string_distance",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_brand, 'Brand#11') AS INT) AS lev_to_b11,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           translate(p_brand, '#', '_') AS brand_t
    FROM part WHERE p_partkey < 100
    """,
)
def string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance + padding/translate string surface (levenshtein is the
    character-level cousin of the token-level dedup family)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        F.levenshtein("p_brand", F.lit("Brand#11")).alias("lev_to_b11"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.translate("p_brand", "#", "_").alias("brand_t"),
    )
