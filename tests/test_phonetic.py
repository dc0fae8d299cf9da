"""Soundex phonetic keys (functions/phonetic.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.functions.phonetic import (
    soundex_candidates,
    soundex_expr,
    soundex_sql,
)

#: the US-Census / NARA canonical examples
GOLDENS = {
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",
    "Ashcroft": "A261",
    "Tymczak": "T522",
    "Pfister": "P236",
    "Honeyman": "H555",
    "Jackson": "J250",
    "Washington": "W252",
    "Lee": "L000",
    "Gutierrez": "G362",
    "VanDeusen": "V532",
}


def test_goldens(spark):
    df = spark.createDataFrame(
        [(w,) for w in GOLDENS], "name string"
    ).select("name", soundex_expr("name").alias("sdx"))
    got = {r["name"]: r["sdx"] for r in df.collect()}
    assert got == GOLDENS


def test_degenerate_inputs(spark):
    rows = [("",), ("123",), (None,), ("  ",), ("O'Brien",), ("H",)]
    df = spark.createDataFrame(rows, "name string").select(
        "name", soundex_expr("name").alias("sdx")
    )
    got = {r["name"]: r["sdx"] for r in df.collect()}
    assert got[""] is None and got["123"] is None
    assert got[None] is None and got["  "] is None
    assert got["O'Brien"] == "O165"  # punctuation stripped
    assert got["H"] == "H000"


def test_sql_twin_parity(spark):
    """The DuckDB replay chain produces the identical code for every
    golden, every degenerate, and a scatter of real words."""
    words = (
        list(GOLDENS)
        + ["", "123", "O'Brien", "H", "aqua", "blanched", "chocolate",
           "Schwarzenegger", "Wu", "Hw", "yellow", "PUFF", "xylophone"]
    )
    df = spark.createDataFrame([(w,) for w in words], "name string")
    spark_got = {
        r["name"]: r["sdx"]
        for r in df.select(
            "name", soundex_expr("name").alias("sdx")
        ).collect()
    }
    con = duckdb.connect()
    for w in words:
        lit = "'" + w.replace("'", "''") + "'"
        (duck,) = con.sql(
            f"SELECT {soundex_sql(lit)}"
        ).fetchone()
        assert duck == spark_got[w], f"{w!r}: duck={duck} spark={spark_got[w]}"


def test_candidates_block_and_order(spark):
    df = spark.createDataFrame(
        [
            (1, "Robert"),
            (2, "Rupert"),
            (3, "Ashcraft"),
            (4, "Ashcroft"),
            (5, "Jackson"),
            (6, None),
        ],
        "id long, name string",
    )
    got = {
        (r["id_a"], r["id_b"], r["soundex"])
        for r in soundex_candidates(df, "id", "name").collect()
    }
    assert got == {(1, 2, "R163"), (3, 4, "A261")}
