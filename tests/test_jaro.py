"""Jaro-Winkler verify tier (operators/linkage.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.linkage import (
    _jaro_winkler_py,
    jaro_winkler_udf,
    phonetic_jw_pairs,
)

PAIRS = [
    ("MARTHA", "MARHTA"),
    ("DIXON", "DICKSONX"),
    ("DWAYNE", "DUANE"),
    ("JELLYFISH", "SMELLYFISH"),
    ("CRATE", "TRACE"),
    ("ab", "ba"),
    ("a", ""),
    ("", ""),
    ("abcdefgh", "abzzzzzz"),  # below the 0.7 boost threshold
    ("same", "same"),
    ("prefixmatch", "prefixmatch2"),
    ("x", "x"),
    ("aaaaaa", "aaa"),
]


def test_scalar_goldens():
    assert _jaro_winkler_py("MARTHA", "MARHTA") == pytest.approx(
        0.9611111111111111
    )
    assert _jaro_winkler_py("DIXON", "DICKSONX") == pytest.approx(
        0.8133333333333332
    )
    assert _jaro_winkler_py("DWAYNE", "DUANE") == pytest.approx(0.84)
    assert _jaro_winkler_py("ab", "ba") == 0.0
    assert _jaro_winkler_py("", "") == 0.0
    # no boost below the threshold despite the 2-char common prefix
    assert _jaro_winkler_py("abcdefgh", "abzzzzzz") == pytest.approx(0.5)


def test_matches_duckdb_native():
    """Two independent implementations of the spec agree to 1e-12 on
    every ASCII golden and edge case. (Non-ASCII diverges by design:
    DuckDB scores UTF-8 BYTES, this module scores codepoints — see
    test_unicode_is_codepoint_based.)"""
    con = duckdb.connect()
    for a, b in PAIRS:
        la = "'" + a.replace("'", "''") + "'"
        lb = "'" + b.replace("'", "''") + "'"
        (duck,) = con.sql(
            f"SELECT jaro_winkler_similarity({la}, {lb})"
        ).fetchone()
        assert _jaro_winkler_py(a, b) == pytest.approx(duck, abs=1e-12), (
            a,
            b,
        )


def test_udf_and_nulls(spark):
    df = spark.createDataFrame(
        [("MARTHA", "MARHTA"), (None, "x"), ("x", None)],
        "a string, b string",
    )
    jw = jaro_winkler_udf()
    got = df.select(jw("a", "b").alias("jw")).collect()
    assert got[0]["jw"] == pytest.approx(0.9611111111111111)
    assert got[1]["jw"] is None and got[2]["jw"] is None


def test_phonetic_jw_pipeline(spark):
    df = spark.createDataFrame(
        [
            (1, "Robert"),
            (2, "Rupert"),     # same block, jw 0.78 — dropped at 0.85
            (3, "Roberts"),    # same block as Robert, jw ~0.97 — kept
            (4, "Jackson"),
            (5, "Jakson"),     # same block, high jw — kept
            (6, None),
        ],
        "id long, name string",
    )
    out = {
        (r["id_a"], r["id_b"]): r["jw"]
        for r in phonetic_jw_pairs(df, "id", "name", 0.85).collect()
    }
    assert set(out) == {(1, 3), (4, 5)}
    assert out[(1, 3)] >= 0.85 and out[(4, 5)] >= 0.85


def test_unicode_is_codepoint_based():
    # one accented-vs-plain substitution in 7 codepoints; DuckDB's
    # byte-based scorer sees 9-vs-8 bytes and scores lower (0.9190)
    assert _jaro_winkler_py("Ünïcode", "Ünicode") == pytest.approx(
        0.9238095238095239
    )
