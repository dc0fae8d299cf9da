"""Randomized cross-engine parity for the phonetic/JW wave: one seeded
batch of random inputs through the REAL Spark expressions vs DuckDB in
single jobs (the Spark-friendly shape of a property test — hundreds of
examples, two engine invocations)."""

import random
import string

import duckdb
from pyspark.sql import functions as F

from kafka_streams_task_spark.functions.phonetic import (
    soundex_expr,
    soundex_sql,
)
from kafka_streams_task_spark.operators.linkage import (
    _jaro_winkler_py,
    jaro_winkler_udf,
)

_RNG = random.Random(0xC0FFEE)


def _rand_word(maxlen=14, alphabet=string.ascii_letters):
    n = _RNG.randint(0, maxlen)
    return "".join(_RNG.choice(alphabet) for _ in range(n))


def test_soundex_random_parity_with_duckdb(spark):
    words = [_rand_word() for _ in range(300)]
    # salt in hostile shapes: digits, punctuation, repeats, h/w runs
    words += ["h" * 7, "wwhhww", "Aaaa", "BBBB", "a1b2c3", "''--''",
              "pfpfpfpf", "hwhwhwhwx"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["sdx"]
        for r in df.select("w", soundex_expr("w").alias("sdx")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ", ".join("('" + w.replace("'", "''") + "')" for w in set(words)) +
                ") v(w)")
    duck = dict(con.sql(f"SELECT w, {soundex_sql('w')} FROM t").fetchall())
    for w in set(words):
        assert got[w] == duck[w], f"{w!r}: spark={got[w]} duck={duck[w]}"


def test_soundex_shape_invariants(spark):
    words = [_rand_word() for _ in range(200)]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    rows = df.select("w", soundex_expr("w").alias("sdx")).collect()
    import re

    for r in rows:
        has_letter = any(c.isalpha() for c in r["w"])
        if not has_letter:
            assert r["sdx"] is None, r["w"]
        else:
            assert re.fullmatch(r"[A-Z][0-9]{3}", r["sdx"]), (
                r["w"],
                r["sdx"],
            )


def test_jaro_random_parity_with_duckdb(spark):
    pairs = [
        (_rand_word(10, string.ascii_lowercase),
         _rand_word(10, string.ascii_lowercase))
        for _ in range(250)
    ]
    # near-dup shapes: transpositions, prefixes, repeats
    for w in ["martha", "pneumonia", "aaaabbbb", "xyxyxy"]:
        pairs.append((w, w))
        pairs.append((w, w[::-1]))
        pairs.append((w, w[:-1]))
    jw = jaro_winkler_udf()
    df = spark.createDataFrame(pairs, "a string, b string")
    got = {
        (r["a"], r["b"]): r["s"]
        for r in df.select("a", "b", jw("a", "b").alias("s")).collect()
    }
    con = duckdb.connect()
    for a, b in set(pairs):
        la = "'" + a.replace("'", "''") + "'"
        lb = "'" + b.replace("'", "''") + "'"
        (duck,) = con.sql(
            f"SELECT jaro_winkler_similarity({la}, {lb})"
        ).fetchone()
        assert abs(got[(a, b)] - duck) < 1e-12, (a, b, got[(a, b)], duck)
        # and the scalar reference agrees with its own UDF exactly
        assert got[(a, b)] == _jaro_winkler_py(a, b), (a, b)
