"""The r6 oracle-side hardening has novel code of its own — the
from-scratch Myers/Hyyro bit-parallel edit-distance recursive CTE and
the canary-row generator — so pin THEM, not just the Spark operators
they check. Pure DuckDB + Python (no Spark session; runs in
milliseconds)."""

from __future__ import annotations

import random

import duckdb
import pytest

from kafka_streams_task_spark.catalog.llm_suites import (
    _CANARY_LONGS,
    _SUITE_COLS,
    _canary_rows,
    _myers_editdist_ctes,
    canary_sql,
)


def _wagner_fischer(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def _myers_all_pairs(texts: list[str], max_k: int, prefix_len: int):
    """Run the suite's recursive CTE over a literal documents relation;
    returns {(ia, ib): d} for all pairs the length-window admits."""
    con = duckdb.connect()
    rows = ", ".join(
        f"({i}, '" + t.replace("'", "''") + "')" for i, t in enumerate(texts)
    )
    con.sql(f"CREATE VIEW documents AS SELECT * FROM (VALUES {rows}) AS t(doc_id, text)")
    out = con.sql(
        f"WITH RECURSIVE {_myers_editdist_ctes(max_k, prefix_len)} SELECT ia, ib, d FROM edd"
    ).fetchall()
    return {(ia, ib): d for ia, ib, d in out}


def test_myers_cte_matches_wagner_fischer_random():
    """Cell-for-cell agreement with the classic DP on a collision-prone
    alphabet, including empty strings and length-1 edges."""
    rng = random.Random(42)
    texts = [""] + [
        "".join(rng.choice("ab c") for _ in range(rng.randint(1, 12)))
        for _ in range(40)
    ]
    got = _myers_all_pairs(texts, max_k=12, prefix_len=12)
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = texts[i][:12], texts[j][:12]
            expected = _wagner_fischer(a, b)
            assert got[(i, j)] == expected, (a, b, got[(i, j)], expected)


def test_myers_cte_unicode_codepoints():
    """Distances count CODEPOINTS (matching Spark's levenshtein), not
    bytes — the suspected DuckDB-builtin drift the CTE exists to avoid."""
    texts = ["héllo", "hello", "日本語です", "日本語だよ", "naïve", "naive"]
    got = _myers_all_pairs(texts, max_k=12, prefix_len=12)
    assert got[(0, 1)] == 1  # é -> e is ONE edit, not two bytes
    assert got[(2, 3)] == 2
    assert got[(4, 5)] == 1


def test_myers_length_window_is_sound():
    """Pairs outside the |len diff| <= k window are absent, and every
    absent pair really has distance > k (d >= |la - lb|)."""
    texts = ["a", "abcdefgh", "abcd"]
    got = _myers_all_pairs(texts, max_k=3, prefix_len=12)
    assert (0, 1) not in got  # len diff 7 > 3: pruned
    assert _wagner_fischer("a", "abcdefgh") == 7 > 3  # prune was sound
    assert (1, 2) not in got  # len diff 4 > 3: pruned
    assert _wagner_fischer("abcdefgh", "abcd") == 4 > 3  # prune was sound


def test_myers_length_window_boundary():
    texts = ["abcd", "abcdefg"]  # len diff exactly 3
    got = _myers_all_pairs(texts, max_k=3, prefix_len=12)
    assert got[(0, 1)] == 3


def test_canary_sql_equals_python_rows():
    """The DuckDB canary branch and the Spark createDataFrame branch are
    generated from the same row table — prove the SQL side reproduces it
    exactly (types included: BIGINTs stay integral, 2^53+1 unharmed)."""
    con = duckdb.connect()
    df = con.sql(canary_sql(_SUITE_COLS)).fetchall()
    assert sorted(map(tuple, df)) == sorted(map(tuple, _canary_rows(_SUITE_COLS)))
    assert any(v == 9007199254740993 for row in df for v in row if isinstance(v, int)), (
        "the 2^53+1 float-detector value must survive"
    )


def test_canary_covers_required_type_classes():
    vals = _CANARY_LONGS
    assert None in vals and 0 in vals
    assert any(v is not None and v < 0 for v in vals)
    assert any(v is not None and v > 2**53 for v in vals)


@pytest.mark.parametrize("bad", [["x"], [("key", "string")]])
def test_canary_first_column_must_be_long(bad):
    """Contract guard: the generator assumes the first payload column is
    the long row id."""
    if bad == ["x"]:
        with pytest.raises(Exception):
            _canary_rows([tuple(bad)])
    else:
        rows = _canary_rows(bad)  # type: ignore[arg-type]
        # first payload value is the row index regardless of declared kind
        assert [r[1] for r in rows] == list(range(5))
