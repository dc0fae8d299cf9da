"""Gopher repetition signals + exact-substring span dedup.

Hand-computed goldens over multi-line docs (the driver corpus is
single-line, so the line/paragraph mechanics are only exercised here),
plus cross-doc coverage and degenerate-input behavior.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.functions.text import (
    GOPHER_REPETITION_THRESHOLDS,
    gopher_repetition_columns,
)
from kafka_streams_task_spark.operators.dedup import duplicate_span_stats

DOC0 = "a b c d e f g h\na b c d e f g h\nunique line here\n\npara one\n\npara one"
LOOP = "the cat sat on the mat the cat sat on the mat the cat sat"
TEN = "one two three four five six seven eight nine ten"


@pytest.fixture(scope="module")
def rep_rows(spark):
    df = spark.createDataFrame(
        [(0, DOC0), (1, LOOP), (2, "x"), (3, ""), (4, TEN), (5, TEN)],
        ["doc_id", "text"],
    )
    out = df.select("doc_id", *gopher_repetition_columns(F.col("text")))
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_dup_line_and_para_fractions(rep_rows):
    r = rep_rows[0]
    # 7 lines, 4 distinct ("a b..h" x2, "" x2, "para one" x2, unique) -> 3/7
    assert r["dup_line_frac"] == pytest.approx(3 / 7, abs=1e-6)
    # excess chars: 15 ("a b c d e f g h") + 0 ("") + 8 ("para one") = 23 / 68
    assert r["dup_line_char_frac"] == pytest.approx(23 / 68, abs=1e-6)
    # paragraphs (split \n{2,}): [block, "para one", "para one"] -> 1/3
    assert r["dup_para_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert r["dup_para_char_frac"] == pytest.approx(8 / 68, abs=1e-6)


def test_top_ngram_char_fraction(rep_rows):
    # doc 0: max 2-gram count is 2, smallest such gram is "a b" (3 chars)
    assert rep_rows[0]["top2gram_char_frac"] == pytest.approx(6 / 68, abs=1e-6)
    # a doc with no repeating 2-gram scores 0 (count-1 top grams don't fire)
    assert rep_rows[4]["top2gram_char_frac"] == 0.0
    # single-token doc: no 2-gram at all (whole-text shingle fallback guarded)
    assert rep_rows[2]["top2gram_char_frac"] == 0.0


def test_dup_ngram_excess_mass_and_clamp(rep_rows):
    # doc 0: 5-grams repeated via the duplicated first line: 4 grams x 9 chars
    assert rep_rows[0]["dup5gram_char_frac"] == pytest.approx(36 / 68, abs=1e-6)
    # looping doc: overlapping excess mass exceeds the doc -> clamped to 1.0
    assert rep_rows[1]["dup5gram_char_frac"] == 1.0
    # no 10-gram repeats anywhere
    assert all(rep_rows[i]["dup10gram_char_frac"] == 0.0 for i in rep_rows)


def test_repetition_pass_flag(rep_rows):
    assert rep_rows[0]["repetition_pass"] == 0  # fails dup_line/dup5 rules
    assert rep_rows[1]["repetition_pass"] == 0  # fails top2/dup5 rules
    assert rep_rows[3]["repetition_pass"] == 1  # empty doc: all stats 0
    assert rep_rows[4]["repetition_pass"] == 1  # clean unique prose


def test_thresholds_cover_emitted_stats(rep_rows):
    emitted = set(rep_rows[0]) - {"doc_id", "repetition_pass"}
    assert emitted <= set(GOPHER_REPETITION_THRESHOLDS)


def test_table_form_matches_column_form(spark, rep_rows):
    # the factored gopher_repetition_table (r16 planning optimization)
    # must stay bit-identical to the single-projection column form
    from kafka_streams_task_spark.functions.text import gopher_repetition_table

    df = spark.createDataFrame(
        [(0, DOC0), (1, LOOP), (2, "x"), (3, ""), (4, TEN), (5, TEN)],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_repetition_table(df, "text").collect()}
    assert got == rep_rows


def test_duplicate_span_stats_cross_doc(spark):
    df = spark.createDataFrame(
        [(0, DOC0), (1, LOOP), (2, "x"), (3, ""), (4, TEN), (5, TEN)],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in duplicate_span_stats(df, span_n=4).collect()}
    # doc 0 (within-doc): "a b c d e f g h" twice -> both 8-token runs covered
    assert out[0]["n_tokens"] == 23 and out[0]["n_dup_tokens"] == 16
    # looping doc: every position inside a repeated 4-gram
    assert out[1]["n_dup_tokens"] == out[1]["n_tokens"] == 15
    # shorter than span_n -> no spans possible
    assert out[2]["n_dup_tokens"] == 0 and out[3]["n_dup_tokens"] == 0
    # exact cross-doc duplicates: full coverage on BOTH copies
    assert out[4]["n_dup_tokens"] == 10 and out[5]["n_dup_tokens"] == 10
    assert out[4]["dup_span_frac"] == 1.0


def test_duplicate_span_stats_partial_overlap(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "iota kappa alpha beta gamma delta lam mu nu xi"
    df = spark.createDataFrame([(0, a), (1, b)], ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in duplicate_span_stats(df, span_n=4).collect()}
    # shared 4-gram "alpha beta gamma delta": tokens 0-3 of a, 2-5 of b
    assert out[0]["n_dup_tokens"] == 4
    assert out[1]["n_dup_tokens"] == 4
    assert out[0]["dup_span_frac"] == pytest.approx(0.5, abs=1e-6)


# ---------------------------------------------------------------------------
# Property tests: the sorted-run array aggregates vs Counter references
# ---------------------------------------------------------------------------

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_task_spark.functions.text import _excess_char_mass, _top_value_run

values = st.lists(st.text(alphabet="abz", max_size=3), max_size=12)


@settings(max_examples=8, deadline=None)
@given(arrs=st.lists(values, min_size=1, max_size=4))
def test_excess_char_mass_matches_counter(spark, arrs):
    df = spark.createDataFrame(list(enumerate(arrs)), "i long, arr array<string>")
    got = {r["i"]: r["m"] for r in df.select("i", _excess_char_mass(F.col("arr")).alias("m")).collect()}
    for i, arr in enumerate(arrs):
        want = sum((c - 1) * len(v) for v, c in Counter(arr).items() if c >= 2)
        assert got[i] == want, (arr, got[i], want)


@settings(max_examples=8, deadline=None)
@given(arrs=st.lists(values, min_size=1, max_size=4))
def test_top_value_run_matches_counter(spark, arrs):
    df = spark.createDataFrame(list(enumerate(arrs)), "i long, arr array<string>")
    out = df.select("i", _top_value_run(F.col("arr")).alias("t")).collect()
    got = {r["i"]: (r["t"]["cnt"], r["t"]["val"]) for r in out}
    for i, arr in enumerate(arrs):
        if not arr:
            assert got[i] == (0, None)
            continue
        cnt = Counter(arr)
        best = max(cnt.values())
        # tie-break: count DESC, value ASC
        val = min(v for v, c in cnt.items() if c == best)
        assert got[i] == (best, val), (arr, got[i], (best, val))


def test_remove_duplicate_spans_keeps_first_occurrence(spark):
    from kafka_streams_task_spark.operators.dedup import remove_duplicate_spans

    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "iota kappa alpha beta gamma delta lam mu nu xi"
    df = spark.createDataFrame([(0, a), (1, b), (2, a)], ["doc_id", "text"])
    out = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicate_spans(df, span_n=4).collect()
    }
    # doc 0 is the global first occurrence of every duplicated span: intact
    assert out[0]["text"] == a and out[0]["n_removed_tokens"] == 0
    # doc 1 loses only the shared 4-gram's tokens (positions 2-5)
    assert out[1]["text"] == "iota kappa lam mu nu xi"
    assert out[1]["n_removed_tokens"] == 4
    # doc 2 (exact copy of doc 0) is fully covered by kept-elsewhere spans
    assert out[2]["text"] == "" and out[2]["n_removed_tokens"] == 8


def test_remove_duplicate_spans_within_doc(spark):
    from kafka_streams_task_spark.operators.dedup import remove_duplicate_spans

    # the 4-gram "a b c d" repeats inside one doc: first occurrence stays
    doc = "a b c d x y z w a b c d"
    df = spark.createDataFrame([(0, doc)], ["doc_id", "text"])
    (r,) = remove_duplicate_spans(df, span_n=4).collect()
    assert r["text"] == "a b c d x y z w"
    assert r["n_removed_tokens"] == 4


def test_remove_duplicate_spans_no_dups_identity(spark):
    from kafka_streams_task_spark.operators.dedup import remove_duplicate_spans

    df = spark.createDataFrame(
        [(0, "p q r s t u v w"), (1, "h i j k l m n o")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r.asDict() for r in remove_duplicate_spans(df, span_n=4).collect()}
    assert out[0]["text"] == "p q r s t u v w"
    assert out[1]["n_removed_tokens"] == 0
