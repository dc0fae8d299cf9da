"""Unicode-segmentation tokenizer (functions/text.py tokens_unicode /
segment_nospace_chars) — VERDICT r10 item 2: whitespace tokenization sees
sentence-sized "tokens" on unsegmented scripts (zh/ja/th), degrading
vocab/KN-LM/BM25/shingle-dedup/Gopher. These pin the new segmentation
surface and the regression guarantee that spaced-script corpora are
byte-identical to the classic tokenizer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.functions.text import (
    segment_nospace_chars,
    tokens,
    tokens_unicode,
)


def _tok(spark, text: str, mode: str = "bigram") -> list[str]:
    return (
        spark.createDataFrame([(text,)], "t string")
        .select(tokens_unicode("t", mode=mode).alias("x"))
        .collect()[0]["x"]
    )


def test_zh_bigrams(spark):
    # Lucene CJKAnalyzer convention: run c1c2c3c4 -> c1c2, c2c3, c3c4
    assert _tok(spark, "中文文本") == ["中文", "文文", "文本"]


def test_zh_chars(spark):
    assert _tok(spark, "中文文本", mode="char") == ["中", "文", "文", "本"]


def test_singleton_run(spark):
    assert _tok(spark, "hello 世 world") == ["hello", "世", "world"]


def test_mixed_latin_cjk(spark):
    assert _tok(spark, "hello 世界 world") == ["hello", "世界", "world"]


def test_adjacency_never_spans_a_space(spark):
    # "中 文" is TWO runs: no 中文 bigram may appear
    assert _tok(spark, "中 文") == ["中", "文"]


def test_latin_boundary_isolates_runs(spark):
    # a Latin word interrupts the run: bigrams stay within each side
    assert _tok(spark, "日本abc語学") == ["日本", "abc", "語学"]


def test_ja_kana_run(spark):
    assert _tok(spark, "これはテスト") == ["これ", "れは", "はテ", "テス", "スト"]


def test_th_run_and_digit_exclusion(spark):
    # Thai letters segment; the Thai digit ๕ (U+0E55) is OUTSIDE the
    # class and stays glued to whitespace tokenization
    got = _tok(spark, "ไทย ๕")
    assert got == ["ไท", "ทย", "๕"]


def test_korean_stays_whitespace(spark):
    # Hangul uses spaces — must NOT be character-segmented
    assert _tok(spark, "한국어 텍스트") == ["한국어", "텍스트"]


def test_bad_mode_rejected(spark):
    with pytest.raises(ValueError, match="mode"):
        tokens_unicode(F.lit("x"), mode="word")


def test_whitespace_corpus_regression_identity(spark, sf_dir):
    """The load-bearing pin: on text with no no-space-script codepoints
    (the entire synthetic documents corpus), tokens_unicode equals
    tokens() array-for-array — existing vocab/LM/dedup outputs cannot
    move when a pipeline switches tokenizers."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_diff = (
        docs.select(
            (tokens_unicode("text") != tokens("text")).cast("int").alias("d")
        )
        .agg(F.sum("d").alias("n"))
        .collect()[0]["n"]
    )
    assert n_diff == 0


def test_empty_and_null_parity(spark):
    df = spark.createDataFrame([("",), ("   ",), (None,)], "t string")
    rows = df.select(
        tokens("t").alias("a"), tokens_unicode("t").alias("b")
    ).collect()
    for r in rows:
        assert r["a"] == r["b"]


def test_segment_nospace_chars_threads_downstream(spark):
    """The threading form: pre-segment once, every whitespace consumer
    sees per-char units. build_vocab over segmented zh text produces
    character types, not one sentence blob."""
    from kafka_streams_task_spark.operators.vocab import build_vocab

    docs = spark.createDataFrame(
        [(1, "中文文本"), (2, "中文 text")], "doc_id long, text string"
    )
    seg = docs.withColumn("text", segment_nospace_chars("text"))
    vocab = {r["token"]: r["count"] for r in build_vocab(seg, text_col="text").collect()}
    assert vocab["中"] == 2 and vocab["文"] == 3 and vocab["本"] == 1
    assert vocab["text"] == 1
    # unsegmented control: the blob arrives as one type
    raw = {r["token"] for r in build_vocab(docs, text_col="text").collect()}
    assert "中文文本" in raw


def test_segmented_shingle_dedup_finds_zh_near_dups(spark):
    """Near-dup zh docs share no WHITESPACE shingles (each doc is one
    token) but plenty of character shingles once segmented — the dedup
    capability the tokenizer exists for."""
    from kafka_streams_task_spark.operators.dedup import ngram_jaccard_pairs

    a = "今天天气很好我们去公园散步然后喝茶"
    b = "今天天气很好我们去公园散步然后喝咖啡"
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, "完全不同的文档内容与前面无关")],
        "doc_id long, text string",
    )
    seg = docs.withColumn("text", segment_nospace_chars("text"))
    pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(seg, shingle_n=3, threshold=0.5).collect()
    }
    assert (1, 2) in pairs and len(pairs) == 1
    raw_pairs = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.5).count()
    assert raw_pairs == 0


def test_script_mix_fractions(spark):
    from kafka_streams_task_spark.functions.text import script_mix_columns

    rows = (
        spark.createDataFrame(
            [("中文ab1",), ("한국어",), ("",), (None,)], "t string"
        )
        .select("t", *script_mix_columns("t"))
        .collect()
    )
    by_t = {r["t"]: r for r in rows}
    r = by_t["中文ab1"]
    assert r["frac_han"] == pytest.approx(0.4)
    assert r["frac_latin"] == pytest.approx(0.4)
    assert r["frac_digit"] == pytest.approx(0.2)
    assert r["frac_kana"] == 0.0 and r["frac_hangul"] == 0.0
    k = by_t["한국어"]
    assert k["frac_hangul"] == pytest.approx(1.0) and k["frac_han"] == 0.0
    # empty/NULL: no distribution to report
    assert by_t[""]["frac_han"] is None
    assert by_t[None]["frac_han"] is None


def test_lang_id_script(spark):
    from kafka_streams_task_spark.functions.text import lang_id_script

    cases = [
        ("日本語のテスト", "ja"),     # kanji + kana -> ja, not zh
        ("中文文本没有假名", "zh"),
        ("한국어 텍스트", "ko"),
        ("ภาษาไทย", "th"),
        ("the cat is with the dog", "en"),
        ("xyzzy qwerty", "und"),
    ]
    df = spark.createDataFrame(cases, "t string, want string")
    got = df.select("want", lang_id_script("t").alias("got")).collect()
    for r in got:
        assert r["got"] == r["want"], r
