"""Multilingual curation capstone — the r11 pieces composed end-to-end:
script-first language ID routes no-space scripts through segmentation,
and the UNCHANGED downstream curation stack (exact dedup, shingle
near-dup, vocabulary, Gopher quality) then works on zh/ja/th text it
was previously blind to. Each stage asserts both the multilingual
behavior AND that spaced-script docs flow through byte-identically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.functions.text import (
    lang_id_script,
    segment_nospace_chars,
    token_count,
)

_NOSPACE_LANGS = ("zh", "ja", "th")

_DOCS = [
    # english pair: exact duplicates
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),
    # chinese near-dup pair (shared 16-char prefix)
    (3, "今天天气很好我们去公园散步然后喝茶"),
    (4, "今天天气很好我们去公园散步然后喝咖啡"),
    # japanese + korean + thai singletons
    (5, "日本語のテストです"),
    (6, "한국어 텍스트 문서"),
    (7, "ภาษาไทยสวยงาม"),
]


@pytest.fixture(scope="module")
def routed(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    labeled = docs.withColumn("lang", lang_id_script("text"))
    return labeled.withColumn(
        "text_m",
        F.when(
            F.col("lang").isin(*_NOSPACE_LANGS),
            segment_nospace_chars("text"),
        ).otherwise(F.col("text")),
    )


def test_routing_labels_and_identity(routed):
    rows = {r["doc_id"]: r for r in routed.collect()}
    assert [rows[i]["lang"] for i in (1, 3, 5, 6, 7)] == [
        "en", "zh", "ja", "ko", "th",
    ]
    # spaced scripts flow through byte-identically
    assert rows[1]["text_m"] == rows[1]["text"]
    assert rows[6]["text_m"] == rows[6]["text"]
    # no-space scripts got per-char units
    assert rows[3]["text_m"].split()[:3] == ["今", "天", "天"]


def test_exact_dedup_still_exact(routed):
    from kafka_streams_task_spark.operators.dedup import dedup_exact

    survivors = dedup_exact(routed.select("doc_id", F.col("text_m").alias("text")))
    ids = {r["doc_id"] for r in survivors.collect()}
    # the english exact pair collapses to one survivor; everything else
    # (incl. the zh NEAR-dups — not byte-equal) survives
    assert ids == {1, 3, 4, 5, 6, 7}


def test_near_dedup_now_sees_cjk(routed):
    from kafka_streams_task_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            routed.select("doc_id", F.col("text_m").alias("text")),
            shingle_n=3,
            threshold=0.5,
        ).collect()
    }
    # the zh near-dup pair AND the english exact pair; nothing spurious
    assert pairs == {(1, 2), (3, 4)}
    # control: unrouted text never finds the zh pair
    raw_pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            routed.select("doc_id", "text"), shingle_n=3, threshold=0.5
        ).collect()
    }
    assert (3, 4) not in raw_pairs


def test_vocab_and_token_counts_become_meaningful(routed):
    from kafka_streams_task_spark.operators.vocab import build_vocab

    counts = {
        r["doc_id"]: r["n"]
        for r in routed.select(
            "doc_id", token_count("text_m").alias("n")
        ).collect()
    }
    # pre-segmentation every zh/ja/th doc was ONE token; now real units
    assert counts[3] == 17 and counts[5] == 9 and counts[7] == 13
    assert counts[1] == 12  # english unchanged

    vocab = {
        r["token"]
        for r in build_vocab(
            routed.select(F.col("text_m").alias("text")), text_col="text"
        ).collect()
    }
    assert {"天", "の", "ภ", "the", "한국어"} <= vocab


def test_quality_filter_stops_rejecting_cjk(routed):
    from kafka_streams_task_spark.functions.text import gopher_quality_columns

    out = routed.select(
        "doc_id",
        *gopher_quality_columns(F.col("text_m")),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    raw = routed.select(
        "doc_id", *gopher_quality_columns(F.col("text"))
    ).collect()
    raw_by_id = {r["doc_id"]: r for r in raw}
    # the zh doc's word count was 1 (an instant Gopher min-words fail);
    # segmentation gives it a real count
    assert raw_by_id[3]["n_words"] == 1
    assert by_id[3]["n_words"] == 17


def test_segment_routed_override_and_kanji_contract(spark):
    """r12 (VERDICT r11 item 5): the router as a library verb. The
    kanji-only ja doc labels 'zh' (the pinned script-ID contract — also
    gated in script_mix_suite's decision table); a caller-supplied lang
    override column routes docs the heuristic would misplace, and both
    'zh' and 'ja' labels produce the SAME segmentation, so the ambiguity
    never changes tokenization."""
    from kafka_streams_task_spark.functions.text import (
        segment_nospace_chars,
        segment_routed,
    )

    docs = spark.createDataFrame(
        [
            (1, "東京大学日本語研究所", "ja"),     # kanji-only ja; heuristic says zh
            (2, "the quick brown fox", "en"),
            (3, "한국어 漢字 텍스트", "ko"),        # han-bearing Korean
        ],
        "doc_id long, text string, known_lang string",
    )

    # heuristic mode: kanji-only doc labels zh — and still segments
    auto = {r.doc_id: r.seg for r in docs.select(
        "doc_id", segment_routed("text").alias("seg")).collect()}
    labels = {r.doc_id: r.lab for r in docs.select(
        "doc_id", lang_id_script("text").alias("lab")).collect()}
    assert labels[1] == "zh"  # the documented contract
    expected_seg = docs.select(
        "doc_id", segment_nospace_chars("text").alias("seg")
    ).collect()
    assert auto[1] == {r.doc_id: r.seg for r in expected_seg}[1]

    # heuristic routes han-bearing Korean through segmentation? No:
    # hangul wins precedence -> 'ko' -> passthrough byte-identical
    orig = {r.doc_id: r.text for r in docs.collect()}
    assert auto[3] == orig[3]

    # override mode: the caller's labels move doc 1 to 'ja' (same
    # segmentation) and keep doc 3 spaced; 'en' passes through
    routed = {r.doc_id: r.seg for r in docs.select(
        "doc_id", segment_routed("text", lang="known_lang").alias("seg")
    ).collect()}
    assert routed[1] == auto[1]          # ja routes like zh: segmented
    assert routed[2] == orig[2]          # spaced script untouched
    assert routed[3] == orig[3]          # ko stays spaced
