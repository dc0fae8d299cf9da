"""Vocabulary construction + document encoding: ground-truth ranking,
layout independence, dense-id contract, OOV handling, plan shape."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F

from kafka_streams_task_spark.operators.vocab import build_vocab, encode_documents

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "a cat and a dog and a bird"),
    (4, "the bird sat"),
]


def _py_vocab(min_count: int = 1) -> list[tuple[str, int]]:
    """(token, count) in (count desc, token asc) order — ground truth."""
    c = Counter(tok for _, text in DOCS for tok in text.split())
    items = [(t, n) for t, n in c.items() if n >= min_count]
    return sorted(items, key=lambda x: (-x[1], x[0]))


def test_build_vocab_matches_counter_ground_truth(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = build_vocab(df, num_partitions=3).collect()
    expect = _py_vocab()
    # dense ids 0..V-1, ordered by (count desc, token asc)
    assert sorted(r["token_id"] for r in got) == list(range(len(expect)))
    by_id = sorted(got, key=lambda r: r["token_id"])
    assert [(r["token"], r["count"]) for r in by_id] == expect


def test_build_vocab_layout_independent_and_min_count(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    a = {(r["token"], r["token_id"]) for r in build_vocab(df, num_partitions=4).collect()}
    b = {
        (r["token"], r["token_id"])
        for r in build_vocab(df.repartition(7), num_partitions=4).collect()
    }
    assert a == b
    rare_cut = build_vocab(df, min_count=2).collect()
    assert {(r["token"], r["count"]) for r in rare_cut} == {
        (t, n) for t, n in _py_vocab(min_count=2)
    }
    assert sorted(r["token_id"] for r in rare_cut) == list(range(len(rare_cut)))


def test_encode_documents_roundtrip_and_oov(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    vocab = build_vocab(df).persist()
    id_to_tok = {r["token_id"]: r["token"] for r in vocab.collect()}
    enc = {r["doc_id"]: r for r in encode_documents(df, vocab).collect()}
    for doc_id, text in DOCS:
        toks = text.split()
        assert enc[doc_id]["n_tokens"] == len(toks)
        assert [id_to_tok[i] for i in enc[doc_id]["token_ids"]] == toks
    # OOV: encode unseen text under the same vocab -> unk_id at OOV slots
    oov = spark.createDataFrame([(9, "the zebra sat")], ["doc_id", "text"])
    (row,) = encode_documents(oov, vocab, unk_id=-1).collect()
    ids = row["token_ids"]
    decoded = [id_to_tok[i] if i >= 0 else "<unk>" for i in ids]
    assert decoded == ["the", "<unk>", "sat"]


from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])
_doc = st.lists(_words, min_size=1, max_size=12).map(" ".join)


@given(docs=st.lists(_doc, min_size=1, max_size=10), min_count=st.integers(1, 3))
@settings(max_examples=10, deadline=None)
def test_build_vocab_property_matches_counter(spark, docs, min_count):
    """Any corpus, any min_count: ids are dense 0..V-1 in (count desc,
    token asc) order and counts equal the Python Counter ground truth."""
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = sorted(build_vocab(df, min_count=min_count, num_partitions=3).collect(),
                 key=lambda r: r["token_id"])
    c = Counter(t for d in docs for t in d.split())
    expect = sorted(
        ((t, n) for t, n in c.items() if n >= min_count), key=lambda x: (-x[1], x[0])
    )
    assert [(r["token"], r["count"]) for r in got] == expect
    assert [r["token_id"] for r in got] == list(range(len(expect)))


def test_build_vocab_ids_stable_and_released(spark):
    """r5 cache-lifecycle contract (VERDICT r4 item 4): the ranked
    intermediate is an eager localCheckpoint with an explicit release
    handle, not a leaked persist. Assertions: (1) ids are stable across
    repeated collects and a clearCache() — the checkpoint, not the cache
    registry, pins the layout; (2) nothing sits in the CACHE registry (no
    InMemoryTableScan in the plan); (3) release() returns the
    persistent-RDD set to its baseline — the old persist could never be
    dropped at all; (4) after release the plan fails LOUDLY instead of
    silently recomputing with fresh range boundaries."""
    import pytest

    from kafka_streams_task_spark.operators.vocab import build_vocab_with_cleanup

    jsc = spark.sparkContext._jsc
    before = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}

    docs = [(i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(12))) for i in range(200)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    vocab, release = build_vocab_with_cleanup(df, num_partitions=4)
    during = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()} - before
    assert during, "expected the eager checkpoint to be registered"
    warm = {(r["token"], r["token_id"]) for r in vocab.collect()}
    spark.catalog.clearCache()
    evicted = {(r["token"], r["token_id"]) for r in vocab.collect()}
    assert warm == evicted
    assert sorted(i for _, i in warm) == list(range(len(warm)))
    plan = vocab._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan

    release()
    leaked = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()} - before
    assert not leaked, f"release() left checkpoint blocks behind: {leaked}"
    with pytest.raises(Exception):
        vocab.collect()


def test_build_vocab_no_single_partition_exchange(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = build_vocab(df, num_partitions=3)._jdf.queryExecution().executedPlan().toString()
    # the whole point: dense global ranking WITHOUT funneling the vocab
    # through one task (no unpartitioned window / SinglePartition exchange)
    assert "SinglePartition" not in plan
    assert "Window" not in plan


def test_build_vocab_validate_flag(spark):
    from kafka_streams_task_spark.operators.vocab import build_vocab

    df = spark.createDataFrame(
        [(i, "alpha beta gamma " + f"tok{i % 13}") for i in range(200)], ["doc_id", "text"]
    )
    # validate=True runs the dense-id post-hoc guard and must not raise
    vocab = build_vocab(df, validate=True)
    assert vocab.count() == 3 + 13
