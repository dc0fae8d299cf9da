"""Batch crawl ingestion (sources/files.py r6): schema-pinned JSONL/CSV
readers with corrupt-record quarantine — the front door of the corpus."""

from __future__ import annotations

import gzip
import os

import pytest

from kafka_streams_task_spark.sources.files import (
    documents_schema,
    ingest_report,
    read_csv,
    read_jsonl,
)

GOOD = [
    '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}',
    '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7}',
    '{"doc_id": 3, "text": "with \\"quotes\\"", "lang": "en", "source": "books", "n_chars": 13}',
]
BAD = [
    '{"doc_id": 4, "text": "truncated...',          # unterminated JSON
    'not json at all',                                # garbage line
    '{"doc_id": "not-a-number-and-no-other-fields"}', # type-mangled, all-null row
]


def _write_shards(tmpdir, lines, name="shard0.jsonl", gz=False):
    p = os.path.join(str(tmpdir), name)
    if gz:
        with gzip.open(p, "wt", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
    else:
        with open(p, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
    return str(tmpdir)


def test_jsonl_clean_rows_typed_and_complete(spark, tmpdir):
    path = _write_shards(tmpdir, GOOD + BAD)
    q = os.path.join(str(tmpdir), "_quarantine")
    out = read_jsonl(spark, path, documents_schema(), quarantine_path=q)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].text == "hello world" and rows[1].n_chars == 11
    assert rows[3].text == 'with "quotes"'
    assert dict(out.dtypes)["doc_id"] == "bigint"


def test_jsonl_quarantine_preserves_raw_lines(spark, tmpdir):
    path = _write_shards(tmpdir, GOOD + BAD)
    q = os.path.join(str(tmpdir), "_quarantine")
    clean = read_jsonl(spark, path, documents_schema(), quarantine_path=q)
    n_clean, n_bad = ingest_report(clean, q, spark)
    assert n_clean == 3
    assert n_bad >= 2, "malformed lines must land in the quarantine"
    raws = {r.raw for r in spark.read.parquet(q).collect()}
    assert any("truncated" in r for r in raws)
    assert "not json at all" in raws


def test_jsonl_no_quarantine_path_still_filters(spark, tmpdir):
    path = _write_shards(tmpdir, GOOD + BAD)
    out = read_jsonl(spark, path, documents_schema())
    assert out.count() == 3


def test_jsonl_gzip_shards(spark, tmpdir):
    path = _write_shards(tmpdir, GOOD, name="shard0.jsonl.gz", gz=True)
    out = read_jsonl(spark, path, documents_schema())
    assert out.count() == 3


def test_jsonl_rejects_corrupt_column_in_schema(spark, tmpdir):
    from pyspark.sql import types as T

    bad_schema = T.StructType([T.StructField("_corrupt_record", T.StringType())])
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl(spark, str(tmpdir), bad_schema)


def test_csv_clean_and_quarantine(spark, tmpdir):
    lines = [
        "doc_id,text,lang,source,n_chars",
        '1,hello,en,web,5',
        '2,"has,comma",fr,web,9',
        'not-a-number,text,en,web,4',   # doc_id unparseable
    ]
    p = os.path.join(str(tmpdir), "shard0.csv")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    q = os.path.join(str(tmpdir), "_quarantine")
    out = read_csv(spark, str(tmpdir), documents_schema(), quarantine_path=q)
    rows = {r.doc_id: r.text for r in out.collect()}
    assert rows == {1: "hello", 2: "has,comma"}
    raws = {r.raw for r in spark.read.parquet(q).collect()}
    assert any("not-a-number" in r for r in raws)


def test_ingest_feeds_the_pipeline(spark, tmpdir):
    """Composition: ingested documents flow straight into the engine's
    text-analysis operators (schema contract holds end to end)."""
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.functions.text import token_count

    path = _write_shards(tmpdir, GOOD + BAD)
    docs = read_jsonl(spark, path, documents_schema())
    counted = docs.select("doc_id", token_count("text").alias("n_tokens")).collect()
    assert {r.doc_id: r.n_tokens for r in counted} == {1: 2, 2: 1, 3: 2}


def test_streaming_ingest_jsonl(spark, tmpdir):
    """Streaming twin: shards drain through availableNow into typed clean
    parquet + raw quarantine; a second run with NEW shards appends only
    the new data (checkpointed file source)."""
    import time

    from kafka_streams_task_spark.sources.files import streaming_ingest_jsonl

    src = os.path.join(str(tmpdir), "landing")
    os.makedirs(src)
    clean_p = os.path.join(str(tmpdir), "clean")
    quar_p = os.path.join(str(tmpdir), "quar")
    ckpt = os.path.join(str(tmpdir), "ckpt")

    with open(os.path.join(src, "s0.jsonl"), "w") as f:
        f.write("\n".join(GOOD[:2] + BAD[:1]) + "\n")
    q = streaming_ingest_jsonl(
        spark, src, documents_schema(), clean_p, quar_p, ckpt
    )
    q.awaitTermination(120)
    assert {r.doc_id for r in spark.read.parquet(clean_p).collect()} == {1, 2}
    assert spark.read.parquet(quar_p).count() == 1

    # second drain: only the new shard is ingested
    with open(os.path.join(src, "s1.jsonl"), "w") as f:
        f.write(GOOD[2] + "\n")
    q2 = streaming_ingest_jsonl(
        spark, src, documents_schema(), clean_p, quar_p, ckpt
    )
    q2.awaitTermination(120)
    assert {r.doc_id for r in spark.read.parquet(clean_p).collect()} == {1, 2, 3}
    assert spark.read.parquet(quar_p).count() == 1, "old shard must not re-ingest"


def test_streaming_ingest_rejects_foreign_checkpoint(spark, tmpdir):
    """r7: a FRESH checkpoint pointed at a used clean_path restarts
    batch ids at 0 and would silently overwrite batch=0's earlier data —
    the output dirs are bound to their checkpoint and must refuse."""
    from kafka_streams_task_spark.sources.files import streaming_ingest_jsonl

    src = os.path.join(str(tmpdir), "landing")
    os.makedirs(src)
    clean_p = os.path.join(str(tmpdir), "clean")
    quar_p = os.path.join(str(tmpdir), "quar")
    ckpt = os.path.join(str(tmpdir), "ckpt")

    with open(os.path.join(src, "s0.jsonl"), "w") as f:
        f.write("\n".join(GOOD[:2]) + "\n")
    q = streaming_ingest_jsonl(spark, src, documents_schema(), clean_p, quar_p, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(clean_p).count() == 2

    with pytest.raises(ValueError, match="bound to checkpoint"):
        streaming_ingest_jsonl(
            spark, src, documents_schema(), clean_p, quar_p,
            os.path.join(str(tmpdir), "ckpt_fresh"),
        )
    # the refused start must not have clobbered the committed data
    assert spark.read.parquet(clean_p).count() == 2


def test_ingest_report_missing_quarantine_is_zero(spark, tmpdir):
    path = _write_shards(tmpdir, GOOD)
    clean = read_jsonl(spark, path, documents_schema())
    n_clean, n_bad = ingest_report(
        clean, os.path.join(str(tmpdir), "never_written"), spark
    )
    assert (n_clean, n_bad) == (3, 0)


def test_ingest_report_broken_quarantine_propagates(spark, tmpdir):
    """r7: only PATH_NOT_FOUND means 'nothing quarantined'. A quarantine
    dir that exists but cannot be read as parquet (here: empty — no
    files, no schema) is BROKEN, and reporting 0 over it would hide data
    loss; the error must propagate."""
    from pyspark.errors import AnalysisException

    path = _write_shards(tmpdir, GOOD)
    clean = read_jsonl(spark, path, documents_schema())
    broken = os.path.join(str(tmpdir), "broken_quarantine")
    os.makedirs(broken)  # exists, but holds no parquet at all
    with pytest.raises(AnalysisException):
        ingest_report(clean, broken, spark)


# ------------------------------------------------------------- clean_text


def test_clean_text_normalizes_crawl_artifacts(spark):
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.functions.text import clean_text, tokens

    raw = (
        "﻿Title with odd　spaces\r\n\r\n\r\n"
        "zero​width­join\x07bell\r\ntail   runs\t\there  "
    )
    out = (
        spark.createDataFrame([(raw,)], ["t"])
        .select(clean_text("t").alias("c"))
        .first()
        .c
    )
    assert out == (
        "Title with odd spaces\n\nzerowidthjoinbell\ntail runs here"
    )
    # tokenizer now sees sane tokens (no NBSP mega-token)
    toks = (
        spark.createDataFrame([(raw,)], ["t"])
        .select(tokens(clean_text("t")).alias("k"))
        .first()
        .k
    )
    assert "with" in toks and "spaces" in toks


def test_clean_text_flatten_mode(spark):
    from kafka_streams_task_spark.functions.text import clean_text

    raw = "a\n\nb\nc"
    out = (
        spark.createDataFrame([(raw,)], ["t"])
        .select(clean_text("t", keep_newlines=False).alias("c"))
        .first()
        .c
    )
    assert out == "a b c"


def test_clean_text_is_codegen_only(spark):
    from kafka_streams_task_spark.functions.text import clean_text

    df = spark.createDataFrame([("x",)], ["t"])
    plan = df.select(clean_text("t"))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_clean_text_trims_edge_newlines(spark):
    from kafka_streams_task_spark.functions.text import clean_text

    out = (
        spark.createDataFrame([("\nhello world\n\n",)], ["t"])
        .select(clean_text("t").alias("c"))
        .first()
        .c
    )
    assert out == "hello world", repr(out)


def test_reingest_is_idempotent(spark, tmpdir):
    """Re-running the same ingest call (retry, notebook re-run) must not
    inflate the quarantine — overwrite semantics, one call = one state."""
    path = _write_shards(tmpdir, GOOD + BAD)
    q = os.path.join(str(tmpdir), "_quarantine")
    for _ in range(2):
        clean = read_jsonl(spark, path, documents_schema(), quarantine_path=q)
        n_clean, n_bad = ingest_report(clean, q, spark)
    assert n_clean == 3
    assert n_bad == len(BAD), f"quarantine inflated: {n_bad}"


# ---------------------------------------------- corpus summary + domain list


def test_corpus_summary(spark, sf_dir):
    from kafka_streams_task_spark.operators.expectations import corpus_summary

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = corpus_summary(docs).collect()
    assert out, "summary must have group rows"
    total_docs = sum(r.n_docs for r in out)
    assert total_docs == docs.count()
    for r in out:
        assert r.min_tokens <= r.p50_tokens <= r.p90_tokens <= r.p99_tokens <= r.max_tokens
        assert r.n_chars > 0 and r.n_tokens > 0


def test_corpus_summary_single_aggregate_plan(spark, sf_dir):
    from kafka_streams_task_spark.operators.expectations import corpus_summary

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    plan = corpus_summary(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, "summary must be one scan"
    assert "Generate" not in plan, "no explode — token counts are size(split())"


def test_filter_by_domain_list(spark):
    from pyspark.sql import Row

    from kafka_streams_task_spark.operators.dedup import filter_by_domain_list

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, url="https://spam.example.com/a"),
            Row(doc_id=2, url="https://sub.deep.spam.example.com/b"),  # subdomain
            Row(doc_id=3, url="https://good.org/c"),
            Row(doc_id=4, url="https://other.net/d"),
        ]
    )
    lst = spark.createDataFrame([Row(domain="example.com")])
    blocked = {r.doc_id for r in filter_by_domain_list(docs, lst, mode="block").collect()}
    assert blocked == {3, 4}, "blocklist must cover all subdomains"
    allowed = {r.doc_id for r in filter_by_domain_list(docs, lst, mode="allow").collect()}
    assert allowed == {1, 2}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="block"):
        filter_by_domain_list(docs, lst, mode="nope")


def test_filter_by_domain_list_subdomain_entries(spark):
    """r7 (ADVICE): a list entry that is itself a subdomain/full host
    (common in real UT1 lists, e.g. 'ads.example.com') must match its
    own subtree — and ONLY its subtree — instead of being a dead row."""
    from pyspark.sql import Row

    from kafka_streams_task_spark.operators.dedup import filter_by_domain_list

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, url="https://ads.example.com/banner"),
            Row(doc_id=2, url="https://x.ads.example.com/b"),  # deeper subtree
            Row(doc_id=3, url="https://www.example.com/home"),  # same eTLD+1, other subtree
            Row(doc_id=4, url="https://example.com/root"),
            Row(doc_id=5, url="https://clean.org/c"),
        ]
    )
    lst = spark.createDataFrame(
        [Row(domain="ads.example.com"), Row(domain="Ads.Example.COM.")]  # dupes+case+dot
    )
    blocked = {r.doc_id for r in filter_by_domain_list(docs, lst, mode="block").collect()}
    assert blocked == {3, 4, 5}, "only the ads.example.com subtree is blocked"
    allowed = {r.doc_id for r in filter_by_domain_list(docs, lst, mode="allow").collect()}
    assert allowed == {1, 2}


def test_filter_by_domain_list_is_broadcast_hash_join(spark):
    """The residual suffix condition must not demote the join: still a
    BroadcastHashJoin (map-side probe, no shuffle, no nested loop)."""
    from pyspark.sql import Row

    from kafka_streams_task_spark.operators.dedup import filter_by_domain_list

    docs = spark.createDataFrame([Row(doc_id=1, url="https://a.example.com/x")])
    lst = spark.createDataFrame([Row(domain="example.com")])
    plan = (
        filter_by_domain_list(docs, lst, mode="block")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "SortMergeJoin" not in plan
