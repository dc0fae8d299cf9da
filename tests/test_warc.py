"""WARC crawl source (sources/warc.py): ISO 28500 framing, gzip, HTTP
payload split, malformed-record quarantine + resync, plan shape."""

from __future__ import annotations

import gzip
import io

from pyspark.sql import functions as F

from kafka_streams_task_spark.sources.warc import (
    WARC_RECORD,
    iter_warc_records,
    read_warc,
    warc_ingest_report,
)

# body deliberately contains CRLFCRLF: only Content-Length framing (not
# blank-line splitting) parses this correctly
HTML_BODY = b"<html>a\r\n\r\nb</html>"
HTTP_MSG = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
    + HTML_BODY
)


def _record(warc_type: bytes, uri: bytes, block: bytes, ctype: bytes) -> bytes:
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + warc_type + b"\r\n"
        b"WARC-Record-ID: <urn:uuid:" + warc_type + b"-1>\r\n"
        b"WARC-Target-URI: " + uri + b"\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"Content-Type: " + ctype + b"\r\n"
        b"Content-Length: " + str(len(block)).encode() + b"\r\n"
        b"\r\n" + block + b"\r\n\r\n"
    )


def _shard() -> bytes:
    info = _record(b"warcinfo", b"", b"software: test\r\n", b"application/warc-fields")
    req = _record(
        b"request",
        b"http://example.com/",
        b"GET / HTTP/1.1\r\nHost: example.com\r\n\r\n",
        b"application/http; msgtype=request",
    )
    resp = _record(
        b"response",
        b"http://example.com/",
        HTTP_MSG,
        b"application/http; msgtype=response",
    )
    return info + req + resp


GARBAGE = b"this is not a warc record\r\njunk line\r\n"


def test_iter_records_framing_and_http_split():
    recs = list(iter_warc_records(io.BytesIO(_shard())))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "request", "response"]
    resp = recs[2]
    assert resp["target_uri"] == "http://example.com/"
    assert resp["http_status"] == 200
    assert resp["http_content_type"] == "text/html; charset=utf-8"
    assert resp["payload"] == HTML_BODY  # CRLFCRLF inside body survived
    assert resp["content_length"] == len(HTTP_MSG)
    req = recs[1]
    assert req["http_status"] is None and req["payload"] == b""  # GET body empty


def test_iter_records_raw_mode_keeps_http_headers():
    recs = list(iter_warc_records(io.BytesIO(_shard()), strip_http_headers=False))
    assert recs[2]["payload"] == HTTP_MSG and recs[2]["http_status"] is None


def test_malformed_resync_costs_one_record():
    data = _record(b"warcinfo", b"", b"x", b"a/b") + GARBAGE + _record(
        b"response", b"http://e.com/", HTTP_MSG, b"application/http; msgtype=response"
    )
    recs = list(iter_warc_records(io.BytesIO(data)))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "_malformed", "response"]
    assert recs[1]["payload"] == GARBAGE  # quarantine preserves the bytes
    assert recs[2]["http_status"] == 200


def test_bad_content_length_is_malformed():
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: nope\r\n\r\nxyz\r\n\r\n"
    )
    recs = list(iter_warc_records(io.BytesIO(bad)))
    assert [r["warc_type"] for r in recs] == ["_malformed"]


def test_read_warc_plain_and_multimember_gzip(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_shard())
    # Common Crawl style: one gzip member per record, concatenated
    members = b"".join(
        gzip.compress(_record(b"response", f"http://s{i}.com/".encode(), HTTP_MSG,
                              b"application/http; msgtype=response"))
        for i in range(3)
    )
    (tmp_path / "b.warc.gz").write_bytes(members)
    df = read_warc(spark, str(tmp_path))
    assert df.schema == WARC_RECORD
    rows = df.collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.source_file.rsplit("/", 1)[-1], []).append(r)
    assert len(by_file["a.warc"]) == 3
    assert len(by_file["b.warc.gz"]) == 3
    assert all(r.http_status == 200 for r in by_file["b.warc.gz"])
    assert [r.record_idx for r in sorted(by_file["b.warc.gz"], key=lambda r: r.record_idx)] == [0, 1, 2]
    report = warc_ingest_report(df).collect()[0]
    assert report.n_records == 6 and report.n_malformed == 0 and report.n_files == 2
    assert report.payload_bytes > 0


def test_read_warc_type_pushdown_keeps_quarantine(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_shard() + GARBAGE)
    df = read_warc(spark, str(tmp_path), record_types=("response",))
    types = sorted(r.warc_type for r in df.collect())
    assert types == ["_malformed", "response"]


def test_read_warc_plan_is_one_arrow_stage(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_shard())
    plan = (
        read_warc(spark, str(tmp_path))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan, "file-parallel parse must not shuffle"


HTML_PAGE = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
    b"<!DOCTYPE html><html><head><title>T</title>"
    b"<style>body { color: red }</style>"
    b"<script>var x = '<p>not text</p>';</script></head>"
    b"<body><!-- hidden --><h1>Hello &amp; welcome</h1>"
    b"<p>First&nbsp;para</p><p>Second <b>bold</b> para</p></body></html>"
)


def test_html_to_text_extraction(spark):
    from kafka_streams_task_spark.functions.text import clean_text, html_to_text

    df = spark.createDataFrame([(HTML_PAGE.split(b"\r\n\r\n", 1)[1].decode(),)], ["html"])
    out = df.select(clean_text(html_to_text(F.col("html"))).alias("t")).collect()[0].t
    assert "not text" not in out and "color" not in out and "hidden" not in out
    assert "Hello & welcome" in out
    assert "First para" in out and "Second bold para" in out
    # block boundaries preserved paragraph structure
    assert out.index("Hello") < out.index("First") < out.index("Second")
    assert "\n" in out
    # title is inline-tagged content; it survives as text
    assert "T" in out


def test_html_to_text_unclosed_script_degrades_softly(spark):
    from kafka_streams_task_spark.functions.text import html_to_text

    df = spark.createDataFrame([("<p>keep</p><script>var x=1; rest",)], ["html"])
    out = df.select(html_to_text(F.col("html")).alias("t")).collect()[0].t
    assert "keep" in out and "var x" not in out


def test_html_to_text_is_codegen_only(spark):
    from kafka_streams_task_spark.functions.text import html_to_text

    df = spark.createDataFrame([("<p>x</p>",)], ["html"])
    plan = (
        df.select(html_to_text(F.col("html")).alias("t"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Arrow" not in plan


def test_warc_to_documents_end_to_end(spark, tmp_path):
    from kafka_streams_task_spark.sources.warc import warc_to_documents

    resp_html = _record(
        b"response", b"HTTP://Example.COM:80/a?utm_source=x&id=1",
        HTML_PAGE, b"application/http; msgtype=response",
    )
    resp_404 = _record(
        b"response", b"http://example.com/missing",
        b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n<p>gone</p>",
        b"application/http; msgtype=response",
    )
    resp_img = _record(
        b"response", b"http://example.com/i.png",
        b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n\x89PNG",
        b"application/http; msgtype=response",
    )
    req = _record(
        b"request", b"http://example.com/a",
        b"GET /a HTTP/1.1\r\n\r\n", b"application/http; msgtype=request",
    )
    (tmp_path / "crawl.warc").write_bytes(resp_html + resp_404 + resp_img + req)
    docs = warc_to_documents(read_warc(spark, str(tmp_path)))
    rows = docs.collect()
    # only the 200 text/html response survives
    assert len(rows) == 1
    d = rows[0]
    assert d.url == "HTTP://Example.COM:80/a?utm_source=x&id=1"
    assert d.url_key == "http://example.com/a?id=1"  # canonical dedup key
    assert d.domain == "example.com"
    assert "Hello & welcome" in d.text and "var x" not in d.text
    assert d.n_chars == len(d.text) > 0
    assert d.fetched_at == "2026-01-01T00:00:00Z"
    # exactly one Python stage end-to-end: the WARC parse; everything
    # downstream (html->text->urls) is codegen in the same projection
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_streaming_ingest_warc(spark, tmp_path):
    """Streaming twin: shards drain through availableNow into parquet
    records; a second run with a NEW shard appends only the new data;
    a fresh checkpoint at the used out_path refuses."""
    import pytest
    from kafka_streams_task_spark.sources.warc import streaming_ingest_warc

    src = tmp_path / "landing"
    src.mkdir()
    out = str(tmp_path / "records")
    ckpt = str(tmp_path / "ckpt")

    (src / "a.warc").write_bytes(_shard())
    q = streaming_ingest_warc(spark, str(src), out, ckpt,
                              record_types=("response",))
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert {r.warc_type for r in rows} == {"response"}
    assert len(rows) == 1 and rows[0].http_status == 200

    (src / "b.warc.gz").write_bytes(
        gzip.compress(_record(b"response", b"http://n.com/", HTTP_MSG,
                              b"application/http; msgtype=response"))
    )
    q2 = streaming_ingest_warc(spark, str(src), out, ckpt,
                               record_types=("response",))
    q2.awaitTermination(120)
    uris = sorted(r.target_uri for r in spark.read.parquet(out).collect())
    assert uris == ["http://example.com/", "http://n.com/"], "old shard must not re-ingest"

    with pytest.raises(ValueError, match="bound to checkpoint"):
        streaming_ingest_warc(spark, str(src), out,
                              str(tmp_path / "ckpt_fresh"))
    assert spark.read.parquet(out).count() == 2, "refused start must not clobber"


LINKY_PAGE = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    b'<html><head><title> My  Page </title></head><body>'
    b'<a href="https://other.com/x">abs</a>'
    b'<a href="https://other.com/x?b=1">abs2</a>'
    b'<a href="/relative">rel</a>'
    b'<a href="javascript:void(0)">js</a>'
    b'<a href="#frag">frag</a>'
    b'<a href="mailto:a@b.c">mail</a>'
    b'<a href="http://www.example.com/self">self</a>'
    b"</body></html>"
)


def test_html_title_and_links(spark):
    from kafka_streams_task_spark.functions.text import html_links, html_title

    html = LINKY_PAGE.split(b"\r\n\r\n", 1)[1].decode()
    df = spark.createDataFrame([(html,), ("<p>no title</p>",)], ["html"])
    rows = df.select(
        html_title(F.col("html")).alias("title"),
        html_links(F.col("html")).alias("links"),
        html_links(F.col("html"), absolute_only=False).alias("all_links"),
    ).collect()
    assert rows[0].title == "My  Page"
    assert rows[0].links == [
        "https://other.com/x",
        "https://other.com/x?b=1",
        "http://www.example.com/self",
    ]
    assert "/relative" in rows[0].all_links
    assert not any("javascript" in u or "mailto" in u for u in rows[0].all_links)
    assert rows[1].title is None and rows[1].links == []
    plan = (
        df.select(html_title(F.col("html")), html_links(F.col("html")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Arrow" not in plan


def test_warc_link_graph_to_pagerank(spark, tmp_path):
    """Composition: crawl shard -> domain link graph -> pagerank."""
    import pytest
    from kafka_streams_task_spark.operators.graph import pagerank
    from kafka_streams_task_spark.sources.warc import warc_link_graph

    page = _record(
        b"response", b"http://www.example.com/page",
        LINKY_PAGE, b"application/http; msgtype=response",
    )
    (tmp_path / "a.warc").write_bytes(page)
    records = read_warc(spark, str(tmp_path))
    edges = warc_link_graph(records)
    got = sorted((r.src, r.dst) for r in edges.collect())
    # self-domain link dropped; the two other.com links stay as
    # parallel edges (extra mass, adjacency-matrix semantics)
    assert got == [("example.com", "other.com"), ("example.com", "other.com")]
    ranks = {r.node: r.rank for r in pagerank(edges, n_iter=3).collect()}
    assert set(ranks) == {"example.com", "other.com"}
    assert ranks["other.com"] > ranks["example.com"]
    with pytest.raises(ValueError, match="node"):
        warc_link_graph(records, node="bogus")
    page_edges = warc_link_graph(records, node="url").collect()
    assert all(e.src == "http://www.example.com/page" for e in page_edges)


def test_truncated_gzip_shard_quarantines_not_crashes(spark, tmp_path):
    """A corrupt/truncated .warc.gz must cost its remainder one
    '_malformed' row, never the task (review r7); intact shards in the
    same read are unaffected."""
    good = gzip.compress(_record(b"response", b"http://g.com/", HTTP_MSG,
                                 b"application/http; msgtype=response"))
    (tmp_path / "good.warc.gz").write_bytes(good)
    # two members, second truncated mid-stream
    full = gzip.compress(_record(b"response", b"http://t.com/1", HTTP_MSG,
                                 b"application/http; msgtype=response"))
    trunc = gzip.compress(_record(b"response", b"http://t.com/2", HTTP_MSG,
                                  b"application/http; msgtype=response"))[:40]
    (tmp_path / "bad.warc.gz").write_bytes(full + trunc)
    rows = read_warc(spark, str(tmp_path)).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.source_file.rsplit("/", 1)[-1], []).append(r)
    assert [r.warc_type for r in by_file["good.warc.gz"]] == ["response"]
    bad_types = sorted(r.warc_type for r in by_file["bad.warc.gz"])
    assert bad_types == ["_malformed", "response"]
    mal = [r for r in by_file["bad.warc.gz"] if r.warc_type == "_malformed"][0]
    assert b"decompression failed" in bytes(mal.payload)


def test_crawl_capstone_warc_to_versioned_corpus(spark, tmp_path):
    """Crawl-side capstone: WARC shards -> streaming documents twin ->
    leakage-guarded splits -> versioned snapshot -> contamination audit.
    The point is the stages COMPOSE (schemas line up end to end)."""
    from kafka_streams_task_spark.operators.dedup import cross_split_contamination
    from kafka_streams_task_spark.operators.sampling import assign_splits
    from kafka_streams_task_spark.operators.snapshots import (
        snapshot_read,
        snapshot_write,
    )
    from kafka_streams_task_spark.sources.warc import (
        streaming_ingest_warc,
        warc_to_documents,
    )

    src = tmp_path / "landing"
    src.mkdir()
    shard = b"".join(
        _record(
            b"response",
            f"http://site{i % 3}.com/p{i}".encode(),
            HTML_PAGE,
            b"application/http; msgtype=response",
        )
        for i in range(9)
    )
    (src / "a.warc").write_bytes(shard)
    out = str(tmp_path / "docs")
    q = streaming_ingest_warc(
        spark, str(src), out, str(tmp_path / "ckpt"),
        record_types=("response",), transform=warc_to_documents,
    )
    q.awaitTermination(120)
    docs = spark.read.parquet(out)
    assert docs.count() == 9
    assert {"doc_uid", "url", "url_key", "domain", "text", "n_chars"} <= set(docs.columns)

    # weights chosen so the three planted domains provably straddle:
    # hash_unit(site1.com)=0.165 < 0.25 -> train; site0.com=0.372 and
    # site2.com=0.443 land in [0.25, 0.5) -> val
    split_docs = assign_splits(
        docs, {"train": 0.25, "val": 0.25, "test": 0.5}, group_col="domain"
    )
    v = snapshot_write(spark, split_docs, str(tmp_path / "corpus"))
    pinned = snapshot_read(spark, str(tmp_path / "corpus"), v)
    assert pinned.count() == 9
    splits = {r.split for r in pinned.select("split").distinct().collect()}
    assert splits == {"train", "val"}, "planted domains must straddle splits"
    # every page shares its HTML body -> identical text, so every val
    # doc MUST surface in the train->eval contamination audit
    audit = cross_split_contamination(
        pinned.select("url", "split", "text").withColumnRenamed("url", "doc_id"),
        shingle_n=4,
    )
    n_val = pinned.filter("split = 'val'").count()
    assert audit.count() == n_val > 0


def test_streaming_transform_preserves_quarantine(spark, tmp_path):
    """With a filtering transform, '_malformed' rows must land under
    out_path/_quarantine instead of vanishing (review r7 follow-up)."""
    from kafka_streams_task_spark.sources.warc import (
        streaming_ingest_warc,
        warc_to_documents,
    )

    src = tmp_path / "landing"
    src.mkdir()
    (src / "a.warc").write_bytes(
        _record(b"response", b"http://q.com/", HTML_PAGE,
                b"application/http; msgtype=response") + GARBAGE
    )
    out = str(tmp_path / "docs")
    q = streaming_ingest_warc(
        spark, str(src), out, str(tmp_path / "ckpt"),
        transform=warc_to_documents,
    )
    q.awaitTermination(120)
    docs = spark.read.parquet(out)
    assert docs.count() == 1 and "_quarantine" not in [
        f for f in docs.inputFiles() if "_quarantine" in f
    ]
    quar = spark.read.parquet(f"{out}/_quarantine")
    assert quar.count() == 1
    assert quar.collect()[0].warc_type == "_malformed"


def test_read_warc_scan_is_path_only(spark, tmp_path):
    """r8 plan pin: shard bytes must NOT transit the JVM — the
    binaryFile scan reads only the path column (pure listing)."""
    (tmp_path / "a.warc").write_bytes(_shard())
    plan = (
        read_warc(spark, str(tmp_path))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ReadSchema: struct<path:string>" in plan
    assert "content#" not in plan  # no binary content attribute anywhere


def _write_oversize_shard(path, payload_len=2_400_000_000):
    """A valid WARC shard > 2 GiB on disk (sparse: zeros payload) — one
    huge record, then a small real one after it."""
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Record-ID: <urn:uuid:huge-1>\r\n"
        b"WARC-Target-URI: http://big.com/blob\r\n"
        b"Content-Type: application/octet-stream\r\n"
        b"Content-Length: " + str(payload_len).encode() + b"\r\n\r\n"
    )
    with open(path, "wb") as f:
        f.write(head)
        f.seek(len(head) + payload_len)
        f.write(b"\r\n\r\n")
        f.write(_record(b"response", b"http://big.com/after", HTTP_MSG,
                        b"application/http; msgtype=response"))
    return payload_len


def test_read_warc_shard_over_2gib(spark, tmp_path):
    """The r7 foundation (binaryFile CONTENT rows) hard-fails on any
    shard over Int.MaxValue bytes; the r8 path-only + in-task open
    shape streams it. Both facts proven here."""
    import pytest
    from py4j.protocol import Py4JJavaError

    shard = tmp_path / "big.warc"
    claimed = _write_oversize_shard(shard)

    # the OLD shape: reading the content column refuses the file
    with pytest.raises(Exception) as exc:
        spark.read.format("binaryFile").load(str(shard)).select("content").collect()
    assert "exceeds" in str(exc.value) or "FAILED_READ_FILE" in str(exc.value)

    # the NEW shape: parses fine; the capped payload skips the
    # remainder in O(1) (seek), so this test runs in seconds
    rows = (
        read_warc(spark, str(shard), max_payload_bytes=1024)
        .orderBy("record_idx").collect()
    )
    assert [r.warc_type for r in rows] == ["resource", "response"]
    big = rows[0]
    assert big.content_length == claimed          # claimed size preserved
    assert len(bytes(big.payload)) == 1024        # capped read
    assert big.truncated == "length"              # flagged per ISO 28500
    assert rows[1].http_status == 200 and rows[1].truncated is None


def test_max_payload_bytes_cap_and_warc_truncated_header():
    """Cap semantics at the iterator level + upstream WARC-Truncated
    header passthrough."""
    rec = _record(b"response", b"http://c.com/", HTTP_MSG,
                  b"application/http; msgtype=response")
    upstream = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Truncated: disconnect\r\n"
        b"Content-Length: 3\r\n\r\nabc\r\n\r\n"
    )
    recs = list(iter_warc_records(io.BytesIO(rec + upstream), max_payload_bytes=10))
    assert recs[0].get("truncated") == "length"
    assert recs[0]["content_length"] == len(HTTP_MSG)
    assert recs[1]["truncated"] == "disconnect" and recs[1]["payload"] == b"abc"
    # uncapped record smaller than the cap: no flag
    full = list(iter_warc_records(io.BytesIO(rec), max_payload_bytes=10_000))
    assert full[0]["truncated"] is None and full[0]["payload"] == HTML_BODY


def test_stream_ending_mid_payload_quarantines():
    """content_length claims more bytes than the stream holds: the
    partial record must surface as _malformed, never as a complete
    record with silently short payload (ADVICE r8)."""
    rec = _record(b"response", b"http://t.com/", HTTP_MSG,
                  b"application/http; msgtype=response")
    cut = rec[: len(rec) - 20]  # drop the payload tail + record gap
    recs = list(iter_warc_records(io.BytesIO(cut)))
    assert [r["warc_type"] for r in recs] == ["_malformed"]
    assert recs[0]["content_length"] == len(HTTP_MSG)  # the claim
    # capped variant: skip comes up short -> same quarantine
    recs2 = list(iter_warc_records(io.BytesIO(cut), max_payload_bytes=8))
    assert [r["warc_type"] for r in recs2] == ["_malformed"]


def test_corrupt_deflate_zlib_error_quarantines(spark, tmp_path):
    """Corrupt deflate bytes raise zlib.error (not OSError) out of
    GzipFile.read — that must quarantine the shard remainder, not kill
    the task (ADVICE r8)."""
    good = gzip.compress(_record(b"response", b"http://ok.com/", HTTP_MSG,
                                 b"application/http; msgtype=response"))
    bad = bytearray(gzip.compress(
        _record(b"response", b"http://bad.com/", HTTP_MSG,
                b"application/http; msgtype=response")))
    for i in range(20, 60):  # trash the deflate stream body
        bad[i] ^= 0xFF
    (tmp_path / "a.warc.gz").write_bytes(good)
    (tmp_path / "b.warc.gz").write_bytes(bytes(bad))
    rows = read_warc(spark, str(tmp_path)).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.source_file.rsplit("/", 1)[-1], []).append(r)
    assert [r.warc_type for r in by_file["a.warc.gz"]] == ["response"]
    assert all(r.warc_type == "_malformed" for r in by_file["b.warc.gz"])
    assert b"decompression failed" in bytes(by_file["b.warc.gz"][0].payload)


def test_warc_charset_report_mixed_fixture(spark, tmp_path):
    """Charset composition over a mixed-charset crawl: BOM, declared
    header, meta tag, undeclared-valid-utf8, undeclared-binary."""
    from kafka_streams_task_spark.sources.warc import warc_charset_report

    def resp(uri, body, ctype=b"text/html"):
        return _record(
            b"response", uri,
            b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n\r\n" + body,
            b"application/http; msgtype=response",
        )

    shard = (
        resp(b"http://a.com/", b"\xef\xbb\xbf<p>bom page</p>")
        + resp(b"http://b.com/", "<p>décor</p>".encode("windows-1252"),
               ctype=b"text/html; charset=Windows-1252")
        + resp(b"http://c.com/", b"<html><head><meta charset='GBK'></head>"
               + "<p>你好</p>".encode("gbk") + b"</html>")
        + resp(b"http://d.com/", "<p>plain utf-8 ✓</p>".encode())
        + resp(b"http://e.com/", b"\xff\x00\xfe binary-ish junk")
        + GARBAGE  # malformed rows must be excluded from the report
    )
    (tmp_path / "mix.warc").write_bytes(shard)
    records = read_warc(spark, str(tmp_path))
    rep = {r.charset: r for r in warc_charset_report(records).collect()}
    assert set(rep) == {
        "utf-8-sig", "windows-1252", "gbk", "utf-8", "unknown(non-utf-8)"
    }
    assert all(r.n_records == 1 for r in rep.values())
    assert abs(sum(r.pct_records for r in rep.values()) - 100.0) < 0.1
    assert rep["gbk"].payload_bytes > 0
    # resolved-charset passthrough: after decode_payloads the report
    # groups on the RESOLVED column, not the sniff
    from kafka_streams_task_spark.operators.charset import decode_payloads

    decoded = decode_payloads(records.filter("warc_type = 'response'"))
    rep2 = {r.charset: r.n_records for r in warc_charset_report(decoded).collect()}
    assert rep2.get("windows-1252") == 1 and rep2.get("gbk") == 1


def test_html_links_unquoted_attributes(spark):
    """Unquoted href values are legal HTML and common in old pages —
    they must appear in the link graph (VERDICT r7)."""
    from kafka_streams_task_spark.functions.text import html_links

    html = (
        '<a href="https://q.com/a">q</a>'
        "<a href=/x>rel-unq</a>"
        "<a href=https://a.com/y>abs-unq</a>"
        "<a href=#frag>frag</a>"
        "<a href=mailto:a@b.c>m</a>"
    )
    df = spark.createDataFrame([(html,)], ["html"])
    row = df.select(
        html_links(F.col("html")).alias("abs"),
        html_links(F.col("html"), absolute_only=False).alias("all"),
    ).collect()[0]
    # quoted first, then unquoted appended
    assert row.abs == ["https://q.com/a", "https://a.com/y"]
    assert set(row.all) == {"https://q.com/a", "/x", "https://a.com/y"}


def test_iter_warc_records_never_raises_fuzz():
    """Property: ANY byte stream — garbage, truncated records, corrupted
    framing, binary noise spliced into valid shards — parses to
    completion without raising, and every valid record before the first
    corruption point survives. This is the 'one bad record costs
    itself, never the task' contract the quarantine discipline makes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    valid = _record(b"response", b"http://f.com/", HTTP_MSG,
                    b"application/http; msgtype=response")

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.binary(max_size=200),
                st.just(valid),
                st.just(GARBAGE),
                st.just(b"WARC/1.0\r\n"),          # header with no body
                st.just(b"Content-Length: 99\r\n"),
            ),
            max_size=8,
        ),
        st.integers(min_value=1, max_value=64) | st.none(),
    )
    def run(parts, cap):
        data = b"".join(parts)
        recs = list(iter_warc_records(io.BytesIO(data), max_payload_bytes=cap))
        # every yielded record has the full column dict shape
        for r in recs:
            assert set(r) == {
                "warc_type", "record_id", "target_uri", "warc_date",
                "content_type", "content_length", "http_status",
                "http_content_type", "truncated", "payload",
            }
        # leading valid records always parse cleanly
        n_lead = 0
        for p in parts:
            if p is valid:
                n_lead += 1
            else:
                break
        lead = [r for r in recs[:n_lead]]
        assert all(r["warc_type"] == "response" for r in lead)

    run()


def test_uri_hostile_shard_names(spark, tmp_path):
    """binaryFile emits minimally-encoded paths; a shard named with a
    space is not a valid URI. It must still parse (fallback open), and
    an unopenable path must cost a quarantine row, never the task."""
    d = tmp_path / "sp dir"
    d.mkdir()
    (d / "a b.warc").write_bytes(_shard())
    rows = read_warc(spark, str(d)).collect()
    assert [r.warc_type for r in rows] == ["warcinfo", "request", "response"]
    assert "a b.warc" in rows[0].source_file


def test_r8_capstone_crawl_to_governed_shards(spark, tmp_path):
    """r8 capstone: capped WARC read -> charset health check ->
    documents -> leakage-guarded splits -> budgeted training shards ->
    expectation-gated snapshot commit -> second crawl -> version diff.
    The point is the stages COMPOSE and every governance hook fires."""
    from kafka_streams_task_spark.operators.sampling import (
        assign_splits,
        export_training_shards,
        shard_report,
    )
    from kafka_streams_task_spark.operators.snapshots import (
        snapshot_diff,
        snapshot_read,
        snapshot_write,
    )
    from kafka_streams_task_spark.sources.warc import (
        warc_charset_report,
        warc_to_documents,
    )

    def rec(i):
        # unique WARC-Record-ID per page (the shared _record helper
        # reuses one id, which the pk gate would rightly refuse)
        return (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Record-ID: <urn:uuid:page-{i}>\r\n".encode()
            + f"WARC-Target-URI: http://site{i % 4}.com/p{i}\r\n".encode()
            + b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            + f"Content-Length: {len(HTML_PAGE)}\r\n\r\n".encode()
            + HTML_PAGE + b"\r\n\r\n"
        )

    def crawl(n, start=0):
        return b"".join(rec(start + i) for i in range(n))

    (tmp_path / "a.warc").write_bytes(crawl(12))
    records = read_warc(spark, str(tmp_path / "a.warc"), max_payload_bytes=1 << 20)
    health = warc_charset_report(records).collect()
    assert sum(r.n_records for r in health) == 12

    docs = warc_to_documents(records)
    split = assign_splits(
        docs, {"train": 0.5, "val": 0.25, "test": 0.25}, group_col="domain"
    )
    sharded = export_training_shards(
        split, budget=200, token_col="n_chars", order_col="url_key",
        num_range_partitions=3,
    )
    assert shard_report(sharded, token_col="n_chars", order_col="url_key").count() >= 2

    tbl = str(tmp_path / "corpus")
    v1 = snapshot_write(
        spark, sharded, tbl,
        expectations={"has_text": "n_chars > 0"},
        unique_keys={"pk": ["doc_uid"]},
    )
    assert snapshot_read(spark, tbl, v1).count() == 12

    (tmp_path / "b.warc").write_bytes(crawl(3, start=100))
    docs2 = warc_to_documents(read_warc(spark, str(tmp_path / "b.warc")))
    v2 = snapshot_write(
        spark,
        export_training_shards(
            assign_splits(docs2, {"train": 0.5, "val": 0.25, "test": 0.25},
                          group_col="domain"),
            budget=200, token_col="n_chars", order_col="url_key",
            num_range_partitions=2,
        ),
        tbl,
        expectations={"has_text": "n_chars > 0"},
    )
    d = snapshot_diff(spark, tbl, v1, v2, ["doc_uid"]).collect()
    assert len(d) == 3 and {r.change for r in d} == {"added"}


def test_ingest_report_truncation_visibility(spark, tmp_path):
    """Capped reads surface in the report via n_truncated (a
    claimed-vs-held byte delta is deliberately absent: the HTTP header
    strip makes it nonzero on healthy reads too)."""
    (tmp_path / "a.warc").write_bytes(_shard())
    rep = warc_ingest_report(
        read_warc(spark, str(tmp_path), max_payload_bytes=5)
    ).collect()[0]
    assert rep.n_truncated >= 1
    full = warc_ingest_report(read_warc(spark, str(tmp_path))).collect()[0]
    assert full.n_truncated == 0


def test_read_warc_manifest_list_and_frame(spark, tmp_path):
    """Manifest-driven reads (the Common Crawl warc.paths workflow):
    an explicit shard list or a path DataFrame, with resume composing
    as an anti-join; missing shards quarantine, not crash."""
    from kafka_streams_task_spark.sources.warc import read_warc_manifest

    (tmp_path / "a.warc").write_bytes(_shard())
    (tmp_path / "b.warc").write_bytes(
        _record(b"response", b"http://m.com/", HTTP_MSG,
                b"application/http; msgtype=response")
    )
    manifest = [str(tmp_path / "a.warc"), str(tmp_path / "b.warc")]
    rows = read_warc_manifest(spark, manifest).collect()
    assert len(rows) == 4

    # resume: anti-join out the already-ingested shard
    mdf = spark.createDataFrame([(p,) for p in manifest], "path string")
    done = spark.createDataFrame([(manifest[0],)], "path string")
    remaining = mdf.join(done, on="path", how="left_anti")
    rows2 = read_warc_manifest(spark, remaining, record_types=("response",))
    assert [r.target_uri for r in rows2.collect()] == ["http://m.com/"]

    # a manifest entry that doesn't exist -> quarantine row for it
    rows3 = read_warc_manifest(spark, [str(tmp_path / "gone.warc")]).collect()
    assert len(rows3) == 1 and rows3[0].warc_type == "_malformed"


def test_html_links_href_inside_attribute_values_not_matched(spark):
    """Review r8: 'href=' text inside ANOTHER attribute's quoted value
    must never anchor a link — tracking params and title text were
    fabricating edges (with trailing-quote artifacts)."""
    from kafka_streams_task_spark.functions.text import html_links

    html = (
        '<a href="/out?href=http://tracker.com/x">t</a>'
        '<a title="see href=y" href="https://real.com/">r</a>'
        "<a href=https://unq.com/z>u</a>"
    )
    df = spark.createDataFrame([(html,)], ["html"])
    row = df.select(
        html_links(F.col("html")).alias("abs"),
        html_links(F.col("html"), absolute_only=False).alias("all"),
    ).collect()[0]
    assert row.abs == ["https://real.com/", "https://unq.com/z"]
    assert set(row.all) == {
        "/out?href=http://tracker.com/x", "https://real.com/",
        "https://unq.com/z",
    }
    assert not any('"' in u or u == "y" for u in row.all)


def test_escape_shard_uri_preserves_literal_percent(tmp_path):
    """r9 (ADVICE r8): a non-file shard name containing a literal %XX
    sequence must survive FileSystem.from_uri — from_uri PARSES such a
    name successfully and silently percent-decodes it (opening a
    different object key), so the quote() fallback never triggers. The
    pre-escape turns '%' into '%25', which from_uri decodes back to the
    literal byte. Proven against pyarrow itself via the file:// scheme
    (the only scheme whose decode we can observe in this sandbox;
    _open_shard's own file: branch never URI-parses, so this pins the
    remote-scheme contract)."""
    from pyarrow import fs as pafs

    from kafka_streams_task_spark.sources.warc import _escape_shard_uri

    # the failure mode, demonstrated: raw from_uri decodes %20
    name = tmp_path / "a%20b.warc"
    name.write_bytes(b"payload")
    _, decoded = pafs.FileSystem.from_uri(f"file://{name}")
    assert str(decoded).endswith("a b.warc")  # the WRONG file
    # the fix: pre-escaped URI round-trips to the literal name
    esc = _escape_shard_uri(f"file://{name}")
    assert esc.endswith("a%2520b.warc")
    filesystem, p = pafs.FileSystem.from_uri(esc)
    assert str(p).endswith("a%20b.warc")
    with filesystem.open_input_file(p) as f:
        assert f.read() == b"payload"
    # s3-style key: only the '%' is touched
    assert (
        _escape_shard_uri("s3://bucket/crawl/a%20b c.warc")
        == "s3://bucket/crawl/a%2520b c.warc"
    )
