"""WARC crawl source (sources/warc.py): ISO 28500 framing, gzip, HTTP
payload split, malformed-record quarantine + resync, plan shape."""

from __future__ import annotations

import gzip
import io

import pytest

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
