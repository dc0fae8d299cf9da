"""Exact charset decoding + entity unescape (operators/charset.py)."""

from __future__ import annotations

import codecs

from pyspark.sql import functions as F

from kafka_streams_task_spark.operators.charset import (
    decode_payloads,
    resolve_charset,
    unescape_entities,
)

GBK_TEXT = "中文网页"
LATIN_TEXT = "café résumé"


def test_resolve_charset_precedence():
    # BOM beats everything
    assert resolve_charset(codecs.BOM_UTF8 + b"x", "text/html; charset=gbk") == "utf-8-sig"
    # declared header beats meta
    body = b'<meta charset="latin-1">' + GBK_TEXT.encode("gbk")
    assert resolve_charset(body, "text/html; charset=GBK") == "GBK"
    # meta beats sniffing
    assert resolve_charset(body, "text/html") == "latin-1"
    # unknown declared charset falls through to sniff, never raises
    assert resolve_charset("é".encode("utf-8"), "text/html; charset=bogus-enc") == "utf-8"
    # utf-8 strict, then latin-1 (cannot fail)
    assert resolve_charset(LATIN_TEXT.encode("utf-8"), None) == "utf-8"
    assert resolve_charset(LATIN_TEXT.encode("latin-1"), None) == "latin-1"


def test_decode_payloads_mixed_charsets(spark):
    rows = [
        (1, GBK_TEXT.encode("gbk"), "text/html; charset=gbk"),
        (2, LATIN_TEXT.encode("latin-1"), "text/html"),
        (3, "plain utf-8 ü".encode("utf-8"), None),
        (4, None, "text/html"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary, http_content_type string")
    out = {r.doc_id: r for r in decode_payloads(df).collect()}
    assert out[1].text == GBK_TEXT and out[1].charset == "gbk"
    assert out[2].text == LATIN_TEXT and out[2].charset == "latin-1"
    assert out[3].text == "plain utf-8 ü" and out[3].charset == "utf-8"
    assert out[4].text is None and out[4].charset is None
    assert "payload" not in out[1].asDict()  # dropped by default
    kept = decode_payloads(df, drop_payload=False)
    assert "payload" in kept.columns


def test_decode_payloads_is_one_arrow_stage(spark):
    df = spark.createDataFrame(
        [(1, b"x", "text/plain")],
        "doc_id long, payload binary, http_content_type string",
    )
    plan = decode_payloads(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_unescape_entities_full_set(spark):
    df = spark.createDataFrame(
        [("&amp;lt; &#120; &aacute; &unknown;",), (None,)], ["t"]
    )
    rows = df.select(unescape_entities("t").alias("u")).collect()
    # &amp;lt; -> &lt; (single pass, no double-unescape), numeric &#120; -> x,
    # full named set (&aacute;), unknown entities left alone
    assert rows[0].u == "&lt; x á &unknown;"
    assert rows[1].u is None


def test_decode_composes_with_warc_pipeline(spark, tmp_path):
    """Exact-charset twin of warc_to_documents' utf-8 cast: a GBK page
    round-trips through read_warc + decode_payloads + html_to_text."""
    from kafka_streams_task_spark.functions.text import clean_text, html_to_text
    from kafka_streams_task_spark.sources.warc import read_warc

    page_html = f"<html><body><p>{GBK_TEXT}</p></body></html>".encode("gbk")
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=gbk\r\n\r\n"
        + page_html
    )
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://cn.example.com/\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n"
        b"\r\n" + http + b"\r\n\r\n"
    )
    (tmp_path / "a.warc").write_bytes(rec)
    recs = read_warc(spark, str(tmp_path))
    decoded = decode_payloads(recs)
    out = decoded.select(
        "charset", clean_text(html_to_text(F.col("text"))).alias("t")
    ).collect()[0]
    assert out.charset == "gbk" and out.t == GBK_TEXT


def test_warc_to_documents_exact_charset(spark, tmp_path):
    """exact_charset=True recovers a GBK page the default utf-8 cast
    mangles; the charset filter runs before the Arrow decode."""
    from kafka_streams_task_spark.sources.warc import read_warc, warc_to_documents

    page_html = f"<html><body><p>{GBK_TEXT}</p></body></html>".encode("gbk")
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=gbk\r\n\r\n"
        + page_html
    )
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:r1>\r\n"
        b"WARC-Target-URI: http://cn.example.com/\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n"
        b"\r\n" + http + b"\r\n\r\n"
    )
    (tmp_path / "a.warc").write_bytes(rec)
    recs = read_warc(spark, str(tmp_path))
    exact = warc_to_documents(recs, exact_charset=True).collect()
    assert len(exact) == 1 and exact[0].text == GBK_TEXT
    lossy = warc_to_documents(recs).collect()
    assert lossy[0].text != GBK_TEXT  # default cast mangles GBK
    # same output schema either way
    assert warc_to_documents(recs, exact_charset=True).columns == \
        warc_to_documents(recs).columns


def test_bytes_codec_declarations_fall_through():
    """'hex'/'zip'/'rot13' pass codecs.lookup but are NOT text codecs —
    a page declaring one must fall through to sniffing, not crash the
    decode task (review r7)."""
    for bad in ("hex", "zip", "base64", "rot13"):
        assert resolve_charset("é".encode("utf-8"), f"text/html; charset={bad}") == "utf-8"
    body = b'<meta charset="hex">caf\xe9'
    assert resolve_charset(body, None) == "latin-1"
