"""Differential property test: the LIKE-compiled robots matcher vs an
independent regex-based RFC 9309 reference. Few hypothesis examples,
many generated (pattern, path) pairs per example — each example is one
Spark job over the whole batch."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_task_spark.operators.robots import parse_robots, robots_allowed

# pattern alphabet exercises the LIKE translation's risk surface:
# wildcards (*), anchors ($), LIKE metachars (%, _), the escape char
# itself (\), and plain url characters
_PAT_CHARS = "ab/*$%_\\."
_PATH_CHARS = "ab/%_$.*?x"


def _ref_match(pattern: str, target: str) -> bool:
    """Independent RFC 9309 path matcher: '*' spans anything, a trailing
    '$' anchors the end, everything else is literal (prefix match)."""
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    rx = "^" + ".*".join(re.escape(p) for p in core.split("*"))
    if anchored:
        rx += "$"
    return re.search(rx, target) is not None


@st.composite
def _cases(draw):
    n = draw(st.integers(min_value=20, max_value=60))
    pats = draw(
        st.lists(
            st.text(alphabet=_PAT_CHARS, min_size=1, max_size=8),
            min_size=1, max_size=6, unique=True,
        )
    )
    paths = draw(
        st.lists(
            st.text(alphabet=_PATH_CHARS, min_size=0, max_size=10),
            min_size=n, max_size=n,
        )
    )
    return pats, paths


@settings(max_examples=5, deadline=None)
@given(_cases())
def test_like_matcher_agrees_with_reference(spark, case):
    pats, paths = case
    pats = ["/" + p for p in pats]
    robots_body = "User-agent: *\n" + "\n".join(f"Disallow: {p}" for p in pats)
    rules = parse_robots(
        spark.createDataFrame([("t.com", robots_body)], ["domain", "robots_txt"])
    )
    urls = spark.createDataFrame(
        [("t.com", f"http://t.com/{p}") for p in paths], ["domain", "url"]
    )
    got = {r.url: r.allowed for r in robots_allowed(urls, rules).collect()}
    for p in paths:
        target = "/" + p
        expect_blocked = any(_ref_match(pat, target) for pat in pats)
        assert got[f"http://t.com/{p}"] == (not expect_blocked), (
            f"pattern set {pats!r} vs target {target!r}: "
            f"spark={got[f'http://t.com/{p}']} ref_blocked={expect_blocked}"
        )


# ---------------------------------------------------------------------------
# WARC round-trip property: serialize random records -> parse -> equal.
# Payloads deliberately include CRLFCRLF and "WARC/1.0" markers: only
# Content-Length framing parses these; blank-line splitting would shred
# them. Pure-Python (no Spark) — generous example budget.
# ---------------------------------------------------------------------------

import io

from kafka_streams_task_spark.sources.warc import iter_warc_records

_PAYLOAD = st.binary(min_size=0, max_size=64) | st.sampled_from(
    [b"\r\n\r\n", b"WARC/1.0\r\n", b"a\r\n\r\nWARC/1.0\r\nb", b"\r\nWARC/"]
)


@st.composite
def _warc_records(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    recs = []
    for i in range(n):
        wt = draw(st.sampled_from(["response", "request", "metadata", "warcinfo"]))
        payload = draw(_PAYLOAD)
        uri = f"http://x.com/{i}"
        recs.append((wt, uri, payload))
    return recs


def _serialize(recs) -> bytes:
    out = bytearray()
    for wt, uri, payload in recs:
        out += (
            b"WARC/1.0\r\n"
            b"WARC-Type: " + wt.encode() + b"\r\n"
            b"WARC-Target-URI: " + uri.encode() + b"\r\n"
            b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
            b"\r\n" + payload + b"\r\n\r\n"
        )
    return bytes(out)


@settings(max_examples=200, deadline=None)
@given(_warc_records())
def test_warc_roundtrip_content_length_framing(recs):
    parsed = list(iter_warc_records(io.BytesIO(_serialize(recs)), strip_http_headers=False))
    assert [(r["warc_type"], r["target_uri"], r["payload"]) for r in parsed] == [
        (wt, uri, payload) for wt, uri, payload in recs
    ], "round-trip must be exact regardless of payload contents"
    assert all(r["content_length"] == len(p) for r, (_, _, p) in zip(parsed, recs))
