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
