"""URL normalization / domain extraction (functions/url.py r6): the
crawl-pipeline keys for domain-level mixing and URL-level exact dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_task_spark.functions.url import (
    extract_host,
    normalize_url,
    registered_domain,
)


def _one(spark, fn, url):
    return spark.createDataFrame([(url,)], ["u"]).select(fn("u").alias("v")).first().v


HOST_CASES = [
    ("https://Example.COM/path?q=1", "example.com"),
    ("http://sub.example.co.uk:8080/x", "sub.example.co.uk"),
    ("//cdn.example.org/lib.js", "cdn.example.org"),
    ("example.net/page", "example.net"),
    ("https://192.168.10.1:8443/admin", "192.168.10.1"),
    ("not a url at all", None),
]


@pytest.mark.parametrize("url,host", HOST_CASES)
def test_extract_host(spark, url, host):
    assert _one(spark, extract_host, url) == host


DOMAIN_CASES = [
    ("https://a.b.example.com/x", "example.com"),
    ("https://example.com/x", "example.com"),
    ("https://www.example.co.uk/x", "example.co.uk"),
    ("https://deep.sub.example.com.au/x", "example.com.au"),
    ("https://example.org", "example.org"),
    ("https://localhost/x", "localhost"),
    ("https://192.168.10.1/x", "192.168.10.1"),  # IPs pass through whole
]


@pytest.mark.parametrize("url,dom", DOMAIN_CASES)
def test_registered_domain(spark, url, dom):
    assert _one(spark, registered_domain, url) == dom


NORM_CASES = [
    # case + default port + fragment
    ("HTTPS://Example.COM:443/Path#frag", "https://example.com/Path"),
    ("http://example.com:80/", "http://example.com/"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    # tracking params stripped, real params kept in order
    (
        "https://example.com/a?utm_source=tw&id=5&fbclid=XYZ&x=2",
        "https://example.com/a?id=5&x=2",
    ),
    ("https://example.com/a?utm_campaign=c", "https://example.com/a"),
    # empty path normalized
    ("https://example.com", "https://example.com/"),
    ("not a url at all", None),
]


@pytest.mark.parametrize("url,norm", NORM_CASES)
def test_normalize_url(spark, url, norm):
    assert _one(spark, normalize_url, url) == norm


def test_normalized_urls_dedup_to_one_key(spark):
    variants = [
        "https://Example.com/page?utm_source=a",
        "https://example.com:443/page",
        "HTTPS://EXAMPLE.COM/page#section",
    ]
    df = spark.createDataFrame([(v,) for v in variants], ["u"])
    n = df.select(normalize_url("u").alias("k")).distinct().count()
    assert n == 1


def test_url_functions_are_codegen_only(spark):
    """No Python stage: the whole projection must stay JVM-side."""
    df = spark.createDataFrame([("https://a.example.co.uk/x?utm_a=1&q=2",)], ["u"])
    plan = (
        df.select(
            extract_host("u"), registered_domain("u"), normalize_url("u")
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Arrow" not in plan


def test_normalize_scheme_relative_and_bare(spark):
    assert (
        _one(spark, normalize_url, "//cdn.example.org/lib.js")
        == "http://cdn.example.org/lib.js"
    )
    assert (
        _one(spark, normalize_url, "example.net/page?x=1")
        == "http://example.net/page?x=1"
    )


def test_normalize_keeps_functional_ref_param(spark):
    """'ref' is functional on major sites (GitHub's ?ref=<branch>) — the
    default strip-list must not collapse distinct pages; a caller who
    knows their corpus can widen the pattern per call."""
    assert (
        _one(spark, normalize_url, "https://example.com/tree?ref=main")
        == "https://example.com/tree?ref=main"
    )
    custom = lambda c: normalize_url(c, strip_params_re=r"^(utm_[A-Za-z0-9_]*|ref)=")
    assert _one(spark, custom, "https://example.com/tree?ref=main") == "https://example.com/tree"


def test_trailing_dot_fqdn(spark):
    """Absolute-form hostnames ('example.com.') must key like their
    relative form — a trailing empty label would collapse the registered
    domain to the bare TLD."""
    assert _one(spark, extract_host, "https://example.com./x") == "example.com"
    assert _one(spark, registered_domain, "https://example.com./x") == "example.com"
    assert _one(spark, registered_domain, "https://a.example.co.uk./x") == "example.co.uk"
