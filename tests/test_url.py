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


# ---------------------------------------------------------- PSL-exact (r7)


PSL_CASES = [
    # private-section entries: per-publisher keys, NOT lumped to github.io
    ("https://a.github.io/repo", "a.github.io"),
    ("https://b.github.io/", "b.github.io"),
    ("https://deep.x.blogspot.com/p", "x.blogspot.com"),
    ("https://github.io/", None),  # host IS a public suffix
    # multi-part ICANN suffixes
    ("https://a.b.example.co.uk/x", "example.co.uk"),
    ("https://example.com/x", "example.com"),
    ("https://www.example.com/x", "example.com"),
    # canonical wildcard/exception cases from the PSL test data (*.ck, !www.ck)
    ("https://b.test.ck/", "b.test.ck"),
    ("https://a.b.test.ck/", "b.test.ck"),
    ("https://www.ck/", "www.ck"),
    ("https://www.www.ck/", "www.ck"),
    ("https://test.ck/", None),
    # unknown TLD: implicit '*' rule
    ("https://a.b.futuretld/x", "b.futuretld"),
    # hosting buckets (3-label private suffix)
    ("https://bucket.s3.amazonaws.com/k", "bucket.s3.amazonaws.com"),
    # IPv4 passes through whole
    ("https://192.168.10.1/x", "192.168.10.1"),
    ("not a url at all", None),
    # r8 snapshot expansion goldens (VERDICT r7 item 5): entries the
    # r7 subset lacked — EC2 wildcard-private, US k12 locality space,
    # jp city wildcard+exception, uk school wildcard
    ("https://myinstance.us-west-2.compute.amazonaws.com/",
     "myinstance.us-west-2.compute.amazonaws.com"),
    ("https://ec2-1-2-3-4.compute-1.amazonaws.com/", None),  # host IS the ps
    ("https://school.pvt.k12.ma.us/x", "school.pvt.k12.ma.us"),
    ("https://district.k12.ma.us/", "district.k12.ma.us"),
    ("https://sub.city.kobe.jp/", "city.kobe.jp"),       # !city.kobe.jp
    ("https://foo.bar.kobe.jp/", "foo.bar.kobe.jp"),     # *.kobe.jp
    ("https://myschool.sch.uk/", None),                  # *.sch.uk
    ("https://www.myschool.sch.uk/", "www.myschool.sch.uk"),
    ("https://docs.readthedocs.io/en", "docs.readthedocs.io"),
]


def _psl_one(spark, url):
    from kafka_streams_task_spark.functions.url import with_registered_domain_psl

    df = spark.createDataFrame([(url,)], ["url"])
    return with_registered_domain_psl(df).first().registered_domain


@pytest.mark.parametrize("url,dom", PSL_CASES)
def test_registered_domain_psl(spark, url, dom):
    assert _psl_one(spark, url) == dom


def test_psl_plan_is_broadcast_only_no_python(spark):
    """The PSL probe must stay K broadcast hash joins inside the scan
    pipeline: no shuffle, no Python stage, no nested loop."""
    from kafka_streams_task_spark.functions.url import with_registered_domain_psl

    df = spark.createDataFrame([("https://a.github.io/x",)], ["url"])
    plan = (
        with_registered_domain_psl(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan, "PSL probe must not shuffle"
    assert "Python" not in plan and "Arrow" not in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_psl_custom_rules_and_clash_guard(spark):
    from kafka_streams_task_spark.functions.url import with_registered_domain_psl

    df = spark.createDataFrame([("https://x.y.internal/z",)], ["url"])
    out = with_registered_domain_psl(
        df, psl_lines=["// comment", "", "internal", "y.internal"]
    )
    assert out.first().registered_domain == "x.y.internal"
    with pytest.raises(ValueError, match="already has columns"):
        with_registered_domain_psl(out)  # out already carries out_col


def test_psl_composes_with_domain_list_filter(spark):
    """VERDICT r6 item 4 golden: blocking 'a.github.io' must not nuke
    'b.github.io' (suffix-match filter), and the PSL key separates the
    publishers that the heuristic eTLD+1 would merge."""
    from pyspark.sql import Row

    from kafka_streams_task_spark.functions.url import with_registered_domain_psl
    from kafka_streams_task_spark.operators.dedup import filter_by_domain_list

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, url="https://a.github.io/evil"),
            Row(doc_id=2, url="https://sub.a.github.io/evil2"),
            Row(doc_id=3, url="https://b.github.io/fine"),
        ]
    )
    lst = spark.createDataFrame([Row(domain="a.github.io")])
    survivors = {
        r.doc_id for r in filter_by_domain_list(docs, lst, mode="block").collect()
    }
    assert survivors == {3}
    keys = {
        r.doc_id: r.registered_domain
        for r in with_registered_domain_psl(docs).collect()
    }
    assert keys == {1: "a.github.io", 2: "a.github.io", 3: "b.github.io"}


def _psl_reference(host: str, exact: set, wc_tails: set, exc: set):
    """Independent pure-Python PSL resolver, written from the spec
    (publicsuffix.org/list/), sharing NO code with the Spark join
    implementation: exception rule beats all (public suffix = rule minus
    leftmost label), else longest exact/wildcard match, else implicit
    '*'; registrable = public suffix + one label, None if the host IS a
    public suffix."""
    labels = host.split(".")
    n = len(labels)
    exc_len = None
    for k in range(1, n + 1):
        if ".".join(labels[n - k:]) in exc:
            exc_len = k - 1  # max k wins (loop ascends)
    if exc_len is not None:
        ps = exc_len
    else:
        ps = 1
        for k in range(1, n + 1):
            if ".".join(labels[n - k:]) in exact:
                ps = max(ps, k)
            if k >= 2 and ".".join(labels[n - k + 1:]) in wc_tails:
                ps = max(ps, k)
    return ".".join(labels[n - ps - 1:]) if n > ps else None


def test_psl_differential_exhaustive(spark):
    """Differential check: every 1–3-label host over an alphabet chosen
    to hit wildcard TLDs (ck, bd), the exception (www.ck), two-part
    ICANN suffixes (co.uk), private entries (github.io, s3.amazonaws.com
    tails) and unknown TLDs — Spark join plan vs the independent
    reference resolver. One Spark job for all hosts."""
    from kafka_streams_task_spark.functions.url import (
        PSL_SNAPSHOT,
        parse_psl,
        with_registered_domain_psl,
    )

    alpha = ["www", "test", "ck", "bd", "uk", "co", "github", "io", "s3", "amazonaws"]
    hosts = list(alpha)
    hosts += [f"{a}.{b}" for a in alpha for b in alpha]
    hosts += [f"{a}.{b}.{c}" for a in alpha for b in alpha for c in alpha]
    hosts += ["a.b.s3.amazonaws.com", "x.www.ck", "a.b.c.test.ck", "deep.x.github.io"]
    # hosts EQUAL to a multi-label wildcard tail: the rule must NOT
    # match (host has fewer labels than the rule) — r9 regression
    hosts += ["kobe.jp", "sch.uk", "x.kobe.jp", "compute.amazonaws.com"]

    # the SNAPSHOT is the hand-auditable test fixture (r9: the default
    # rule set is the full vendored list) — pass it explicitly so the
    # reference resolver and the join plan see the same rules
    exact, wc_tails, exc = (set(s) for s in parse_psl(PSL_SNAPSHOT.splitlines()))
    expected = {h: _psl_reference(h, exact, wc_tails, exc) for h in hosts}

    df = spark.createDataFrame([(h, f"https://{h}/x") for h in hosts], ["host", "url"])
    got = {
        r.host: r.registered_domain
        for r in with_registered_domain_psl(
            df, psl_lines=PSL_SNAPSHOT.splitlines()
        ).collect()
    }
    mism = {h: (got[h], expected[h]) for h in hosts if got[h] != expected[h]}
    assert not mism, f"{len(mism)} mismatches, e.g. {dict(list(mism.items())[:5])}"


def test_trailing_dot_fqdn(spark):
    """Absolute-form hostnames ('example.com.') must key like their
    relative form — a trailing empty label would collapse the registered
    domain to the bare TLD."""
    assert _one(spark, extract_host, "https://example.com./x") == "example.com"
    assert _one(spark, registered_domain, "https://example.com./x") == "example.com"
    assert _one(spark, registered_domain, "https://a.example.co.uk./x") == "example.co.uk"


#: goldens only the FULL vendored PSL can satisfy (absent from the
#: snapshot fixture): private-section hosting suffixes, a 5-label
#: dualstack S3 rule, a wildcard the subset never carried, and IDN
#: rules in both U-label and A-label (punycode) host forms
PSL_FULL_ONLY_CASES = [
    ("https://mybox.duckdns.org/x", "mybox.duckdns.org"),
    ("https://api.tunnel.ngrok.io/x", "tunnel.ngrok.io"),
    ("https://cool-app.fly.dev/x", "cool-app.fly.dev"),
    ("https://proj.glitch.me/x", "proj.glitch.me"),
    ("https://x.eu.org/", "x.eu.org"),
    # 5-label exact rule: s3.dualstack.ap-south-1.amazonaws.com
    (
        "https://bkt.s3.dualstack.ap-south-1.amazonaws.com/k",
        "bkt.s3.dualstack.ap-south-1.amazonaws.com",
    ),
    # *.nom.br wildcard (subset has only the flat com.br family):
    # smith.nom.br IS the public suffix; one more label registers
    ("https://smith.nom.br/", None),
    ("https://x.smith.nom.br/", "x.smith.nom.br"),
    ("https://y.x.smith.nom.br/", "x.smith.nom.br"),
    # IDN rule 公司.cn, matched through its punycode twin: crawled URLs
    # carry A-label hosts, and extract_host's try_parse_url is
    # URI-strict (a raw U-label host is not a valid URI -> NULL), so
    # the twin registration is what makes the PSL's U-label rule bite
    ("https://foo.xn--55qx5d.cn/", "foo.xn--55qx5d.cn"),
    ("https://xn--55qx5d.cn/", None),  # the suffix itself: no domain
    # still a public suffix on the full list -> no registrable domain
    ("https://duckdns.org/", None),
]


@pytest.mark.parametrize("url,dom", PSL_FULL_ONLY_CASES)
def test_registered_domain_psl_full_list_defaults(spark, url, dom):
    """r9 (VERDICT r8 item 4): the DEFAULT rule set is the full vendored
    public_suffix_list.dat — these hosts resolve correctly only with
    rules the snapshot subset never contained, on defaults, with no
    warning to miss."""
    assert _psl_one(spark, url) == dom


def test_psl_full_list_loads_once_and_is_big(spark):
    from kafka_streams_task_spark.functions.url import (
        load_psl_lines,
        parse_psl,
    )

    lines = load_psl_lines()
    assert lines is load_psl_lines()  # cached, one read per process
    exact, wc, exc = parse_psl(lines)
    # the full list's scale (with punycode twins), not a subset's
    assert len(exact) > 9000 and len(wc) > 100 and len(exc) >= 8
    assert "duckdns.org" in exact and "xn--55qx5d.cn" in exact


def test_psl_differential_full_list_sample(spark):
    """The independent reference resolver agrees with the join plan on
    the FULL vendored list too — sampled hosts built from full-list
    rules of every shape (exact, deep exact, wildcard, exception,
    private, IDN twin)."""
    from kafka_streams_task_spark.functions.url import (
        load_psl_lines,
        parse_psl,
        with_registered_domain_psl,
    )

    hosts = [
        "a.b.duckdns.org", "duckdns.org", "x.ngrok.io", "ngrok.io",
        "b.s3.dualstack.ap-south-1.amazonaws.com",
        "s3.dualstack.ap-south-1.amazonaws.com",
        "q.w.nom.br", "w.nom.br", "nom.br",
        "www.ck", "x.www.ck", "deep.y.ck",
        "foo.xn--55qx5d.cn", "xn--55qx5d.cn",
        "plain.example.com", "com", "unknown-tld-host.zzztld",
    ]
    exact, wc_tails, exc = (set(s) for s in parse_psl(load_psl_lines()))
    expected = {h: _psl_reference(h, exact, wc_tails, exc) for h in hosts}
    df = spark.createDataFrame(
        [(h, f"https://{h}/x") for h in hosts], ["host", "url"]
    )
    got = {
        r.host: r.registered_domain
        for r in with_registered_domain_psl(df).collect()
    }
    mism = {h: (got[h], expected[h]) for h in hosts if got[h] != expected[h]}
    assert not mism, mism


def test_puny_twin_is_idna2008():
    """IDNA2008/UTS#46 twins (advice r9): the stdlib codec's IDNA2003
    mapping folds eszett ('faß' → 'fass'), producing a twin that matches
    the WRONG hosts; 2008 keeps the distinct A-label. Symbols that 2003
    happily encoded ('☃') are rejected outright in 2008 — no twin, not a
    wrong one."""
    from kafka_streams_task_spark.functions.url import _puny_twin

    assert _puny_twin("faß.de") == "xn--fa-hia.de"  # 2003 said fass.de
    assert _puny_twin("公司.cn") == "xn--55qx5d.cn"
    assert _puny_twin("☃.de") is None


def test_parse_psl_tallies_skipped_twins(caplog):
    """Rules whose label IDNA2008 rejects keep their U-label entry and
    log ONE warning counting the skipped twins."""
    import logging

    from kafka_streams_task_spark.functions.url import parse_psl

    with caplog.at_level(logging.WARNING, "kafka_streams_task_spark.functions.url"):
        exact, wc, exc = parse_psl(["de", "☃.de", "公司.cn"])
    assert "☃.de" in exact  # U-label form still registered
    assert "xn--55qx5d.cn" in exact  # encodable rule still twinned
    warns = [r for r in caplog.records if "A-label twin" in r.getMessage()]
    assert len(warns) == 1 and "1 IDN rule" in warns[0].getMessage()


def test_psl_idna2008_twin_end_to_end(spark):
    """A host under the eszett suffix's A-label matches the rule's 2008
    twin: registrable = one label past 'xn--fa-hia.de'. The 2003 twin
    ('fass.de') would have dropped this host to the 'de' rule and called
    'xn--fa-hia.de' itself the registrable domain."""
    from kafka_streams_task_spark.functions.url import with_registered_domain_psl

    df = spark.createDataFrame(
        [("https://foo.xn--fa-hia.de/x",), ("https://foo.fass.de/x",)], ["url"]
    )
    got = {
        r.url: r.registered_domain
        for r in with_registered_domain_psl(
            df, psl_lines=["de", "faß.de"]
        ).collect()
    }
    assert got["https://foo.xn--fa-hia.de/x"] == "foo.xn--fa-hia.de"
    # plain-ASCII host under 'de' only: registrable = fass.de
    assert got["https://foo.fass.de/x"] == "fass.de"
