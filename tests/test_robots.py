"""robots.txt parsing + RFC 9309 matching (operators/robots.py)."""

from __future__ import annotations

from kafka_streams_task_spark.operators.robots import parse_robots, robots_allowed

ROBOTS_A = """\
# comment line
User-agent: *
Disallow: /private/
Allow: /private/public$
Crawl-delay: 10

User-agent: specialbot
User-agent: otherbot
Disallow: /
Allow: /welcome*
Sitemap: https://a.com/sitemap.xml
Disallow:
"""


def _rules(spark):
    df = spark.createDataFrame([("a.com", ROBOTS_A)], ["domain", "robots_txt"])
    return parse_robots(df)


def test_parse_robots_groups_and_directives(spark):
    rows = sorted(
        (r.agent, r.is_allow, r.path) for r in _rules(spark).collect()
    )
    # group 1: '*'; group 2: BOTH specialbot and otherbot get both rules;
    # comments/Sitemap/Crawl-delay/empty Disallow dropped
    assert rows == [
        ("*", False, "/private/"),
        ("*", True, "/private/public$"),
        ("otherbot", False, "/"),
        ("otherbot", True, "/welcome*"),
        ("specialbot", False, "/"),
        ("specialbot", True, "/welcome*"),
    ]
    r = {x.path: x for x in _rules(spark).collect() if x.agent == "*"}
    assert r["/private/"].like_pattern == "/private/%"
    assert r["/private/public$"].like_pattern == "/private/public"  # anchored
    assert r["/private/"].pattern_len == 9


def test_robots_allowed_precedence(spark):
    rules = _rules(spark)
    urls = spark.createDataFrame(
        [
            ("a.com", "http://a.com/open/page"),         # no rule -> allowed
            ("a.com", "http://a.com/private/x"),         # disallow /private/
            ("a.com", "http://a.com/private/public"),    # longer allow + $ anchor
            ("a.com", "http://a.com/private/public2"),   # $ anchor must NOT match
            ("b.com", "http://b.com/anything"),          # no robots.txt -> allowed
        ],
        ["domain", "url"],
    )
    got = {r.url.rsplit("/", 1)[-1]: r.allowed
           for r in robots_allowed(urls, rules, agent="anybot").collect()}
    assert got == {
        "page": True, "x": False, "public": True, "public2": False,
        "anything": True,
    }


def test_robots_agent_group_shadows_star(spark):
    rules = _rules(spark)
    urls = spark.createDataFrame(
        [
            ("a.com", "http://a.com/welcome/home"),  # specialbot: Allow /welcome*
            ("a.com", "http://a.com/open/page"),     # specialbot: Disallow / wins
            ("a.com", "http://a.com/private/public"),  # '*' group does NOT apply
        ],
        ["domain", "url"],
    )
    got = {r.url.rsplit("/", 1)[-1]: r.allowed
           for r in robots_allowed(urls, rules, agent="SpecialBot").collect()}
    # agent matching is case-insensitive; its group fully shadows '*'
    assert got == {"home": True, "page": False, "public": False}


def test_robots_wildcard_and_query_matching(spark):
    body = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /search?*sort=\n"
    rules = parse_robots(
        spark.createDataFrame([("c.com", body)], ["domain", "robots_txt"])
    )
    urls = spark.createDataFrame(
        [
            ("c.com", "http://c.com/docs/file.pdf"),
            ("c.com", "http://c.com/docs/file.pdf?dl=1"),  # $ anchor: query breaks match
            ("c.com", "http://c.com/search?q=x&sort=asc"),
            ("c.com", "http://c.com/search?q=x"),
        ],
        ["domain", "url"],
    )
    got = {r.url: r.allowed for r in robots_allowed(urls, rules).collect()}
    assert got["http://c.com/docs/file.pdf"] is False
    assert got["http://c.com/docs/file.pdf?dl=1"] is True
    assert got["http://c.com/search?q=x&sort=asc"] is False
    assert got["http://c.com/search?q=x"] is True


def test_robots_like_metachars_are_literal(spark):
    body = "User-agent: *\nDisallow: /100%_off\n"
    rules = parse_robots(
        spark.createDataFrame([("d.com", body)], ["domain", "robots_txt"])
    )
    urls = spark.createDataFrame(
        [
            ("d.com", "http://d.com/100%_off/deal"),  # literal match -> blocked
            ("d.com", "http://d.com/100X_off/deal"),  # % is NOT a wildcard
            ("d.com", "http://d.com/100%Xoff/deal"),  # _ is NOT a wildcard
        ],
        ["domain", "url"],
    )
    got = {r.url: r.allowed for r in robots_allowed(urls, rules).collect()}
    assert got["http://d.com/100%_off/deal"] is False
    assert got["http://d.com/100X_off/deal"] is True
    assert got["http://d.com/100%Xoff/deal"] is True


def test_robots_plan_is_relational_only(spark):
    rules = _rules(spark)
    urls = spark.createDataFrame([("a.com", "http://a.com/x")], ["domain", "url"])
    plan = (
        robots_allowed(urls, rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
    assert "CartesianProduct" not in plan


SITEMAP_XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.com/page1?x=1&amp;y=2</loc><lastmod>2026-01-01</lastmod></url>
  <url><loc> https://a.com/page2 </loc></url>
</urlset>"""

SITEMAP_INDEX = """<sitemapindex>
  <sitemap><loc>https://a.com/sm1.xml</loc><lastmod>2026-02-02</lastmod></sitemap>
  <sitemap><loc>https://a.com/sm2.xml</loc></sitemap>
</sitemapindex>"""


def test_extract_sitemaps_from_robots(spark):
    from kafka_streams_task_spark.operators.robots import extract_sitemaps

    df = spark.createDataFrame([("a.com", ROBOTS_A)], ["domain", "robots_txt"])
    rows = extract_sitemaps(df).collect()
    assert [(r.domain, r.sitemap_url) for r in rows] == [
        ("a.com", "https://a.com/sitemap.xml")
    ]


def test_parse_sitemap_urls_and_index(spark):
    from kafka_streams_task_spark.operators.robots import parse_sitemap_urls

    df = spark.createDataFrame(
        [("a.com", SITEMAP_XML), ("a.com", SITEMAP_INDEX)],
        ["domain", "sitemap_xml"],
    )
    rows = sorted(
        (r.is_index, r.loc, r.lastmod) for r in parse_sitemap_urls(df).collect()
    )
    assert rows == [
        (False, "https://a.com/page1?x=1&y=2", "2026-01-01"),  # entity decoded
        (False, "https://a.com/page2", None),                  # trimmed, no lastmod
        (True, "https://a.com/sm1.xml", "2026-02-02"),
        (True, "https://a.com/sm2.xml", None),
    ]
    plan = (
        parse_sitemap_urls(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Arrow" not in plan


def test_empty_allow_all_group_shadows_star(spark):
    """'User-agent: goodbot / Disallow:' is the standard whitelist
    idiom: the rule-less group must still shadow '*' (allow-all), not
    fall through to '*''s Disallow (review r7)."""
    body = "User-agent: goodbot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    rules = parse_robots(
        spark.createDataFrame([("e.com", body)], ["domain", "robots_txt"])
    )
    urls = spark.createDataFrame(
        [("e.com", "http://e.com/anything")], ["domain", "url"]
    )
    assert robots_allowed(urls, rules, agent="goodbot").collect()[0].allowed is True
    assert robots_allowed(urls, rules, agent="otherbot").collect()[0].allowed is False


def test_authorityless_urls_match_as_paths(spark):
    """Path-only and host-relative url values must be matched by path,
    not collapsed to '/' (review r7)."""
    body = "User-agent: *\nDisallow: /private/\n"
    rules = parse_robots(
        spark.createDataFrame([("f.com", body)], ["domain", "robots_txt"])
    )
    urls = spark.createDataFrame(
        [
            ("f.com", "/private/x"),
            ("f.com", "f.com/private/x"),
            ("f.com", "/open/x"),
            ("f.com", "f.com"),
        ],
        ["domain", "url"],
    )
    got = {r.url: r.allowed for r in robots_allowed(urls, rules).collect()}
    assert got == {
        "/private/x": False, "f.com/private/x": False,
        "/open/x": True, "f.com": True,
    }


def test_crawl_delays_group_scoping(spark):
    """r8 crawl_delays: agent group shadows '*', max of duplicates,
    non-numeric ignored, undeclared domains absent."""
    from kafka_streams_task_spark.operators.robots import crawl_delays

    bodies = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nCrawl-delay: 2\n\n"
                      "User-agent: trainbot\nCrawl-delay: 0.5"),
            ("b.com", "User-agent: *\nCrawl-delay: 1\nCrawl-delay: 3"),
            ("c.com", "User-agent: *\nCrawl-delay: soon"),   # ignored
            ("d.com", "User-agent: *\nDisallow: /x"),        # none declared
        ],
        "domain string, robots_txt string",
    )
    got = {r.domain: r.crawl_delay_s for r in crawl_delays(bodies, agent="trainbot").collect()}
    assert got == {"a.com": 0.5, "b.com": 3.0}
    star = {r.domain: r.crawl_delay_s for r in crawl_delays(bodies).collect()}
    assert star == {"a.com": 2.0, "b.com": 3.0}
    plan = crawl_delays(bodies)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "CartesianProduct" not in plan


def test_crawl_delays_groups_separated_by_rules_and_shadowing(spark):
    """Review r8: UA blocks separated only by rule lines must stay
    distinct groups, and an agent whose group declares NO delay shadows
    '*' (no inheritance)."""
    from kafka_streams_task_spark.operators.robots import crawl_delays

    bodies = spark.createDataFrame(
        [
            # rule lines between the two UA blocks: must NOT merge
            ("a.com", "User-agent: *\nDisallow: /x\n\n"
                      "User-agent: fastbot\nCrawl-delay: 1"),
            # trainbot's group has rules but no delay; '*' declares 60:
            # trainbot must get NO delay row (shadowed, not inherited)
            ("b.com", "User-agent: trainbot\nDisallow: /a\n\n"
                      "User-agent: *\nCrawl-delay: 60"),
        ],
        "domain string, robots_txt string",
    )
    other = {r.domain: r.crawl_delay_s
             for r in crawl_delays(bodies, agent="otherbot").collect()}
    assert other == {"b.com": 60.0}  # a.com's '*' group has no delay
    fast = {r.domain: r.crawl_delay_s
            for r in crawl_delays(bodies, agent="fastbot").collect()}
    assert fast == {"a.com": 1.0, "b.com": 60.0}
    train = {r.domain: r.crawl_delay_s
             for r in crawl_delays(bodies, agent="trainbot").collect()}
    assert train == {}, train  # shadowed on b.com, undeclared on a.com
