"""robots.txt parsing + URL matching (RFC 9309) — crawl-compliance
filtering as relational plans.

Training-data pipelines increasingly must honor robots exclusions
retroactively (a domain that opts out today wants yesterday's pages out
of the corpus too). That makes robots filtering a CORPUS operator, not
just a crawler concern: join the harvested robots.txt table against the
document table and drop what the site disallows.

Spark-first shape — both halves are pure relational plans, no Python:

* :func:`parse_robots` explodes robots bodies into lines and rebuilds
  the RFC 9309 group structure with two windows (a lag to find
  user-agent block starts, a running sum to number groups), yielding
  one row per (domain, agent, rule).
* :func:`robots_allowed` matches URL paths against rules with SQL
  ``LIKE`` over a COLUMN pattern (robots wildcards translate exactly:
  ``*`` → ``%``, trailing ``$`` → anchored, everything else literal —
  cheaper than regex), then resolves precedence per RFC 9309: most
  specific (longest) rule wins, ties break toward allow, no matching
  rule or no robots.txt means allowed.

Scale shape: rules join documents on the domain key — the natural
pre-partitioning for a crawl corpus (same key as blocklists and mix
rates). Per-domain rule counts are tens, so the per-URL fan-out is
bounded; the decisive-rule window partitions by URL and never sees more
than that fan-out. Percent-encoding equivalence (RFC 9309 §2.2.2) is
NOT normalized here — feed both sides through
``functions/url.py:normalize_url`` first for canonical comparisons.

Reference provenance: no analogue in idavkaev/kafka-streams-task; part
of the 100 TB training-data-pipeline extension surface (SURVEY.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIVE_RE = r"(?i)^[ \t]*(user-agent|allow|disallow)[ \t]*:[ \t]*([^#]*)"


def _like_pattern(path: Column) -> Column:
    """Robots path pattern → SQL LIKE pattern: escape LIKE's ``%``/``_``
    metacharacters (and ``\\`` itself), map ``*`` → ``%``, honor a
    trailing ``$`` end-anchor (LIKE is full-match, so anchoring means
    NOT appending the trailing ``%``)."""
    esc = F.regexp_replace(path, r"([\\%_])", r"\\$1")
    anchored = esc.endswith("$")
    stripped = F.when(anchored, esc.substr(F.lit(1), F.length(esc) - 1)).otherwise(esc)
    wild = F.replace(stripped, F.lit("*"), F.lit("%"))
    return F.when(anchored, wild).otherwise(F.concat(wild, F.lit("%")))


def _grouped_lines(
    df: DataFrame, domain_col: str, text_col: str, directive_re: str
) -> DataFrame:
    """Shared group-reconstruction chain: posexplode bodies into lines,
    keep recognized directive lines (lowercased directive, trimmed
    value), and rebuild RFC 9309 groups with the lag + running-sum
    window pair. ``directive_re`` must capture (directive, value).

    opt-r16: the projected bodies go through ``fan_out_scan`` first —
    the line explode + two regexp extractions fuse into the scan stage,
    and a single-split source (the local single-row-group fixtures; one
    hot partition in production) would run all of that CPU in one task
    (guide §2.5 "input skew")."""
    from ..schemas import fan_out_scan

    lines = (
        fan_out_scan(
            df.select(F.col(domain_col).alias("domain"), F.col(text_col).alias("_txt"))
        )
        .select(
            "domain",
            # posexplode_outer + the `directive != ""` filter below (which
            # references generated columns, so it cannot sink): a plain
            # posexplode makes the optimizer infer `size(split(..)) > 0`
            # and push it below the fan-out exchange, re-running the line
            # split serially in the scan task. split() never yields an
            # empty array, so outer only adds null-line rows for null
            # bodies, which the directive filter drops like before.
            F.posexplode_outer(F.split(F.col("_txt"), "\r?\n")).alias(
                "line_no", "line"
            ),
        )
        .select(
            "domain",
            "line_no",
            F.lower(F.regexp_extract("line", directive_re, 1)).alias("directive"),
            F.trim(F.regexp_extract("line", directive_re, 2)).alias("value"),
        )
        .filter(F.col("directive") != "")
    )
    w = Window.partitionBy("domain").orderBy("line_no")
    # a user-agent line whose previous directive line is NOT user-agent
    # starts a new group; the running sum of starts numbers the groups
    return lines.withColumn(
        "_starts",
        (
            (F.col("directive") == "user-agent")
            & (F.coalesce(F.lag("directive").over(w), F.lit("")) != "user-agent")
        ).cast("int"),
    ).withColumn("group_id", F.sum("_starts").over(w))


def parse_robots(
    df: DataFrame, domain_col: str = "domain", text_col: str = "robots_txt"
) -> DataFrame:
    """Explode harvested robots.txt bodies into RFC 9309 rules: one row
    per ``(domain, agent, is_allow, path, pattern_len, like_pattern)``.

    Group semantics per the RFC: consecutive ``User-agent`` lines start
    a group and ALL name that group's agents; the ``Allow``/``Disallow``
    lines that follow (until the next agent block) apply to every agent
    of the group. Comments (``#``), unknown directives (Sitemap,
    Crawl-delay, …) and empty-path rules ("Disallow:" = no restriction)
    are dropped — but a group left with NO rules still emits one
    null-path marker row: "User-agent: goodbot / Disallow:" is the
    standard allow-all whitelist idiom, and the group's existence must
    shadow ``*`` in :func:`robots_allowed` even though it matches
    nothing. Agents normalize to lowercase; paths are case-sensitive
    (RFC 9309 §2.2.2).
    """
    grouped = _grouped_lines(df, domain_col, text_col, _DIRECTIVE_RE)

    # opt-r16 (guide §2.4): the old agents⋈rules inner join + anti join
    # consumed the window chain three times — filters pushed below the
    # window made the exchanges non-identical, so nothing was reused and
    # the whole scan→regexp→window pipeline ran once per consumer. One
    # groupBy(domain, group_id) collects each group's agent set and rule
    # list in a single pass; it reuses the window's hashpartitioning
    # (domain ⊆ the grouping key), so the operator runs exactly ONE
    # exchange, and the agent×rule fan-out becomes two explodes.
    per_group = grouped.groupBy("domain", "group_id").agg(
        F.collect_set(
            F.when(F.col("directive") == "user-agent", F.lower("value"))
        ).alias("_agents"),
        F.collect_list(
            F.when(
                F.col("directive").isin("allow", "disallow")
                & (F.col("value") != ""),
                F.struct(
                    (F.col("directive") == "allow").alias("is_allow"),
                    F.col("value").alias("path"),
                ),
            )
        ).alias("_rules"),
    )
    # rule-less groups survive as one null-path marker row (see
    # docstring): same explode, the marker substitutes for the empty list
    marker = F.array(
        F.struct(
            F.lit(True).alias("is_allow"), F.lit(None).cast("string").alias("path")
        )
    )
    return (
        per_group.select(
            "domain",
            F.explode("_agents").alias("agent"),
            F.when(F.size("_rules") == 0, marker).otherwise(F.col("_rules")).alias(
                "_rs"
            ),
        )
        .select("domain", "agent", F.explode("_rs").alias("_r"))
        .select(
            "domain",
            "agent",
            F.col("_r.is_allow").alias("is_allow"),
            F.col("_r.path").alias("path"),
            F.length("_r.path").alias("pattern_len"),
            _like_pattern(F.col("_r.path")).alias("like_pattern"),
        )
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Append an ``allowed`` boolean to ``urls`` (which must carry a
    ``domain`` column keyed like the rules table): RFC 9309 precedence —
    the agent's own group if one exists for the domain, else the ``*``
    group; within the group the LONGEST matching rule decides, ties
    break toward allow; no matching rule, no group, or no robots.txt at
    all means allowed.

    The match target is path + ``?`` + query, per the RFC. One
    domain-keyed join of urls × matching rules, then one ``max_by``
    aggregate picking the decisive rule (struct ordering puts the
    longest pattern first and breaks ties toward allow, since
    true > false); rule fan-out per URL is the domain's rule count
    (tens)."""
    me = agent.lower()
    # per domain: does a group for this agent exist? (RFC: the crawler's
    # own group shadows '*' entirely, it does not merge — and a
    # RULE-LESS group still shadows, which is why the null-path marker
    # rows from parse_robots participate here before being excluded
    # from matching below). opt-r16 (guide §2.4): derived with a window
    # over the already-filtered rules instead of a distinct + left join
    # — the join recomputed the whole parse_robots chain a second time
    # (its exchange differs from the main branch's once filters push
    # below the window, so nothing is reused).
    scoped = (
        rules.filter(F.col("agent").isin(me, "*"))
        .withColumn(
            "_has_mine",
            F.max(F.col("agent") == me).over(Window.partitionBy("domain")),
        )
        .filter(
            F.when(F.coalesce(F.col("_has_mine"), F.lit(False)), F.col("agent") == me)
            .otherwise(F.col("agent") == "*")
        )
        .filter(F.col("like_pattern").isNotNull())  # markers match nothing
        .select("domain", "is_allow", "pattern_len", "like_pattern")
    )

    def match_target(u: Column) -> Column:
        # path + optional ?query, fragment stripped — tolerant regexps
        # (parse_url THROWS on raw '%' in paths, which crawled URLs
        # have). Inputs without an authority part (path-only
        # '/private/x', host-relative 'a.com/x') are treated as paths
        # from their first '/', not collapsed to root.
        with_auth = F.regexp_extract(
            u, r"^(?:[a-zA-Z][\w+.-]*:)?//[^/?#]*([^#]*)", 1
        )
        no_auth = F.regexp_extract(u, r"^[^/?#]*([^#]*)", 1)
        t = F.when(u.rlike(r"^(?:[a-zA-Z][\w+.-]*:)?//"), with_auth).otherwise(
            no_auth
        )
        return F.when(t == "", F.lit("/")).otherwise(t)

    # decisions key on (domain, url) — deterministic under recompute
    # (a monotonically_increasing_id here would be the classic
    # nondeterministic-self-join trap) and naturally deduplicating:
    # repeated url rows share one decision
    decisions = (
        urls.select("domain", F.col(url_col).alias("_u"))
        .distinct()
        .withColumn("_target", match_target(F.col("_u")))
        .join(scoped, on="domain")
        .filter(F.expr("_target LIKE like_pattern"))
        .groupBy("domain", "_u")
        .agg(
            F.max_by(
                "is_allow", F.struct(F.col("pattern_len"), F.col("is_allow"))
            ).alias("_dec")
        )
    )
    return (
        urls.join(
            decisions.withColumnRenamed("_u", url_col),
            on=["domain", url_col],
            how="left",
        )
        .withColumn("allowed", F.coalesce(F.col("_dec"), F.lit(True)))
        .drop("_dec")
    )


def crawl_delays(
    df: DataFrame,
    agent: str = "*",
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Effective ``Crawl-delay`` seconds per domain for ``agent`` — one
    row per domain that declares one. Extra-RFC but universally honored
    (politeness budgeting is how a crawl fleet avoids getting itself
    blocked); group scoping follows the same convention as rules: the
    agent's own group shadows ``*``, and within the winning scope the
    LARGEST declared delay is taken (the conservative read of duplicate
    directives). Non-numeric values are ignored. Pure relational — the
    same lag/running-sum group reconstruction as :func:`parse_robots`,
    then two stacked aggregates."""
    me = agent.lower()
    # group detection must see EVERY directive line: filtering to just
    # user-agent/crawl-delay before the lag heuristic made UA blocks
    # separated only by Allow/Disallow lines lag-adjacent, merging
    # distinct groups and leaking delays across agents (review r8)
    grouped = _grouped_lines(
        df,
        domain_col,
        text_col,
        r"(?i)^[ \t]*(user-agent|allow|disallow|crawl-delay)[ \t]*:[ \t]*([^#]*)",
    )
    # opt-r16 (guide §2.4): the old delays⋈agents join + has_mine left
    # join recomputed the scan→regexp→window chain once per consumer
    # (three times) and ran two SortMergeJoins. Collapse each group to
    # (agent set, max numeric delay) in one pass, then resolve the
    # shadowing per domain in a second aggregate — both reuse the
    # window's hashpartitioning(domain), so the whole operator runs ONE
    # exchange. Shadowing still follows GROUP MEMBERSHIP: a group that
    # names the agent shadows '*' entirely, even when it declares no
    # delay (the domain must then be absent; review r8).
    per_group = grouped.groupBy("domain", "group_id").agg(
        F.collect_set(
            F.when(F.col("directive") == "user-agent", F.lower("value"))
        ).alias("_agents"),
        F.max(
            F.when(
                (F.col("directive") == "crawl-delay")
                & F.col("value").rlike(r"^\d+(\.\d+)?$"),
                F.col("value").cast("double"),
            )
        ).alias("_delay"),
    )
    per_domain = per_group.groupBy("domain").agg(
        F.max(F.array_contains("_agents", me)).alias("_has_mine"),
        F.max(F.when(F.array_contains("_agents", me), F.col("_delay"))).alias(
            "_mine"
        ),
        F.max(F.when(F.array_contains("_agents", "*"), F.col("_delay"))).alias(
            "_star"
        ),
    )
    return per_domain.select(
        "domain",
        F.when(F.col("_has_mine"), F.col("_mine"))
        .otherwise(F.col("_star"))
        .alias("crawl_delay_s"),
    ).filter(F.col("crawl_delay_s").isNotNull())


def extract_sitemaps(
    df: DataFrame, domain_col: str = "domain", text_col: str = "robots_txt"
) -> DataFrame:
    """``Sitemap:`` URLs from harvested robots.txt bodies — one row per
    ``(domain, sitemap_url)``. Per RFC 9309 the directive is
    group-independent, so this is a plain line scan (explode + regexp),
    no group reconstruction."""
    return (
        df.select(
            F.col(domain_col).alias("domain"),
            F.explode(F.split(F.col(text_col), "\r?\n")).alias("line"),
        )
        .select(
            "domain",
            F.trim(
                F.regexp_extract("line", r"(?i)^[ \t]*sitemap[ \t]*:[ \t]*([^#]+)", 1)
            ).alias("sitemap_url"),
        )
        .filter(F.col("sitemap_url") != "")
    )


def parse_sitemap_urls(
    df: DataFrame, xml_col: str = "sitemap_xml", keep_cols: tuple[str, ...] = ("domain",)
) -> DataFrame:
    """URL entries from sitemap / sitemap-index XML bodies: one row per
    ``<loc>`` with its optional ``<lastmod>`` sibling — the crawl
    frontier seed list. Regexp extraction, not an XML parser, by the
    same reasoning as ``html_to_text`` (sitemaps are machine-generated
    and regular; a DOM would put Python in the per-byte path): one
    codegen projection, entities in locs decoded via the common subset.

    ``is_index`` marks ``<sitemap>`` entries (sitemap-index files) whose
    locs are MORE sitemaps to fetch, vs ``<url>`` page entries."""
    from ..functions.text import _HTML_ENTITIES

    entry = F.regexp_extract_all(
        F.col(xml_col),
        F.lit(r"(?is)<(sitemap|url)\b[^>]*>(.*?)</\1\s*>"),
        2,
    )
    kind = F.regexp_extract_all(
        F.col(xml_col),
        F.lit(r"(?is)<(sitemap|url)\b[^>]*>.*?</\1\s*>"),
        1,
    )
    out = df.select(
        *keep_cols,
        F.explode(F.arrays_zip(kind.alias("k"), entry.alias("e"))).alias("_z"),
    ).select(
        *keep_cols,
        (F.lower(F.col("_z.k")) == "sitemap").alias("is_index"),
        F.trim(
            F.regexp_extract(F.col("_z.e"), r"(?is)<loc[^>]*>(.*?)</loc\s*>", 1)
        ).alias("loc"),
        F.nullif(
            F.trim(
                F.regexp_extract(
                    F.col("_z.e"), r"(?is)<lastmod[^>]*>(.*?)</lastmod\s*>", 1
                )
            ),
            F.lit(""),
        ).alias("lastmod"),
    ).filter(F.col("loc") != "")
    loc = F.col("loc")
    for ent, repl in _HTML_ENTITIES:
        loc = F.replace(loc, F.lit(ent), F.lit(repl))
    return out.withColumn("loc", loc)
