"""URL normalization and domain extraction — the crawl-pipeline stage
between ingestion and dedup/mixing (domain-level quality lists, per-domain
mix rates, URL-keyed exact dedup all key on these).

Reference provenance: no analogue in idavkaev/kafka-streams-task (its keys
are geohashes); this extends the engine's text-analysis family (SURVEY.md
north-star extensions) the way a crawl corpus needs.

All functions are single codegen expressions (regexp / string ops on the
JVM, no Python, no shuffle) — at 100 TB these run inside the ingest scan's
Project. The registered-domain heuristic is deliberately list-light: a
small built-in set of two-part public suffixes covers the common cases
(co.uk, com.au, ...) without shipping the full Public Suffix List; swap in
the PSL as a broadcast join if exactness matters (documented trade)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: common two-part public suffixes (a pragmatic subset of the PSL: the
#: full list is ~9k entries and would be a broadcast-joined table, not an
#: expression — see module docstring)
TWO_PART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "co.kr", "or.kr", "ac.kr", "go.kr",
    "com.mx", "org.mx", "gob.mx",
    "co.za", "org.za", "gov.za", "ac.za",
    "com.tr", "org.tr", "gov.tr", "edu.tr",
    "com.sg", "edu.sg", "gov.sg",
    "co.nz", "org.nz", "govt.nz", "ac.nz",
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _with_scheme(c: Column) -> Column:
    """Scheme-qualify scheme-relative (``//host/x``) and bare
    (``host/x``) URL forms so the parser sees an authority; already-
    schemed URLs pass through."""
    return F.when(
        c.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), c
    ).otherwise(F.concat(F.lit("http://"), F.regexp_replace(c, r"^//", "")))


def extract_host(url: Column | str) -> Column:
    """Lowercased host of a URL: strips scheme, credentials, port, path,
    query, and fragment; NULL for strings with no recognizable host.
    ``try_parse_url`` is Spark's builtin URL parser (null on malformed,
    codegen)."""
    c = F.trim(_col(url))
    host = F.lower(F.try_parse_url(c, F.lit("HOST")))
    fallback = F.lower(F.try_parse_url(_with_scheme(c), F.lit("HOST")))
    # canonical hosts carry no trailing dot: 'example.com.' (absolute-form
    # FQDN, legal in crawls) must key with 'example.com', and a trailing
    # empty label would collapse registered_domain to the bare TLD
    return F.regexp_replace(F.coalesce(host, fallback), r"\.$", "")


def registered_domain_of_host(host: Column | str) -> Column:
    """:func:`registered_domain` over an ALREADY-EXTRACTED lowercase
    host column. Use this form when the host is materialized as its own
    column: referencing it here keeps the parse chain computed once per
    row (Catalyst's CollapseProject declines to inline a multiply-
    referenced non-cheap alias), where inlining :func:`extract_host`
    at every reference blows the generated method past janino's limit
    and knocks the whole stage out of codegen."""
    host = _col(host)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    # isin compiles to ONE InSet node (hash-set probe) — a 45-way OR
    # chain would re-inline `last2`'s expression per comparison
    two_part = last2.isin(*TWO_PART_SUFFIXES)
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(is_ip, host)
        .when(n <= 2, host)
        .when(two_part & (n >= 3), last3)
        .otherwise(last2)
    )


def registered_domain(url: Column | str) -> Column:
    """The registrable domain (eTLD+1 heuristic): last two host labels,
    or last THREE when the two-label tail is a known two-part public
    suffix (:data:`TWO_PART_SUFFIXES`). ``example.co.uk`` and
    ``a.b.example.co.uk`` both map to ``example.co.uk``; IPv4 hosts pass
    through unchanged. For PSL-exact semantics (wildcards, exceptions,
    private-section entries like github.io) use
    :func:`registered_domain_psl`."""
    return registered_domain_of_host(extract_host(url))


#: default strip-list: UNAMBIGUOUS tracking parameters only. ``ref`` is
#: deliberately absent — unlike utm_*/fbclid/gclid it is used functionally
#: on major sites (GitHub's ``?ref=<branch>`` selects content), so
#: stripping it would collapse genuinely distinct pages to one dedup key.
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid)="


def normalize_url(url: Column | str, strip_params_re: str = TRACKING_PARAM_RE) -> Column:
    """Canonical URL for exact URL-level dedup: lowercase scheme+host,
    default ports dropped, fragment dropped, tracking query parameters
    removed (``strip_params_re`` — default :data:`TRACKING_PARAM_RE`,
    the unambiguous utm_*/fbclid/gclid set; pass a wider pattern per
    corpus if its URLs carry more), trailing slash normalized on empty
    paths. Deterministic pure expression — two URLs that differ only in
    these details dedup to one key."""
    c = F.trim(_col(url))
    scheme = F.lower(F.coalesce(F.try_parse_url(c, F.lit("PROTOCOL")), F.lit("http")))
    host = extract_host(c)
    # parse_url HOST excludes the port; recover it separately
    qualified = _with_scheme(c)
    authority = F.try_parse_url(qualified, F.lit("AUTHORITY"))
    port = F.regexp_extract(F.coalesce(authority, F.lit("")), r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    port_part = F.when(default_port, F.lit("")).otherwise(F.concat(F.lit(":"), port))
    path = F.coalesce(F.try_parse_url(qualified, F.lit("PATH")), F.lit(""))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.coalesce(F.try_parse_url(qualified, F.lit("QUERY")), F.lit(""))
    # strip tracking params: split on '&', drop matches, re-join (codegen
    # array ops — no Python)
    params = F.filter(
        F.split(query, "&"),
        lambda p: ~p.rlike(strip_params_re) & (p != ""),
    )
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.when(host.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(scheme, F.lit("://"), host, port_part, path, qpart)
    )
