"""Driver-gate suites for the LLM-pipeline operator library (round 6).

Round 5 gated ~24 components behind ONE 26-leg union slot
(``llm_library_suite``) whose driver hash went red while the exact-value
local compare stayed green — an environment/canonicalization skew, not a
value bug (VERDICT r5). This module is the r6 de-risking rebuild:

* the monolith is split into FIVE thematic suites of <= 8 legs each, so
  one environment-sensitive leg can no longer red out two dozen
  components;
* every UNION ALL branch gives EVERY output column an explicit terminal
  cast (``CAST(... AS BIGINT)`` / ``CAST(... AS VARCHAR)``) in BOTH the
  DuckDB oracle and the Spark plan — no branch's type is left to either
  engine's union inference (the r5 failure class: one inferred DOUBLE or
  HUGEINT branch silently retypes the whole union column, and a
  canonical-string hash then sees ``5.0`` vs ``5``);
* every float-to-int conversion in an oracle VALUE path uses
  ``floor(x + 0.5)`` arithmetic instead of the ``round()`` builtin
  (DuckDB's ``round``-on-DOUBLE half-rounding has drifted across
  releases; ``floor`` semantics never have), with the Spark leg using
  the bit-identical expression;
* the ``levenshtein`` builtin is purged from the editdist oracle —
  replaced by a from-scratch Myers/Hyyro bit-parallel edit-distance DP
  (integer-only recursive CTE, no version-sensitive builtin anywhere in
  the value path);
* every union suite carries a CANARY leg: constant rows stated
  identically by both engines, exercising every output type (negative,
  zero, NULL, > 2^53 BIGINTs, empty/unicode VARCHARs). If a canary leg
  ever mismatches at the driver, the round's red is proven to be
  environment skew in minutes.

Also registered here (r6): the folded family suites (text id/fingerprint,
exact-dedup family, multimodal, the kNN family including the r5
pytest-only persisted-index path) and two promoted driver slots
(cross-corpus linkage R x S, column profiling) per VERDICT r5 items 2/6.

Reference provenance: the reference repo (idavkaev/kafka-streams-task)
has no analogue for any of these operators — they are the engine's
100 TB training-data-pipeline extension surface (SURVEY.md north-star
extensions).
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import WHITESPACE_RE, tokens
from ..schemas import load_table, local_table
from .llm import (
    _LEAK_8GRAM,
    _REPETITION_STATS,
    _knn_recall_gate,
    _zorder_oracle_expr,
    dedup_exact,
    decontaminate,
    knn_bruteforce,
    knn_lsh,
    multimodal_asset_meta,
    multimodal_image_features,
    ngram_jaccard_pairs,
    text_fingerprints,
    text_lang_id,
)
from .registry import query

# Cross-engine rounding + canary legs: shared with catalog/llm.py (which
# registers earlier and cannot import from this module) — definitions moved
# to _suite_utils in r12; re-exported here for every existing importer.
from ._suite_utils import (  # noqa: F401
    _CANARY_LONGS,
    _CANARY_STRS,
    _canary_rows,
    canary_df,
    canary_sql,
    fmicro_col,
    py_floor6,
    sql_floor6,
    sql_fmicro,
    typed_canary_sql,
)

#: the (leg, key, s1, i1, i2) shape shared by the five thematic suites
_SUITE_COLS = [("key", "long"), ("s1", "string"), ("i1", "long"), ("i2", "long")]

# ---------------------------------------------------------------------------
# Suite: graph + layout (pagerank, triangles, z-order) over events
# ---------------------------------------------------------------------------


def _pagerank_oracle_ctes(n_iter: int = 3) -> str:
    """Chained-CTE unroll of the 'pagerank' leg: the deterministic
    user(e) -> user(2e) event graph, degree table with sinks, uniform
    start, then ``n_iter`` damped iterations at d = 0.75 — each round a
    dangling-mass scalar, an in-mass aggregate, and the rank update with
    the IDENTICAL float operation order the Spark operator uses
    ((0.25/n + (0.75*m)/n) + 0.75*coalesce(im, 0); 0.25 and 0.75 are
    exact binary fractions, so decimal-literal parsing cannot diverge)."""
    parts = [
        """
    pre AS (SELECT a.user_id AS src, b.user_id AS dst
            FROM events a JOIN events b ON b.event_id = a.event_id * 2),
    prd AS (SELECT n.node, coalesce(d.deg, 0) AS deg FROM
            (SELECT DISTINCT node FROM
              (SELECT src AS node FROM pre UNION ALL SELECT dst FROM pre)) n
            LEFT JOIN (SELECT src AS node, count(*) AS deg FROM pre GROUP BY src) d
            ON n.node = d.node),
    prnn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM prd),
    pr0 AS (SELECT node, deg, 1.0 / n AS rank FROM prd, prnn)"""
    ]
    for i in range(1, n_iter + 1):
        p = i - 1
        parts.append(f"""
    prm{i} AS (SELECT coalesce(sum(rank), 0.0) AS m FROM pr{p} WHERE deg = 0),
    prc{i} AS (SELECT e.dst AS node, sum(r.rank / r.deg) AS im
               FROM pr{p} r JOIN pre e ON e.src = r.node
               WHERE r.deg > 0 GROUP BY e.dst),
    pr{i} AS (SELECT g.node, g.deg,
                     (0.25 / nn.n + 0.75 * dd.m / nn.n)
                     + 0.75 * coalesce(c.im, 0.0) AS rank
              FROM prd g LEFT JOIN prc{i} c ON g.node = c.node, prnn nn, prm{i} dd)""")
    return ",".join(parts)


def _event_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic link graph over events: user of event e
    links to the user of event 2e (parallel edges allowed; sinks — users
    never on the src side — exercise the dangling-mass term)."""
    ev = load_table(spark, sf_dir, "events")
    ea = ev.select(F.col("event_id").alias("eid"), F.col("user_id").alias("src"))
    eb = ev.select(F.col("event_id").alias("eid2"), F.col("user_id").alias("dst"))
    return ea.join(eb, F.col("eid2") == F.col("eid") * 2).select("src", "dst")


@query(
    "llm_graph_layout_suite",
    oracle=f"""
    WITH {_pagerank_oracle_ctes(3)},
    tce AS (
      SELECT DISTINCT least(a.user_id, b.user_id) AS u,
                      greatest(a.user_id, b.user_id) AS v
      FROM events a JOIN events b ON b.event_id = a.event_id * 2
      WHERE a.user_id <> b.user_id
    )
    SELECT CAST('pagerank' AS VARCHAR) AS leg, CAST(node AS BIGINT) AS key,
           CAST(NULL AS VARCHAR) AS s1,
           {sql_fmicro("rank", "1000000000.0")} AS i1,
           CAST(NULL AS BIGINT) AS i2
    FROM pr3
    UNION ALL
    SELECT CAST('triangles' AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(t.cnt AS BIGINT), CAST(NULL AS BIGINT)
    FROM (
      SELECT CAST(count(*) AS BIGINT) AS cnt
      FROM tce e1 JOIN tce e2 ON e2.u = e1.u AND e2.v > e1.v
           JOIN tce e3 ON e3.u = e1.v AND e3.v = e2.v
    ) t
    UNION ALL
    SELECT CAST('zorder' AS VARCHAR), CAST(event_id AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(({_zorder_oracle_expr(8)}) AS BIGINT), CAST(NULL AS BIGINT)
    FROM events
    UNION ALL
    SELECT CAST('xsplit' AS VARCHAR), CAST(doc_id AS BIGINT),
           CAST(split AS VARCHAR), CAST(n AS BIGINT), CAST(NULL AS BIGINT)
    FROM (
      WITH xsd AS (
        SELECT doc_id,
               CASE WHEN doc_id % 4 = 0 THEN 'test' ELSE 'train' END AS split,
               CASE WHEN doc_id % 10 = 0
                    THEN trim(text) || ' xq1 xq2 xq3 xq4 xq5 xq6 xq7 xq8'
                    ELSE trim(text) END AS txt
        FROM documents),
      xst AS (SELECT doc_id, split,
                     string_split_regex(trim(txt), '[ \\t\\n\\r\\f]+') AS toks
              FROM xsd),
      xsg AS (
        SELECT DISTINCT doc_id, split,
               CASE WHEN len(toks) >= 8 THEN array_to_string(toks[i+1:i+8], ' ')
                    ELSE array_to_string(toks, ' ') END AS gram
        FROM xst,
             unnest(CASE WHEN len(toks) >= 8 THEN range(0, len(toks) - 8 + 1)
                         ELSE [0] END) AS u(i)),
      xtr AS (SELECT DISTINCT gram FROM xsg WHERE split = 'train')
      SELECT split, doc_id, count(*) AS n
      FROM xsg JOIN xtr USING (gram)
      WHERE split <> 'train'
      GROUP BY split, doc_id
    )
    UNION ALL
    SELECT CAST('robots' AS VARCHAR), CAST(doc_id AS BIGINT),
           CAST(CASE
             WHEN doc_id % 12 <= 2 THEN 'd0.com'
             WHEN doc_id % 12 <= 4 THEN 'd1.com'
             WHEN doc_id % 12 = 5 THEN 'd2.com'
             WHEN doc_id % 12 <= 8 THEN 'd3.com'
             WHEN doc_id % 12 <= 10 THEN 'd4.com'
             ELSE 'd9.com' END AS VARCHAR),
           CAST(CASE WHEN doc_id % 12 IN (1, 3, 7, 9) THEN 0 ELSE 1 END AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM documents
    UNION ALL
    SELECT CAST('nfc' AS VARCHAR), CAST(doc_id AS BIGINT),
           CAST(nfc_normalize(
             'u' || CAST(doc_id % 7 AS VARCHAR) || 'e' || chr(769) || '-end'
           ) AS VARCHAR),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM documents
    UNION ALL
    SELECT CAST('delay' AS VARCHAR), CAST(NULL AS BIGINT),
           CAST(dom AS VARCHAR), CAST(micros AS BIGINT), CAST(NULL AS BIGINT)
    FROM (VALUES ('e0.com', 2000000), ('e1.com', 500000), ('e3.com', 3000000))
         AS dl(dom, micros)
    UNION ALL
    SELECT CAST('charset' AS VARCHAR), CAST(NULL AS BIGINT),
           CAST(cs AS VARCHAR), CAST(count(*) AS BIGINT),
           CAST(count(*) * plen AS BIGINT)
    FROM (
      SELECT CASE doc_id % 5
               WHEN 0 THEN 'utf-8-sig' WHEN 1 THEN 'windows-1252'
               WHEN 2 THEN 'gbk' WHEN 3 THEN 'utf-8'
               ELSE 'unknown(non-utf-8)' END AS cs,
             CASE doc_id % 5
               WHEN 0 THEN 13 WHEN 1 THEN 12 WHEN 2 THEN 41
               WHEN 3 THEN 12 ELSE 6 END AS plen
      FROM documents
    ) GROUP BY cs, plen
    UNION ALL
    {canary_sql(_SUITE_COLS)}
    """,
)
def llm_graph_layout_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph + physical-layout legs (<= 4 components per driver row, the
    r6 de-concentration of llm_library_suite):

    'pagerank' — 3 damped power iterations (d = 0.75, so 1-d is an exact
    binary fraction) over the deterministic user(e) -> user(2e) link
    graph, including the dangling-mass redistribution term; the oracle
    unrolls the identical three iterations as chained CTEs with the
    identical float operation order, ranks compared in integer
    nano-units (floor-based, no round() builtin).

    'triangles' — the degree-ordered node-iterator triangle count over
    the same event graph, vs the oracle's canonical u<v<w triple join.

    'zorder' — layout.zorder_key value check over events(user_id,
    value): the oracle reproduces the width_bucket quantization
    (mirroring Spark's float operation order exactly, so IEEE doubles
    agree) and the Morton bit interleave; the write path + footer-stats
    skipping stay pinned by test_layout.py.

    'xsplit' (r7) — cross_split_contamination through the REAL operator
    over an arithmetically planted split (doc_id % 4 → test) and leak
    (an 8-token marker appended to doc_id % 10 docs): per eval doc, the
    count of distinct 8-gram shingles shared with ANY train doc. The
    oracle recomputes grams as STRINGS (distinct counts are identical
    to the engine's distinct xxhash64 counts — same grams, no
    collisions at this scale), including the short-doc whole-text
    shingle rule.

    'robots' (r8, VERDICT r7 item 3) — RFC 9309 robots.txt compliance
    through the REAL parse_robots -> robots_allowed chain (windows +
    LIKE-over-column + max_by): five planted robots bodies cover
    longest-match-wins (both directions), exact-length tie -> allow,
    agent-group shadowing of '*', the rule-less whitelist group (which
    must STILL shadow), '*' wildcard + '$' end-anchor patterns, and the
    no-robots.txt default-allow; each doc_id draws one of 12
    (domain, URL) scenarios arithmetically and the oracle states the
    decision table as a closed-form CASE — no LIKE evaluation runs
    oracle-side.

    'nfc' (r8, VERDICT r7 item 4) — unicode_normalize (the Arrow NFC
    stage) over planted NFD strings ('e' + U+0301 combining acute built
    arithmetically per doc); the oracle states DuckDB's own
    ``nfc_normalize`` over the identically-constructed string, so two
    independent Unicode implementations must agree on the composed
    bytes.

    'delay' (r8) — crawl_delays through the REAL group-reconstruction
    chain over six planted robots bodies: '*'-group fallback, own-group
    override, own-group-without-delay SHADOWING '*' (no inheritance —
    the domain must be ABSENT), max-of-duplicates, non-numeric ignored,
    foreign-agent groups invisible; the oracle states the surviving
    decision table (three rows, micros-exact halves) as constants.

    'charset' (r8) — warc_charset_report over planted binary payloads,
    one scenario per sniff-precedence branch (BOM / header param / meta
    tag / undeclared-valid / undeclared-invalid); the oracle states the
    (charset, count, byte-mass) table arithmetically.

    'canary' — constant rows stated identically by both engines (see
    module docstring).
    """
    from ..operators.dedup import cross_split_contamination
    from ..operators.graph import pagerank, triangle_count
    from ..operators.layout import zorder_key
    from ..operators.robots import crawl_delays, parse_robots, robots_allowed
    from ..operators.unicode_norm import unicode_normalize

    edges = _event_graph_edges(spark, sf_dir)
    pagerank_leg = pagerank(edges, n_iter=3, damping=0.75).select(
        F.lit("pagerank").alias("leg"),
        F.col("node").cast("long").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        fmicro_col(F.col("rank"), 1e9).alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )
    triangle_leg = triangle_count(edges).select(
        F.lit("triangles").alias("leg"),
        F.lit(None).cast("long").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.col("n_triangles").cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )
    ev = load_table(spark, sf_dir, "events")
    zorder_leg = ev.select(
        F.lit("zorder").alias("leg"),
        F.col("event_id").cast("long").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        zorder_key(ev, ["user_id", "value"], bits=8).cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat_ws(
                " ", F.trim("text"), F.lit("xq1 xq2 xq3 xq4 xq5 xq6 xq7 xq8")
            ),
        )
        .otherwise(F.trim("text"))
        .alias("text"),
    )
    xsplit_leg = cross_split_contamination(planted, shingle_n=8).select(
        F.lit("xsplit").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.col("split").cast("string").alias("s1"),
        F.col("n_contaminated_shingles").cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    # 'robots': five planted bodies; scenarios m = doc_id % 12 (oracle
    # states the decision table; deny set {1,3,7,9}):
    #   d0 m0 '/public/a' allow (no rule) | m1 '/private/a' deny
    #     | m2 '/private/ok/a' allow (longer Allow beats Disallow)
    #   d1 (trainbot group shadows '*''s Disallow /): m3 '/blocked/x'
    #     deny | m4 '/open/x' allow
    #   d2 m5 '/anything' allow (RULE-LESS trainbot group still shadows)
    #   d3 m6 '/page1' allow (5-octet tie -> allow) | m7 '/q/deep/f'
    #     deny (longest Disallow) | m8 '/q/shallow' allow
    #   d4 m9 '/docs/file.pdf' deny ('/*.pdf$') | m10 '...pdfx' allow
    #     ($ anchor)
    #   d9 m11 '/whatever' allow (no robots.txt at all)
    robots_bodies = local_table(spark,
        [
            ("d0.com", "User-agent: *\nDisallow: /private/\nAllow: /private/ok/"),
            ("d1.com", "User-agent: trainbot\nDisallow: /blocked\n\n"
                       "User-agent: *\nDisallow: /"),
            ("d2.com", "User-agent: trainbot\nDisallow:\n\n"
                       "User-agent: *\nDisallow: /"),
            ("d3.com", "User-agent: *\nAllow: /pag*\nDisallow: /page\n"
                       "Allow: /q/\nDisallow: /q/deep"),
            ("d4.com", "User-agent: *\nDisallow: /*.pdf$"),
        ],
        "domain string, robots_txt string",
    )
    _rdoms = [
        "d0.com", "d0.com", "d0.com", "d1.com", "d1.com", "d2.com",
        "d3.com", "d3.com", "d3.com", "d4.com", "d4.com", "d9.com",
    ]
    _rpaths = [
        "/public/a", "/private/a", "/private/ok/a", "/blocked/x",
        "/open/x", "/anything", "/page1", "/q/deep/f", "/q/shallow",
        "/docs/file.pdf", "/docs/file.pdfx", "/whatever",
    ]
    m1 = (F.col("doc_id") % 12 + 1).cast("int")
    planted_urls = d.select(
        "doc_id",
        F.element_at(F.array(*[F.lit(x) for x in _rdoms]), m1).alias("domain"),
        F.concat(
            F.lit("https://"),
            F.element_at(F.array(*[F.lit(x) for x in _rdoms]), m1),
            F.element_at(F.array(*[F.lit(x) for x in _rpaths]), m1),
        ).alias("url"),
    )
    robots_leg = robots_allowed(
        planted_urls, parse_robots(robots_bodies), agent="trainbot"
    ).select(
        F.lit("robots").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.col("domain").cast("string").alias("s1"),
        F.col("allowed").cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    # 'nfc': NFD plant ('e' + combining acute U+0301) through the real
    # Arrow normalization stage; the oracle recomputes with DuckDB's
    # own nfc_normalize
    nfc_leg = d.select(
        F.lit("nfc").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        unicode_normalize(
            F.concat(
                F.lit("u"),
                (F.col("doc_id") % 7).cast("string"),
                # explicit NFD: 'e' + U+0301 combining acute (escaped so
                # the source encoding can never decide the
                # plant's normalization form)
                F.lit("e\u0301-end"),
            ),
            form="NFC",
        ).cast("string").alias("s1"),
        F.lit(None).cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )
    # 'delay': six planted bodies; only e0/e1/e3 survive for trainbot
    # (e2 shadowed by a delay-less own group, e4 non-numeric, e5 a
    # foreign agent's group) — delays are exact halves so the micro
    # conversion has zero tie risk
    delay_bodies = local_table(spark,
        [
            ("e0.com", "User-agent: *\nCrawl-delay: 2"),
            ("e1.com", "User-agent: trainbot\nCrawl-delay: 0.5\n\n"
                       "User-agent: *\nCrawl-delay: 60"),
            ("e2.com", "User-agent: trainbot\nDisallow: /a\n\n"
                       "User-agent: *\nCrawl-delay: 60"),
            ("e3.com", "User-agent: *\nCrawl-delay: 1\nCrawl-delay: 3"),
            ("e4.com", "User-agent: *\nCrawl-delay: soon"),
            ("e5.com", "User-agent: *\nDisallow: /x\n\n"
                       "User-agent: fastbot\nCrawl-delay: 9"),
        ],
        "domain string, robots_txt string",
    )
    delay_leg = crawl_delays(delay_bodies, agent="trainbot").select(
        F.lit("delay").alias("leg"),
        F.lit(None).cast("long").alias("key"),
        F.col("domain").cast("string").alias("s1"),
        fmicro_col(F.col("crawl_delay_s")).alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    # 'charset' (r8): warc_charset_report's codegen sniff over planted
    # BINARY payloads — one scenario per precedence branch (BOM, HTTP
    # header param, <meta> tag, undeclared-valid-utf8 via
    # is_valid_utf8, undeclared-invalid). The oracle states the
    # decision table arithmetically (counts per doc_id % 5 bucket ×
    # known payload byte lengths); no sniffing runs oracle-side.
    from ..sources.warc import warc_charset_report

    _cs_payloads = [
        b"\xef\xbb\xbf<p>bom</p>",                          # 13 B
        b"<p>decor</p>",                                    # 12 B
        b"<html><meta charset='GBK'><p>x</p></html>",       # 41 B
        b"<p>plain</p>",                                    # 12 B
        b"\xff\x00junk",                                    #  6 B
    ]
    _m5c = (F.col("doc_id") % 5 + 1).cast("int")
    cs_records = d.select(
        F.lit("response").alias("warc_type"),
        F.element_at(
            F.array(*[F.lit(p) for p in _cs_payloads]), _m5c
        ).alias("payload"),
        F.element_at(
            F.array(
                F.lit("text/html"),
                F.lit("text/html; charset=Windows-1252"),
                F.lit("text/html"),
                F.lit("text/html"),
                F.lit("text/html"),
            ),
            _m5c,
        ).alias("http_content_type"),
    )
    charset_leg = warc_charset_report(cs_records).select(
        F.lit("charset").alias("leg"),
        F.lit(None).cast("long").alias("key"),
        F.col("charset").cast("string").alias("s1"),
        F.col("n_records").cast("long").alias("i1"),
        F.col("payload_bytes").cast("long").alias("i2"),
    )

    return (
        pagerank_leg.unionByName(triangle_leg)
        .unionByName(zorder_leg)
        .unionByName(xsplit_leg)
        .unionByName(robots_leg)
        .unionByName(nfc_leg)
        .unionByName(delay_leg)
        .unionByName(charset_leg)
        .unionByName(canary_df(spark, _SUITE_COLS))
    )


# ---------------------------------------------------------------------------
# Suite: CDC + analytics (merge, scd2, expectations, cohort, funnel)
# ---------------------------------------------------------------------------


def _merge_delta(mev: DataFrame):
    """The shared synthesized CDC delta over events: two versioned
    upserts on %7 keys, a higher-versioned delete on %10 keys, pure
    inserts on fresh %13 keys."""
    from ..operators.merge import OP_DELETE, OP_UPSERT

    def up(df, add, ver):
        return df.select(
            "event_id", "user_id",
            (F.col("value") + F.lit(float(add))).alias("value"),
            F.lit(OP_UPSERT).alias("op"), F.lit(ver).alias("version"),
        )

    sevens = mev.filter(F.col("event_id") % 7 == 0)
    return (
        up(sevens, 1000, 1)
        .unionByName(up(sevens, 2000, 2))  # version 2 must win over 1
        .unionByName(
            mev.filter(F.col("event_id") % 10 == 0).select(
                "event_id", "user_id", "value",
                F.lit(OP_DELETE).alias("op"), F.lit(9).alias("version"),
            )  # version 9: delete beats both upserts on %70 ids
        )
        .unionByName(
            mev.filter(F.col("event_id") % 13 == 0).select(
                (F.col("event_id") + 10000000).alias("event_id"), "user_id",
                (F.col("value") + F.lit(5000.0)).alias("value"),
                F.lit(OP_UPSERT).alias("op"), F.lit(1).alias("version"),
            )  # fresh keys: pure inserts
        )
    )


_EXPECT_RULES = {
    "value_not_null": "value IS NOT NULL",
    "type_domain": "event_type IN ('view','click','purchase','signup','error')",
    "value_below_90": "value < 90",
    "user_nonneg": "user_id >= 0",
}


@query(
    "llm_cdc_analytics_suite",
    oracle=f"""
    WITH mrg AS (
      SELECT event_id, user_id,
             CASE WHEN event_id % 7 = 0 THEN value + 2000.0 ELSE value END AS v
      FROM events WHERE event_id % 10 <> 0
      UNION ALL
      SELECT event_id + 10000000, user_id, value + 5000.0
      FROM events WHERE event_id % 13 = 0
    ),
    scdch AS (
      SELECT event_id, user_id, value + 1000.0 AS value, 'U' AS op, 1 AS version
      FROM events WHERE event_id % 7 = 0
      UNION ALL
      SELECT event_id, user_id, value + 2000.0, 'U', 2
      FROM events WHERE event_id % 7 = 0
      UNION ALL
      SELECT event_id, user_id, value, 'D', 9
      FROM events WHERE event_id % 10 = 0
      UNION ALL
      SELECT event_id + 10000000, user_id, value + 5000.0, 'U', 1
      FROM events WHERE event_id % 13 = 0
    ),
    scdn AS (
      SELECT event_id, value, op, version,
             lead(version) OVER (PARTITION BY event_id
                                 ORDER BY version, op, user_id, value) AS next_v
      FROM scdch
    ),
    scdf AS (SELECT event_id, min(version) AS first_v FROM scdch GROUP BY event_id),
    scd AS (
      SELECT e.event_id, e.value, CAST(-1 AS BIGINT) AS vf, f.first_v AS vt
      FROM events e LEFT JOIN scdf f ON e.event_id = f.event_id
      UNION ALL
      SELECT event_id, value, version, next_v FROM scdn WHERE op = 'U'
    ),
    cfirst AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
               FROM events GROUP BY user_id),
    cact AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    fv AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
    fc AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
           JOIN fv ON e.user_id = fv.user_id
           WHERE e.event_type = 'click' AND e.ts > fv.t1 GROUP BY e.user_id),
    fp AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
           JOIN fc ON e.user_id = fc.user_id
           WHERE e.event_type = 'purchase' AND e.ts > fc.t2 GROUP BY e.user_id),
    ctoks AS (
      SELECT lang, source, length(text) AS nch,
             len(CASE WHEN trim(text) = '' THEN ['']
                  ELSE string_split_regex(trim(text), '[ \\t\\n\\r\\f]+') END) AS nt
      FROM documents
    ),
    cstats AS (
      SELECT lang, source, count(*) AS n_docs, sum(nch) AS n_chars,
             sum(nt) AS n_tokens, min(nt) AS min_tokens, max(nt) AS max_tokens
      FROM ctoks GROUP BY lang, source
    ),
    gstats AS (
      SELECT count(*) AS n_docs, sum(nch) AS n_chars, sum(nt) AS n_tokens,
             min(nt) AS min_tokens, max(nt) AS max_tokens
      FROM ctoks
    ),
    clong AS (
      SELECT lang || '|' || source || '|' || stat AS s1, v FROM (
        SELECT lang, source, 'n_docs' AS stat, CAST(n_docs AS BIGINT) AS v FROM cstats
        UNION ALL SELECT lang, source, 'n_chars', CAST(n_chars AS BIGINT) FROM cstats
        UNION ALL SELECT lang, source, 'n_tokens', CAST(n_tokens AS BIGINT) FROM cstats
        UNION ALL SELECT lang, source, 'min_tokens', CAST(min_tokens AS BIGINT) FROM cstats
        UNION ALL SELECT lang, source, 'max_tokens', CAST(max_tokens AS BIGINT) FROM cstats
      )
      UNION ALL
      SELECT 'ALL|ALL|' || stat, v FROM (
        SELECT 'n_docs' AS stat, CAST(n_docs AS BIGINT) AS v FROM gstats
        UNION ALL SELECT 'n_chars', CAST(n_chars AS BIGINT) FROM gstats
        UNION ALL SELECT 'n_tokens', CAST(n_tokens AS BIGINT) FROM gstats
        UNION ALL SELECT 'min_tokens', CAST(min_tokens AS BIGINT) FROM gstats
        UNION ALL SELECT 'max_tokens', CAST(max_tokens AS BIGINT) FROM gstats
        UNION ALL SELECT 'p50_ok', CAST(1 AS BIGINT)
        UNION ALL SELECT 'p90_ok', CAST(1 AS BIGINT)
        UNION ALL SELECT 'p99_ok', CAST(1 AS BIGINT)
      )
    ),
    dplant AS (SELECT doc_id, doc_id % 10 AS m, doc_id % 4 AS b FROM documents),
    dblocked AS (
      SELECT doc_id FROM dplant
      WHERE (m = 3 AND b IN (0, 3)) OR (m = 7 AND b IN (1, 2))
         OR (m = 1 AND b = 1) OR (m = 5 AND b = 3)
    )
    SELECT CAST('merge' AS VARCHAR) AS leg, CAST(m.event_id AS BIGINT) AS key,
           CAST(NULL AS VARCHAR) AS s1,
           {sql_fmicro("m.v")} AS i1,
           CAST(m.user_id AS BIGINT) AS i2
    FROM mrg m
    UNION ALL
    SELECT CAST('scd2' AS VARCHAR), CAST(s.event_id AS BIGINT), CAST(NULL AS VARCHAR),
           {sql_fmicro("s.value")},
           CAST(s.vf * 100 + coalesce(s.vt, 50) AS BIGINT)
    FROM scd s
    UNION ALL
    SELECT CAST('expect' AS VARCHAR), CAST(NULL AS BIGINT), CAST(x.rule AS VARCHAR),
           CAST(x.nv AS BIGINT),
           CAST((SELECT count(*) FROM events) AS BIGINT)
    FROM (
      SELECT 'value_not_null' AS rule,
             count(*) FILTER (WHERE NOT coalesce(value IS NOT NULL, FALSE)) AS nv
      FROM events
      UNION ALL
      SELECT 'type_domain',
             count(*) FILTER (WHERE NOT coalesce(
               event_type IN ('view','click','purchase','signup','error'), FALSE))
      FROM events
      UNION ALL
      SELECT 'value_below_90',
             count(*) FILTER (WHERE NOT coalesce(value < 90, FALSE))
      FROM events
      UNION ALL
      SELECT 'user_nonneg',
             count(*) FILTER (WHERE NOT coalesce(user_id >= 0, FALSE))
      FROM events
      UNION ALL
      SELECT 'event_id_unique', count(*) - count(DISTINCT event_id) FROM events
    ) x
    UNION ALL
    SELECT CAST('cohort' AS VARCHAR), CAST(NULL AS BIGINT),
           CAST(c.cohort_date AS VARCHAR), CAST(c.day_offset AS BIGINT),
           CAST(c.n AS BIGINT)
    FROM (
      SELECT f.cohort_date,
             date_diff('day', f.cohort_date, a.d) AS day_offset,
             count(DISTINCT a.user_id) AS n
      FROM cact a JOIN cfirst f ON a.user_id = f.user_id
      GROUP BY f.cohort_date, date_diff('day', f.cohort_date, a.d)
    ) c
    UNION ALL
    SELECT CAST('funnel' AS VARCHAR), CAST(fz.user_id AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(fz.stage AS BIGINT), CAST(epoch_us(fz.tf) AS BIGINT)
    FROM (
      SELECT fv.user_id,
             CAST(CASE WHEN fp.t3 IS NOT NULL THEN 3
                       WHEN fc.t2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage,
             coalesce(fp.t3, fc.t2, fv.t1) AS tf
      FROM fv LEFT JOIN fc ON fv.user_id = fc.user_id
             LEFT JOIN fp ON fv.user_id = fp.user_id
    ) fz
    UNION ALL
    SELECT CAST('corpus' AS VARCHAR), CAST(NULL AS BIGINT), CAST(s1 AS VARCHAR),
           CAST(v AS BIGINT), CAST(NULL AS BIGINT)
    FROM clong
    UNION ALL
    SELECT CAST('domain' AS VARCHAR), CAST(doc_id AS BIGINT),
           CAST('block' AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM dplant WHERE doc_id NOT IN (SELECT doc_id FROM dblocked)
    UNION ALL
    SELECT CAST('domain' AS VARCHAR), CAST(doc_id AS BIGINT),
           CAST('allow' AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM dblocked
    UNION ALL
    SELECT CAST('html' AS VARCHAR), CAST(doc_id AS BIGINT),
           CAST('Doc ' || doc_id AS VARCHAR),
           CAST(1 AS BIGINT),
           CAST(1 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
    FROM documents
    UNION ALL
    {canary_sql(_SUITE_COLS)}
    """,
)
def llm_cdc_analytics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC + analytics legs (8 components + canary; the r6
    de-concentration of llm_library_suite, grown by the two r7
    promotions plus the r7 'html' extraction leg — per-leg semantics
    documented in the r5 suite docstring, now split):

    'merge' — apply_changes (CDC latest-wins merge) against the shared
    synthesized delta; the oracle states the closed form (deletes gone,
    version-2 value on surviving %7 keys, inserts present, everything
    else untouched) row for row, values in floor-based integer micro
    units (bit-identical expressions both engines, zero tie risk).

    'scd2' — scd2_apply (Type-2 history) under the SAME delta on a
    version--1 seeded history; every interval row stated by the oracle
    via lead()-window interval assembly, (valid_from, valid_to) encoded
    into one integer (50 = open; versions are -1/1/2/9 so the encoding
    is collision-free integer arithmetic).

    'expect' — expectation_report (Deequ-lite): four fused predicate
    rules + one exact uniqueness rule over events.

    'cohort' — cohort_retention: daily first-activity cohorts x day
    offsets with distinct-user counts (date_diff in the oracle — no
    engine-inferred DATE subtraction type).

    'funnel' — funnel_stages: the greedy-earliest view->click->purchase
    chain per user (each stage strictly after the previous), stage
    reached + completion instant in epoch micros.

    'corpus' (r7, VERDICT r6 item 1) — corpus_summary: the dataset-card
    numbers per (lang, source) slice plus the global row, unpivoted to
    one (group|stat, value) row each. Exact stats (n_docs, n_chars,
    n_tokens, min/max tokens) are restated by the oracle; the approx
    quantiles are gated with a rank-tolerance invariant computed in the
    SAME Spark plan (fraction of docs <= p_q must bracket q within
    ±0.02 — percentile_approx's rank error at accuracy 10000 over 500
    docs is < 1, so the gate has zero slack risk), stated as constant 1
    by the oracle — the data_profile_columns precedent for sketch
    outputs.

    'domain' (r7, VERDICT r6 item 1) — filter_by_domain_list over a
    deterministically planted URL column (four shapes per doc_id:
    two-part-suffix subdomains, deep subdomains with default ports,
    cased hosts with trailing FQDN dots, scheme-relative URLs) against a
    list mixing registrable-domain and subdomain/messy-cased entries.
    Spark runs the real operator chain (extract_host -> registered_domain
    -> broadcast anti/semi join with host-suffix residual); the oracle
    restates the expected block/allow doc-id sets from the planting
    arithmetic alone.
    """
    from ..operators.dedup import filter_by_domain_list
    from ..operators.expectations import corpus_summary, expectation_report
    from ..operators.funnel import cohort_retention, funnel_stages
    from ..operators.merge import apply_changes, scd2_apply, scd2_init

    ev = load_table(spark, sf_dir, "events")
    mev = ev.select("event_id", "user_id", "value")
    delta = _merge_delta(mev)

    merge_leg = apply_changes(mev, delta, ["event_id"]).select(
        F.lit("merge").alias("leg"),
        F.col("event_id").cast("long").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        fmicro_col(F.col("value")).alias("i1"),
        F.col("user_id").cast("long").alias("i2"),
    )

    # the SAME delta applied as SCD Type-2 history: every superseded
    # interval stays, encoded into i2 as valid_from*100 + valid_to
    scd = scd2_apply(scd2_init(mev, -1), delta, ["event_id"])
    scd2_leg = scd.select(
        F.lit("scd2").alias("leg"),
        F.col("event_id").cast("long").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        fmicro_col(F.col("value")).alias("i1"),
        (
            F.col("valid_from") * 100 + F.coalesce(F.col("valid_to"), F.lit(50))
        ).cast("long").alias("i2"),
    )

    expect_leg = expectation_report(
        ev, _EXPECT_RULES, unique_keys={"event_id_unique": ["event_id"]}
    ).select(
        F.lit("expect").alias("leg"),
        F.lit(None).cast("long").alias("key"),
        F.col("rule").cast("string").alias("s1"),
        F.col("n_violations").cast("long").alias("i1"),
        F.col("n_rows").cast("long").alias("i2"),
    )

    cohort_leg = cohort_retention(ev).select(
        F.lit("cohort").alias("leg"),
        F.lit(None).cast("long").alias("key"),
        F.col("cohort_date").cast("string").alias("s1"),
        F.col("day_offset").cast("long").alias("i1"),
        F.col("n_users").cast("long").alias("i2"),
    )

    funnel_leg = funnel_stages(ev, ["view", "click", "purchase"]).select(
        F.lit("funnel").alias("leg"),
        F.col("user_id").cast("long").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.col("stage_reached").cast("long").alias("i1"),
        F.unix_micros("t_final").cast("long").alias("i2"),
    )

    docs = load_table(spark, sf_dir, "documents")

    # 'corpus': the real operator (grouped + global), unpivoted to
    # (group|stat, value) rows with every value explicitly BIGINT.
    stat_stack = (
        "stack(5, 'n_docs', cast(n_docs as bigint), 'n_chars', cast(n_chars as bigint),"
        " 'n_tokens', cast(n_tokens as bigint), 'min_tokens', cast(min_tokens as bigint),"
        " 'max_tokens', cast(max_tokens as bigint)) as (stat, v)"
    )

    def _corpus_rows(frame: DataFrame, s1: Column) -> DataFrame:
        return frame.select(
            F.lit("corpus").alias("leg"),
            F.lit(None).cast("long").alias("key"),
            s1.cast("string").alias("s1"),
            F.col("v").cast("long").alias("i1"),
            F.lit(None).cast("long").alias("i2"),
        )

    cs = corpus_summary(docs)
    corpus_grouped = _corpus_rows(
        cs.select("lang", "source", F.expr(stat_stack)),
        F.concat_ws("|", "lang", "source", "stat"),
    )
    gs = corpus_summary(docs, group_cols=())
    corpus_global = _corpus_rows(
        gs.select(F.expr(stat_stack)),
        F.concat_ws("|", F.lit("ALL"), F.lit("ALL"), F.col("stat")),
    )

    # sketch gate: percentile_approx outputs are engine-specific, so the
    # driver-checkable claim is the rank bracket — the fraction of docs
    # at or below p_q must reach q, and the fraction strictly below must
    # not exceed q, within ±0.02 (accuracy 10000 => rank error < 1 at
    # this scale; any true q-quantile element satisfies the bracket).
    nt = F.size(tokens(F.col("text")))
    quant = docs.select(nt.alias("nt")).crossJoin(
        F.broadcast(gs.select("p50_tokens", "p90_tokens", "p99_tokens"))
    )
    fr = quant.agg(
        *[
            F.avg((F.col("nt") <= F.col(f"p{q}_tokens")).cast("double")).alias(f"le{q}")
            for q in (50, 90, 99)
        ],
        *[
            F.avg((F.col("nt") < F.col(f"p{q}_tokens")).cast("double")).alias(f"lt{q}")
            for q in (50, 90, 99)
        ],
    )

    def _gate(q: int) -> Column:
        tgt = q / 100.0
        return (
            (F.col(f"le{q}") >= tgt - 0.02) & (F.col(f"lt{q}") <= tgt + 0.02)
        ).cast("bigint")

    corpus_gates = _corpus_rows(
        fr.select(
            _gate(50).alias("g50"), _gate(90).alias("g90"), _gate(99).alias("g99")
        ).select(
            F.expr("stack(3, 'p50_ok', g50, 'p90_ok', g90, 'p99_ok', g99) AS (stat, v)")
        ),
        F.concat_ws("|", F.lit("ALL"), F.lit("ALL"), F.col("stat")),
    )

    # 'domain': planted URL shapes (arithmetic restatable by the oracle)
    # through the real block/allow filter. The four shapes come from a
    # BROADCAST MAPPING JOIN, not an inline 4-branch CASE: the filter's
    # join-key isnotnull constraint gets pushed down with the full
    # host->domain chain substituted at ~24 references, and with the
    # CASE inlined that one predicate generated >1 MB of Java — past
    # janino's 64 KB method limit, knocking the whole fused stage to
    # interpreted eval (r8; the planted URLs are unchanged, so the
    # oracle is untouched).
    m = (F.col("doc_id") % 10).cast("string")
    did = F.col("doc_id").cast("string")
    url_shapes = local_table(spark,
        [
            (0, "https://www.d", ".co.uk/x?utm_source=z&id=", True),
            (1, "http://sub.a.d", "site.com:80/path/", True),
            (2, "https://D", "SITE.com./y", False),
            (3, "//cdn.d", ".co.uk/z", False),
        ],
        "b long, pre string, post string, use_did boolean",
    )
    url = F.concat(
        F.col("pre"), m, F.col("post"),
        F.when(F.col("use_did"), did).otherwise(F.lit("")),
    )
    durls = (
        docs.join(F.broadcast(url_shapes), F.col("doc_id") % 4 == F.col("b"))
        .select("doc_id", url.alias("url"))
    )
    dlist = local_table(spark,
        [("d3.co.uk",), ("d7site.com",), ("sub.a.d1site.com",), ("CDN.d5.co.uk.",)],
        "domain string",
    )

    def _domain_rows(frame: DataFrame, tag: str) -> DataFrame:
        return frame.select(
            F.lit("domain").alias("leg"),
            F.col("doc_id").cast("long").alias("key"),
            F.lit(tag).cast("string").alias("s1"),
            F.lit(None).cast("long").alias("i1"),
            F.lit(None).cast("long").alias("i2"),
        )

    domain_block = _domain_rows(
        filter_by_domain_list(durls, dlist, mode="block"), "block"
    )
    domain_allow = _domain_rows(
        filter_by_domain_list(durls, dlist, mode="allow"), "allow"
    )

    # 'html' (r7): planted markup through the REAL html_title/html_links
    # extractors; the oracle states the closed forms the structure makes
    # derivable (title text, 1 absolute link, a relative link on %3
    # docs, mailto always excluded). No regex reruns oracle-side, so
    # Java-vs-RE2 regex nuances cannot skew the gate.
    from ..functions.text import html_links, html_title

    planted_html = F.concat(
        F.lit("<html><head><title> Doc "),
        F.col("doc_id").cast("string"),
        F.lit(" </title><style>b{c:red}</style></head><body>"),
        F.lit('<a href="https://d'),
        (F.col("doc_id") % 7).cast("string"),
        F.lit('.com/p?x=1">l</a>'),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit('<a href="/rel">r</a><a href="mailto:x@y.z">m</a>'),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    # layered project: materialize the planted markup ONCE and extract
    # from the COLUMN — inlining it at all three references tripled the
    # generated code and helped push the fused union stage past janino's
    # 64 KB method limit (the r7 CollapseProject lesson; the extractors
    # are regexp chains, so the duplication is expensive)
    html_leg = docs.select(
        "doc_id", planted_html.alias("_html")
    ).select(
        F.lit("html").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        html_title(F.col("_html")).alias("s1"),
        F.size(html_links(F.col("_html"))).cast("long").alias("i1"),
        F.size(html_links(F.col("_html"), absolute_only=False)).cast("long").alias("i2"),
    )

    return (
        merge_leg.unionByName(scd2_leg)
        .unionByName(expect_leg)
        .unionByName(cohort_leg)
        .unionByName(funnel_leg)
        .unionByName(corpus_grouped)
        .unionByName(corpus_global)
        .unionByName(corpus_gates)
        .unionByName(domain_block)
        .unionByName(domain_allow)
        .unionByName(html_leg)
        .unionByName(canary_df(spark, _SUITE_COLS))
    )


# ---------------------------------------------------------------------------
# Shared text CTE builders (floor-based micro rounding, explicit casts)
# ---------------------------------------------------------------------------

#: tokenization CTEs shared by the text suites: whitespace tokens with
#: per-token rows (tok), corpus unigram frequencies (freq), corpus totals
#: (tot), and the per-doc token-array table (rep_docs) with line/paragraph
#: splits for the repetition/span legs.
_TOK_CTES = """
    tok AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS token
      FROM documents
    ),
    freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
    tot AS (SELECT sum(cnt) AS n_total, count(*) AS n_vocab FROM freq)"""

_REP_DOCS_CTE = """
    rep_docs AS (
      SELECT doc_id, length(text) AS nch,
             CASE WHEN trim(text) = '' THEN ['']
                  ELSE string_split_regex(trim(text), '[ \\t\\n\\r\\f]+') END AS toks,
             string_split(text, chr(10)) AS ls,
             string_split_regex(text, '\\n{2,}') AS ps
      FROM documents
    )"""


def _repetition_oracle_ctes() -> str:
    """DuckDB CTEs recomputing every ``gopher_repetition_columns`` stat
    in integer micro units plus the conjunction pass flag (floor-based —
    ``floor((x + 1e-9)*1e6 + 0.5)`` equals the Spark leg's
    ``floor(round6(x)*1e6 + 1e-9 + 0.5)`` because ``round6(x)`` is the
    nearest-6dp double k/1e6 and both paths land on k).
    Tokenization/line/paragraph splits mirror the Spark expressions
    exactly (same whitespace class, chr(10) lines, '\\n{{2,}}'
    paragraphs, whole-gram guards for docs shorter than n tokens).
    Requires ``rep_docs``."""

    def micro(x: str) -> str:
        return f"CAST(floor((({x}) + 1e-09) * 1000000.0 + 0.5) AS BIGINT)"

    def cfrac(mass: str, nch: str) -> str:
        return micro(
            f"CASE WHEN {nch} > 0 THEN least(({mass}) / CAST({nch} AS DOUBLE), 1.0) ELSE 0.0 END"
        )

    unit_stats = []
    for unit, arr in (("line", "ls"), ("para", "ps")):
        unit_stats.append(
            f"SELECT doc_id, 'dup_{unit}_frac' AS s1, "
            + micro(f"(len({arr}) - len(list_distinct({arr}))) / CAST(len({arr}) AS DOUBLE)")
            + " AS v FROM rep_docs"
        )
        unit_stats.append(
            f"""SELECT rd.doc_id, 'dup_{unit}_char_frac', {cfrac("coalesce(m.mass, 0)", "rd.nch")}
            FROM rep_docs rd LEFT JOIN (
              SELECT doc_id, sum((c - 1) * length(u)) AS mass FROM (
                SELECT doc_id, u, count(*) AS c
                FROM (SELECT doc_id, unnest({arr}) AS u FROM rep_docs) GROUP BY doc_id, u
              ) WHERE c >= 2 GROUP BY doc_id
            ) m ON rd.doc_id = m.doc_id"""
        )
    top_stats = [
        f"""SELECT rd.doc_id, 'top{n}gram_char_frac',
            {cfrac("coalesce(t.cnt * length(t.gram), 0)", "rd.nch")}
        FROM rep_docs rd LEFT JOIN (
          SELECT doc_id, cnt, gram FROM (
            SELECT doc_id, gram, cnt,
                   row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
            FROM repgc WHERE n = {n}
          ) WHERE rn = 1 AND cnt >= 2
        ) t ON rd.doc_id = t.doc_id"""
        for n in (2, 3, 4)
    ]
    dup_stats = [
        f"""SELECT rd.doc_id, 'dup{n}gram_char_frac', {cfrac("coalesce(m.mass, 0)", "rd.nch")}
        FROM rep_docs rd LEFT JOIN (
          SELECT doc_id, sum((cnt - 1) * length(gram)) AS mass
          FROM repgc WHERE n = {n} AND cnt >= 2 GROUP BY doc_id
        ) m ON rd.doc_id = m.doc_id"""
        for n in (5, 10)
    ]
    pass_checks = " AND ".join(
        f"max(CASE WHEN s1 = '{name}' THEN v END) <= {thr}" for name, thr in _REPETITION_STATS
    )
    all_stats = ",\n".join(f"s{i} AS ({s})" for i, s in enumerate(unit_stats + top_stats + dup_stats))
    union = " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(len(unit_stats + top_stats + dup_stats)))
    return f"""
    repg AS (
      SELECT doc_id, n, gram FROM (
        SELECT doc_id, ns.n,
               CASE WHEN len(toks) >= ns.n
                    THEN list_transform(range(1, len(toks) - ns.n + 2),
                                        i -> array_to_string(toks[i:i+ns.n-1], ' '))
                    ELSE [] END AS gs
        FROM rep_docs, (SELECT unnest([2, 3, 4, 5, 10]) AS n) ns
      ), unnest(gs) AS u(gram)
    ),
    repgc AS (SELECT doc_id, n, gram, count(*) AS cnt FROM repg GROUP BY doc_id, n, gram),
    {all_stats},
    repstats AS ({union}),
    reppass AS (
      SELECT doc_id,
             CAST(CASE WHEN {pass_checks} THEN 1000000 ELSE 0 END AS BIGINT) AS v
      FROM repstats GROUP BY doc_id
    )"""


# ---------------------------------------------------------------------------
# Suite: text modeling (vocab, encode, nll, nll2, entropy, repetition,
# classifier)
# ---------------------------------------------------------------------------


@query(
    "llm_text_model_suite",
    oracle=f"""
    WITH {_TOK_CTES},
    {_REP_DOCS_CTE},
    {_repetition_oracle_ctes()},
    clsm AS (
      SELECT doc_id,
             {sql_fmicro("sum(cnt * ((idx % 997 - 498) / CAST(1000.0 AS DOUBLE)))")} AS mm
      FROM (
        SELECT doc_id, idx, CAST(count(*) AS DOUBLE) AS cnt FROM (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 4096 AS idx
          FROM tok
        ) GROUP BY doc_id, idx
      ) GROUP BY doc_id
    )
    SELECT CAST('vocab' AS VARCHAR) AS leg,
           CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) - 1 AS BIGINT) AS key,
           CAST(token AS VARCHAR) AS s1, CAST(cnt AS BIGINT) AS i1,
           CAST(NULL AS BIGINT) AS i2
    FROM freq
    UNION ALL
    SELECT CAST('encode' AS VARCHAR), CAST(doc_id AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS BIGINT),
           CAST(0 AS BIGINT)
    FROM documents
    UNION ALL
    SELECT CAST('nll' AS VARCHAR), CAST(tok.doc_id AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(count(*) AS BIGINT),
           {sql_fmicro("avg(-ln((cnt + 1.0) / (n_total + n_vocab)))")}
    FROM tok JOIN freq USING (token), tot
    GROUP BY tok.doc_id
    UNION ALL
    SELECT CAST('nll2' AS VARCHAR), CAST(s.doc_id AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(s.n AS BIGINT), CAST(s.m AS BIGINT)
    FROM (
      WITH bt AS (
        SELECT doc_id, toks[i-1] AS prev, toks[i] AS cur
        FROM rep_docs,
             unnest(CASE WHEN len(toks) >= 2 THEN range(2, len(toks) + 1)
                         ELSE [] END) AS u(i)
      ), bfr AS (SELECT prev, cur, count(*) AS bf FROM bt GROUP BY prev, cur),
      sc AS (
        SELECT bt.doc_id, -ln((bf + 1.0) / (f.cnt + tot.n_vocab)) AS nll
        FROM bt JOIN bfr USING (prev, cur) JOIN freq f ON f.token = bt.prev, tot
        UNION ALL
        SELECT rd.doc_id, -ln((f.cnt + 1.0) / (tot.n_total + tot.n_vocab))
        FROM rep_docs rd JOIN freq f ON f.token = rd.toks[1], tot
      )
      SELECT doc_id, count(*) AS n, {sql_fmicro("avg(nll)")} AS m
      FROM sc GROUP BY doc_id
    ) s
    UNION ALL
    SELECT CAST('entropy' AS VARCHAR), CAST(e.doc_id AS BIGINT), CAST(NULL AS VARCHAR),
           {sql_fmicro("e.h")}, CAST(e.n AS BIGINT)
    FROM (
      SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n,
             CASE WHEN length(d.text) = 0 THEN 0.0
                  ELSE (ln(CAST(length(d.text) AS DOUBLE))
                        - coalesce(cs.s, 0.0) / CAST(length(d.text) AS DOUBLE))
                       / ln(2.0) END AS h
      FROM documents d LEFT JOIN (
        SELECT doc_id, sum(cnt * ln(cnt)) AS s FROM (
          SELECT doc_id, CAST(count(*) AS DOUBLE) AS cnt
          FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
          GROUP BY doc_id, ch
        ) GROUP BY doc_id
      ) cs ON d.doc_id = cs.doc_id
    ) e
    UNION ALL
    SELECT CAST('repetition' AS VARCHAR), CAST(doc_id AS BIGINT), CAST(s1 AS VARCHAR),
           CAST(v AS BIGINT), CAST(NULL AS BIGINT) FROM repstats
    UNION ALL
    SELECT CAST('repetition' AS VARCHAR), CAST(doc_id AS BIGINT), 'repetition_pass',
           CAST(v AS BIGINT), CAST(NULL AS BIGINT) FROM reppass
    UNION ALL
    SELECT CAST('classifier' AS VARCHAR), CAST(doc_id AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(mm AS BIGINT),
           CAST(CASE WHEN mm > 0 THEN 1 ELSE 0 END AS BIGINT)
    FROM clsm
    UNION ALL
    SELECT CAST('clean' AS VARCHAR), CAST(doc_id AS BIGINT),
           CAST('A B C' || chr(10) || chr(10) || 'D ' || doc_id AS VARCHAR),
           CAST(length('A B C' || chr(10) || chr(10) || 'D ' || doc_id) AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM documents
    UNION ALL
    {canary_sql(_SUITE_COLS)}
    """,
)
def llm_text_model_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-modeling legs (8 components + canary; r6 de-concentration of
    llm_library_suite — per-leg semantics documented in the r5 suite
    docstring, now split):

    'vocab' — the FULL build_vocab output (token, count, dense
    frequency-ranked token_id with deterministic tie-breaks).

    'encode' — encode_documents roundtrip per document: i1 = n_tokens
    from the ENCODED output, i2 = unk count + decode-mismatch flag
    (must be 0: the corpus's own vocab has no OOV and the decode must
    reproduce tokens(text) exactly).

    'nll' / 'nll2' — unigram / bigram add-one-smoothed corpus NLL per
    document (the CCNet-shaped perplexity filters), compared in
    floor-based integer micro-nats.

    'entropy' — char_entropy Shannon bits/char from the zero-shuffle
    sorted-run fold vs the oracle's unnest-groupBy recomputation.

    'repetition' — all nine Gopher repetition fractions plus the
    conjunction pass flag, one row per (doc, stat), integer micro units.

    'classifier' — hashed-feature linear scoring under closed-form
    weights w(idx) = (idx % 997 - 498)/1000 (portable md5 hashing
    trick); margins in integer micro units, labels derived from the
    SAME value in both engines. Training is pinned by numpy-parity
    pytest.
    """
    from ..functions.text import char_entropy, gopher_repetition_table
    from ..operators.classifier import hashed_features, linear_margin
    from ..operators.sampling import bigram_nll_scores, unigram_nll_scores
    from ..operators.vocab import build_vocab, encode_documents

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    vocab = build_vocab(d)
    vocab_leg = vocab.select(
        F.lit("vocab").alias("leg"),
        F.col("token_id").cast("long").alias("key"),
        F.col("token").cast("string").alias("s1"),
        F.col("count").cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    enc = encode_documents(d, vocab)
    ids = enc.select("doc_id", F.posexplode("token_ids").alias("pos", "token_id"))
    decoded = (
        ids.join(vocab.select("token_id", "token"), on="token_id", how="left")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda s: s["token"],
            ).alias("decoded")
        )
    )
    orig = d.select("doc_id", tokens(F.col("text")).alias("orig"))
    encode_leg = (
        enc.join(decoded, "doc_id")
        .join(orig, "doc_id")
        .select(
            F.lit("encode").alias("leg"),
            F.col("doc_id").cast("long").alias("key"),
            F.lit(None).cast("string").alias("s1"),
            F.col("n_tokens").cast("long").alias("i1"),
            (
                F.size(F.filter(F.col("token_ids"), lambda x: x == F.lit(-1)))
                + F.when(F.col("decoded") == F.col("orig"), F.lit(0)).otherwise(F.lit(1))
            ).cast("long").alias("i2"),
        )
    )

    nll_leg = unigram_nll_scores(d).select(
        F.lit("nll").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.col("n_tokens").cast("long").alias("i1"),
        fmicro_col(F.col("avg_nll")).alias("i2"),
    )

    nll2_leg = bigram_nll_scores(d).select(
        F.lit("nll2").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.col("n_tokens").cast("long").alias("i1"),
        fmicro_col(F.col("avg_nll")).alias("i2"),
    )

    entropy_leg = d.select(
        F.lit("entropy").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        fmicro_col(char_entropy(F.col("text"))).alias("i1"),
        F.length("text").cast("long").alias("i2"),
    )

    # factored table form (r16): bit-identical stats, ~6x cheaper to plan
    # (the column form re-embeds every stat tree in repetition_pass)
    rep_wide = gopher_repetition_table(d, "text")
    stat_names = [name for name, _ in _REPETITION_STATS] + ["repetition_pass"]
    rep_leg = (
        rep_wide.select(
            "doc_id", *[F.col(s).cast("double").alias(s) for s in stat_names]
        )
        .unpivot("doc_id", stat_names, "s1", "frac")
        .select(
            F.lit("repetition").alias("leg"),
            F.col("doc_id").cast("long").alias("key"),
            F.col("s1").cast("string").alias("s1"),
            fmicro_col(F.col("frac")).alias("i1"),
            F.lit(None).cast("long").alias("i2"),
        )
    )

    # closed-form weights exercise the REAL scoring path (hash -> pool ->
    # weight join -> margin agg) while staying SQL-restatable; i1/i2
    # derive from the SAME floor-rounded micro value so the sign bit
    # cannot diverge on a mathematically-zero margin.
    feats = hashed_features(d, n_features=4096)
    cls_weights = feats.select("idx").distinct().withColumn(
        "w", ((F.col("idx") % 997) - 498) / F.lit(1000.0)
    )
    _mm = fmicro_col(F.col("margin"))
    classifier_leg = linear_margin(feats, cls_weights).select(
        F.lit("classifier").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        _mm.alias("i1"),
        (_mm > 0).cast("long").alias("i2"),
    )

    # 'clean' (r7): a planted dirty string (BOM, NBSPs, tab runs, CRLF
    # blank-run, zero-width space, edge whitespace) through the REAL
    # clean_text chain; the oracle states the cleaned closed form — no
    # regex reruns oracle-side.
    from ..functions.text import clean_text

    _did = F.col("doc_id").cast("string")
    dirty = F.concat(
        F.lit("\ufeff A\u00a0\u00a0B\t\tC\r\n\r\n\r\n\r\nD "),
        _did,
        F.lit(" \u200b"),
    )
    clean_leg = d.select(
        F.lit("clean").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        clean_text(dirty).alias("s1"),
        F.length(clean_text(dirty)).cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    return (
        vocab_leg.unionByName(encode_leg)
        .unionByName(nll_leg)
        .unionByName(nll2_leg)
        .unionByName(entropy_leg)
        .unionByName(rep_leg)
        .unionByName(classifier_leg)
        .unionByName(clean_leg)
        .unionByName(canary_df(spark, _SUITE_COLS))
    )


# ---------------------------------------------------------------------------
# Suite: retrieval + sampling (tfidf, bm25, mixrates, shuffle, wsample)
# ---------------------------------------------------------------------------


@query(
    "llm_retrieval_suite",
    oracle=f"""
    WITH {_TOK_CTES},
    {_REP_DOCS_CTE},
    src AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    srctot AS (SELECT sum(n) AS t FROM src),
    raw AS (SELECT source, pow(CAST(n AS DOUBLE) / t, -0.5) AS r FROM src, srctot),
    rates AS (
      SELECT source, floor((r / (SELECT max(r) FROM raw)) * 1000000.0 + 1e-09 + 0.5) / 1000000.0 AS rate
      FROM raw
    ),
    bmtf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
    bmdl AS (SELECT doc_id, len(toks) AS dl FROM rep_docs),
    bmdf AS (SELECT token, count(*) AS df FROM bmtf GROUP BY token),
    bmst AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n_docs,
                    (SELECT CAST(sum(len(toks)) AS DOUBLE) FROM rep_docs) AS n_toks),
    bmq AS (SELECT DISTINCT query_id, term FROM
            (SELECT doc_id AS query_id, unnest(toks[1:4]) AS term
             FROM rep_docs WHERE doc_id % 100 = 0)),
    bmc AS (
      SELECT q.query_id, t.doc_id,
             CAST(floor(
               {sql_floor6("ln(1.0 + (s.n_docs - dfr.df + 0.5) / (dfr.df + 0.5))")}
               * (t.tf * (1.25 + 1.0))
               / (t.tf + 1.25 * ((1.0 - 0.75) + 0.75 * l.dl / (s.n_toks / s.n_docs)))
               * 1000000.0 + 1e-09 + 0.5) AS BIGINT) AS cm
      FROM bmtf t
      JOIN bmq q ON t.token = q.term
      JOIN bmdl l ON t.doc_id = l.doc_id
      JOIN bmdf dfr ON t.token = dfr.token, bmst s
    )
    SELECT CAST('tfidf' AS VARCHAR) AS leg, CAST(t.doc_id AS BIGINT) AS key,
           CAST(t.term AS VARCHAR) AS s1, CAST(t.rank AS BIGINT) AS i1,
           CAST(t.score_micro AS BIGINT) AS i2
    FROM (
      WITH tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
      dft AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      nd AS (SELECT count(*) AS n_docs FROM documents)
      SELECT doc_id, token AS term,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY
                  CAST(floor(tf * {sql_floor6("ln((1.0 + n_docs) / (1.0 + df)) + 1.0")} * 1e6 + 0.5) AS BIGINT) DESC,
                  token) AS BIGINT) AS rank,
             CAST(floor(tf * {sql_floor6("ln((1.0 + n_docs) / (1.0 + df)) + 1.0")} * 1e6 + 0.5) AS BIGINT) AS score_micro
      FROM tf JOIN dft USING (token), nd
    ) t WHERE t.rank <= 3
    UNION ALL
    SELECT CAST('bm25' AS VARCHAR), CAST(b.query_id AS BIGINT),
           CAST(b.doc_id AS VARCHAR), CAST(b.score AS BIGINT), CAST(b.rnk AS BIGINT)
    FROM (
      SELECT query_id, doc_id, score,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
      FROM (SELECT query_id, doc_id, CAST(sum(cm) AS BIGINT) AS score
            FROM bmc GROUP BY query_id, doc_id)
    ) b WHERE b.rnk <= 10
    UNION ALL
    SELECT CAST('mixrates' AS VARCHAR), CAST(NULL AS BIGINT), CAST(d.source AS VARCHAR),
           CAST(count(*) AS BIGINT), CAST(NULL AS BIGINT)
    FROM documents d JOIN rates ON d.source = rates.source
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          / 4294967296.0 < rate
    GROUP BY d.source
    UNION ALL
    SELECT CAST('shuffle' AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST((SELECT count(*) FROM documents) AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT CAST('wsample' AS VARCHAR), CAST(doc_id AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(rnk AS BIGINT), CAST(NULL AS BIGINT)
    FROM (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY
               pow((CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 8))
                             AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0,
                   1.0 / CAST(n_chars AS DOUBLE)) DESC,
               doc_id) AS BIGINT) AS rnk
      FROM documents
      WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0
    ) WHERE rnk <= 100
    UNION ALL
    SELECT CAST('splits' AS VARCHAR), CAST(NULL AS BIGINT),
           CAST(spl || ':' || source AS VARCHAR),
           CAST(count(*) AS BIGINT), CAST(NULL AS BIGINT)
    FROM (
      SELECT source,
             CASE WHEN u < 0.75 THEN 'train'
                  WHEN u < 0.875 THEN 'val'
                  ELSE 'test' END AS spl
      FROM (SELECT source,
                   CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT)
                   / 4294967296.0 AS u
            FROM documents)
    )
    GROUP BY spl, source
    UNION ALL
    SELECT CAST('splits' AS VARCHAR), CAST(-1 AS BIGINT),
           CAST('_leak_groups' AS VARCHAR),
           CAST(0 AS BIGINT), CAST(NULL AS BIGINT)
    UNION ALL
    SELECT CAST('urlnorm' AS VARCHAR), CAST(doc_id AS BIGINT),
           CAST('https://www.ex' || (doc_id % 5) || 'ample.com/Path/' || doc_id
                || '?b=' || (doc_id % 5) AS VARCHAR),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM documents
    UNION ALL
    SELECT CAST('shards' AS VARCHAR), CAST(doc_id AS BIGINT),
           CAST(NULL AS VARCHAR),
           CAST(floor(CAST(COALESCE(sum(n_chars) OVER (
                 ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS DOUBLE) / 40000.0) AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM documents
    UNION ALL
    {canary_sql(_SUITE_COLS)}
    """,
)
def llm_retrieval_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval + sampling legs (8 components + canary; r6
    de-concentration of llm_library_suite, +'splits'/'urlnorm' in r7,
    +'shards' in r8):

    'shards' (r8) — export_training_shards: fixed-budget (40k chars)
    training-shard assignment through the REAL two-level distributed
    prefix sum (range repartition + per-partition window + broadcast
    partition offsets — layout-independent by construction, so the
    engine's 32-partition run must equal the oracle's serial window).
    The oracle states the global exclusive running sum with DuckDB's
    own window, double-divided by the identical literal; sums stay
    far below 2^53 so the IEEE division agrees bit-for-bit.

    'tfidf' — tfidf_top_terms: top-3 smoothed TF-IDF terms per document,
    scores in exact integer micro-units, ranks fully ordered by
    (score DESC, term ASC).

    'bm25' — bm25_top_docs: top-10 docs per query (queries = first 4
    tokens of every doc_id % 100 == 0 document) with k1=1.25/b=0.75 so
    every derived constant is an exact binary fraction; per-term
    contributions floor-round to integer micro-units BEFORE summing
    (order-independent), and the oracle casts the sum back to BIGINT so
    DuckDB's HUGEINT sum type can never retype the union column.

    'mixrates' — temperature_mix_rates(T=2) + hash_stratified_sample on
    the source column: tempered keep rates floor-rounded to 6dp on BOTH
    engines (so libm pow differences cannot move the filter threshold),
    md5 membership replayed exactly.

    'shuffle' — shuffle_deterministic layout-independence: same seed on
    two differently-partitioned inputs must give every doc the same
    shard (i2 = mismatch count, stated 0), full corpus present (i1).

    'wsample' — weighted_sample (Efraimidis-Spirakis A-ES) top-100 by
    u^(1/n_chars); the oracle recomputes every key and restates the
    full rank permutation.

    'splits' (r7) — assign_splits leakage-guarded train/val/test: split
    is a pure function of the SOURCE (the leakage unit), weights
    0.75/0.125/0.125 so every cumulative edge is an exact binary
    fraction; per-(split, source) doc counts restated by the oracle's
    own md5 replay, plus split_leakage_report's straddling-group count
    stated as the constant 0.
    """
    from ..operators.sampling import (
        assign_splits,
        hash_stratified_sample,
        shuffle_deterministic,
        split_leakage_report,
        temperature_mix_rates,
        weighted_sample,
    )
    from ..operators.tfidf import bm25_top_docs, tfidf_top_terms

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    tfidf_leg = tfidf_top_terms(d, k=3).select(
        F.lit("tfidf").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.col("term").cast("string").alias("s1"),
        F.col("rank").cast("long").alias("i1"),
        F.col("score_micro").cast("long").alias("i2"),
    )

    # k1=1.25 (not the 1.2 API default): every derived constant (k1+1 =
    # 2.25, 1-b = 0.25) is then an EXACT binary fraction, so the oracle's
    # decimal literals convert to the identical doubles Spark's Python
    # literals do — no cross-engine representation slop in the score math.
    bm_queries = d.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens(F.col("text")), 1, 4), " ").alias("text"),
    )
    bm25_leg = bm25_top_docs(d, bm_queries, k=10, k1=1.25, b=0.75).select(
        F.lit("bm25").alias("leg"),
        F.col("query_id").cast("long").alias("key"),
        F.col("doc_id").cast("string").alias("s1"),
        F.col("score_micro").cast("long").alias("i1"),
        F.col("rank").cast("long").alias("i2"),
    )

    ds = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    rates = {
        k: py_floor6(v)
        for k, v in temperature_mix_rates(ds, "source", temperature=2.0).items()
    }
    mix_leg = (
        hash_stratified_sample(ds, rates, "source", "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .select(
            F.lit("mixrates").alias("leg"),
            F.lit(None).cast("long").alias("key"),
            F.col("source").cast("string").alias("s1"),
            F.col("n_kept").cast("long").alias("i1"),
            F.lit(None).cast("long").alias("i2"),
        )
    )

    shuf_a = shuffle_deterministic(
        ds.repartition(5), seed=7, num_partitions=8
    ).select("doc_id", F.spark_partition_id().alias("pa"))
    shuf_b = shuffle_deterministic(
        ds.repartition(13, "source"), seed=7, num_partitions=8
    ).select("doc_id", F.spark_partition_id().alias("pb"))
    shuffle_leg = (
        shuf_a.join(shuf_b, on="doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("pa") != F.col("pb")).cast("long")).alias("n_mismatch"),
        )
        .select(
            F.lit("shuffle").alias("leg"),
            F.lit(None).cast("long").alias("key"),
            F.lit(None).cast("string").alias("s1"),
            F.col("n").cast("long").alias("i1"),
            F.col("n_mismatch").cast("long").alias("i2"),
        )
    )

    dw = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    wsample_leg = weighted_sample(dw, "n_chars", k=100, seed=7).select(
        F.lit("wsample").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.col("sample_rank").cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    assigned = assign_splits(
        ds, {"train": 0.75, "val": 0.125, "test": 0.125}, group_col="source"
    )
    splits_leg = (
        assigned.groupBy("split", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.lit("splits").alias("leg"),
            F.lit(None).cast("long").alias("key"),
            F.concat_ws(":", "split", "source").alias("s1"),
            F.col("n_docs").cast("long").alias("i1"),
            F.lit(None).cast("long").alias("i2"),
        )
    )
    leak_leg = split_leakage_report(assigned, "source").agg(
        F.count(F.lit(1)).alias("n_leak")
    ).select(
        F.lit("splits").alias("leg"),
        F.lit(-1).cast("long").alias("key"),
        F.lit("_leak_groups").alias("s1"),
        F.col("n_leak").cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    # 'urlnorm' (r7): planted messy URLs (case, default port, tracking
    # params interleaved with a kept param, fragment) through the REAL
    # normalize_url; the oracle states the canonical closed form.
    from ..functions.url import normalize_url

    _did = F.col("doc_id").cast("string")
    _m5 = (F.col("doc_id") % 5).cast("string")
    messy = F.concat(
        F.lit("HTTPS://WwW.Ex"), _m5, F.lit("AMPLE.com:443/Path/"), _did,
        F.lit("?utm_source=x&b="), _m5, F.lit("&fbclid=z#frag"),
    )
    urlnorm_leg = ds.select(
        F.lit("urlnorm").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        normalize_url(messy).alias("s1"),
        F.lit(None).cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    # 'shards' (r8): the real distributed prefix sum over n_chars at
    # budget 40000; doc_id is the unique global order
    from ..operators.sampling import export_training_shards

    shards_leg = export_training_shards(
        load_table(spark, sf_dir, "documents").select("doc_id", "n_chars"),
        budget=40000,
        token_col="n_chars",
        order_col="doc_id",
    ).select(
        F.lit("shards").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.col("shard_id").cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    return (
        tfidf_leg.unionByName(bm25_leg)
        .unionByName(mix_leg)
        .unionByName(shuffle_leg)
        .unionByName(wsample_leg)
        .unionByName(splits_leg)
        .unionByName(leak_leg)
        .unionByName(urlnorm_leg)
        .unionByName(shards_leg)
        .unionByName(canary_df(spark, _SUITE_COLS))
    )


# ---------------------------------------------------------------------------
# Suite: dedup joins (decontam, boilerplate, dupspans, semdedup, jacjoin,
# editdist)
# ---------------------------------------------------------------------------

#: duplicate-span CTEs (exact-substring dedup, span_n = 8); needs rep_docs
_SPAN_CTES = """
    spg AS (
      SELECT doc_id, i AS pos, array_to_string(toks[i+1:i+8], ' ') AS gram
      FROM rep_docs,
           unnest(CASE WHEN len(toks) >= 8 THEN range(0, len(toks) - 8 + 1) ELSE [] END) AS u(i)
    ),
    spd AS (SELECT gram FROM spg GROUP BY gram HAVING count(*) >= 2),
    sph AS (SELECT doc_id, pos FROM spg WHERE gram IN (SELECT gram FROM spd)),
    spc AS (
      SELECT doc_id, count(DISTINCT p) AS ndup
      FROM sph, unnest(range(pos, pos + 8)) AS v(p) GROUP BY doc_id
    )"""


def _myers_editdist_ctes(max_k: int = 3, prefix_len: int = 12) -> str:
    """From-scratch Myers/Hyyro bit-parallel Levenshtein as a DuckDB
    recursive CTE — NO ``levenshtein`` builtin anywhere (its behavior is
    DuckDB-version-sensitive; VERDICT r5 'what's wrong'). The pattern's
    match bitmask Eq is computed inline per step (strings are <=
    ``prefix_len`` chars so the mask fits easily in a BIGINT); every
    operation is integer bit arithmetic — bit-identical in any engine
    version. Validated cell-for-cell against a classic Wagner-Fischer DP
    in tests and (at build time) against DuckDB 1.0.0's levenshtein on
    the full sf0.01 pair set: 0 mismatches.

    Emits ``edd(ia, ib, d)`` for all pairs with |len diff| <= ``max_k``
    (a sound prefilter: d >= |la - lb|); the consumer filters d <=
    ``max_k``."""
    eq = """coalesce(list_sum(list_transform(range(1, la + 1),
        i -> CASE WHEN substr(sa, CAST(i AS INT), 1) = substr(sb, CAST(jn AS INT), 1)
                  THEN (CAST(1 AS BIGINT) << CAST(i - 1 AS INT)) ELSE CAST(0 AS BIGINT) END)), 0)"""
    return f"""
    edn AS (SELECT doc_id, substr(text, 1, {prefix_len}) AS s,
                   length(substr(text, 1, {prefix_len})) AS l FROM documents),
    edp AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, a.s AS sa, b.s AS sb,
             CAST(a.l AS BIGINT) AS la, CAST(b.l AS BIGINT) AS lb
      FROM edn a JOIN edn b ON a.doc_id < b.doc_id AND abs(a.l - b.l) <= {max_k}
    ),
    ed AS (
      SELECT ia, ib, sa, sb, la, lb, CAST(0 AS BIGINT) AS j,
             (CAST(1 AS BIGINT) << CAST(la AS INT)) - 1 AS vp,
             CAST(0 AS BIGINT) AS vn, la AS score
      FROM edp WHERE la > 0
      UNION ALL
      SELECT ia, ib, sa, sb, la, lb, jn AS j,
             ((mh << 1) & msk) | (msk & ~(xv | ph2)) AS vp,
             ph2 & xv AS vn,
             score + CASE WHEN ((ph >> CAST(la - 1 AS INT)) & 1) = 1 THEN 1
                          WHEN ((mh >> CAST(la - 1 AS INT)) & 1) = 1 THEN -1 ELSE 0 END AS score
      FROM (
        SELECT *, (((ph << 1) | 1) & msk) AS ph2
        FROM (
          SELECT *, (vn | (msk & ~(xh | vp))) AS ph, (vp & xh) AS mh
          FROM (
            SELECT *, (eq | vn) AS xv,
                   ((xor((eq & vp) + vp, vp)) | eq) & msk AS xh
            FROM (
              SELECT *, {eq} AS eq
              FROM (
                SELECT ia, ib, sa, sb, la, lb, j + 1 AS jn, vp, vn, score,
                       (CAST(1 AS BIGINT) << CAST(la AS INT)) - 1 AS msk
                FROM ed WHERE j < lb
              )
            )
          )
        )
      )
    ),
    edd AS (
      SELECT ia, ib, score AS d FROM ed WHERE j = lb AND la > 0
      UNION ALL
      SELECT ia, ib, lb AS d FROM edp WHERE la = 0
    )"""


# r13: driver slot folded into llm_dedup_join_suite's 'xlink' leg; the
# builder stays importable and its oracle rides that suite.
_XCORPUS_LINKAGE_ORACLE = f"""
    WITH jt AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id,
               CASE WHEN len(t) >= 3
                    THEN list_transform(range(1, len(t) - 1),
                                        i -> array_to_string(t[i:i+2], ' '))
                    ELSE [array_to_string(t, ' ')] END AS gs
        FROM (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN ['']
                      ELSE string_split_regex(trim(text), '[ \\t\\n\\r\\f]+') END AS t
          FROM documents
        )
      ), unnest(gs) AS u(sh)
    ),
    jl AS (SELECT * FROM jt WHERE doc_id % 2 = 0),
    jr AS (SELECT * FROM jt WHERE doc_id % 2 = 1),
    szl AS (SELECT doc_id, count(*) AS s FROM jl GROUP BY doc_id),
    szr AS (SELECT doc_id, count(*) AS s FROM jr GROUP BY doc_id),
    jint AS (
      SELECT l.doc_id AS id_left, r.doc_id AS id_right, count(*) AS inter
      FROM jl l JOIN jr r ON l.sh = r.sh
      GROUP BY l.doc_id, r.doc_id
    )
    SELECT CAST(id_left AS BIGINT) AS id_left, CAST(id_right AS BIGINT) AS id_right,
           CAST(jm AS BIGINT) AS jaccard_micro
    FROM (
      SELECT id_left, id_right,
             {sql_fmicro("inter / CAST(sl.s + sr.s - inter AS DOUBLE)")} AS jm
      FROM jint JOIN szl sl ON sl.doc_id = jint.id_left
                JOIN szr sr ON sr.doc_id = jint.id_right
    ) WHERE jm >= 500000
    """


@query(
    "llm_dedup_join_suite",
    oracle=f"""
    WITH RECURSIVE {_REP_DOCS_CTE},
    {_SPAN_CTES},
    {_myers_editdist_ctes(3, 12)}
    SELECT CAST('decontam' AS VARCHAR) AS leg, CAST(doc_id AS BIGINT) AS key,
           CAST(NULL AS VARCHAR) AS s1, CAST(1 AS BIGINT) AS i1,
           CAST(NULL AS BIGINT) AS i2
    FROM documents WHERE doc_id % 50 = 0
    UNION ALL
    SELECT CAST('bloomdtm' AS VARCHAR), CAST(doc_id AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(1 AS BIGINT), CAST(NULL AS BIGINT)
    FROM documents WHERE doc_id % 50 = 0
    UNION ALL
    SELECT CAST('boilerplate' AS VARCHAR), CAST(r.doc_id AS BIGINT),
           CAST(r.cleaned AS VARCHAR), CAST(r.n_kept AS BIGINT), CAST(NULL AS BIGINT)
    FROM (
      WITH base AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
      ln AS (SELECT doc_id, unnest(ls) AS line, generate_subscripts(ls, 1) AS pos
             FROM base),
      boiler AS (SELECT line FROM ln GROUP BY line HAVING count(DISTINCT doc_id) >= 2),
      kept AS (SELECT * FROM ln WHERE line NOT IN (SELECT line FROM boiler))
      SELECT d.doc_id,
             coalesce(string_agg(k.line, chr(10) ORDER BY k.pos), '') AS cleaned,
             count(k.line) AS n_kept
      FROM documents d LEFT JOIN kept k ON d.doc_id = k.doc_id
      GROUP BY d.doc_id
    ) r
    UNION ALL
    SELECT CAST('dupspans' AS VARCHAR), CAST(rd.doc_id AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(len(rd.toks) AS BIGINT), CAST(coalesce(spc.ndup, 0) AS BIGINT)
    FROM rep_docs rd LEFT JOIN spc ON rd.doc_id = spc.doc_id
    UNION ALL
    SELECT CAST('semdedup' AS VARCHAR), CAST(vec_id AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(1 AS BIGINT), CAST(1 AS BIGINT)
    FROM embeddings
    WHERE list_sum(list_transform(embedding, x -> CAST(x*x AS DOUBLE))) > 0
    UNION ALL
    SELECT CAST('jacjoin' AS VARCHAR), CAST(jp.ia AS BIGINT), CAST(jp.ib AS VARCHAR),
           CAST(jp.jm AS BIGINT), CAST(NULL AS BIGINT)
    FROM (
      WITH jsh AS (
        SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id,
                 CASE WHEN len(toks) >= 3
                      THEN list_transform(range(1, len(toks) - 1),
                                          i -> array_to_string(toks[i:i+2], ' '))
                      ELSE [array_to_string(toks, ' ')] END AS gs
          FROM rep_docs
        ), unnest(gs) AS u(sh)
      ),
      jsz AS (SELECT doc_id, count(*) AS s FROM jsh GROUP BY doc_id),
      jint AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
        FROM jsh a JOIN jsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
      )
      SELECT ia, ib,
             {sql_fmicro("inter / CAST(sa.s + sb.s - inter AS DOUBLE)")} AS jm
      FROM jint JOIN jsz sa ON sa.doc_id = jint.ia JOIN jsz sb ON sb.doc_id = jint.ib
    ) jp WHERE jp.jm >= 500000
    UNION ALL
    SELECT CAST('editdist' AS VARCHAR), CAST(p.ia AS BIGINT), CAST(p.ib AS VARCHAR),
           CAST(p.d AS BIGINT), CAST(NULL AS BIGINT)
    FROM edd p WHERE p.d <= 3
    UNION ALL
    SELECT CAST('xlink' AS VARCHAR), CAST(x.id_left AS BIGINT),
           CAST(x.id_right AS VARCHAR), CAST(x.jaccard_micro AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM ({_XCORPUS_LINKAGE_ORACLE}) x
    UNION ALL
    {canary_sql(_SUITE_COLS)}
    """,
)
def llm_dedup_join_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup/similarity-join legs (7 components + canary; r6
    de-concentration of llm_library_suite, +1 in r7):

    'decontam' — planted-leak invariant for decontaminate: an 8-token
    marker ngram (absent from the corpus) is appended to every doc with
    doc_id % 50 == 0 and used as the benchmark set; exactly those docs
    must be flagged, each with exactly one contaminated shingle.

    'bloomdtm' (r7) — the same invariant through decontaminate_bloom
    with the exact-verify stage: the Bloom-prefiltered path is lossless
    vs decontaminate() by construction, so it must produce the identical
    flag set (k broadcast word-table probes, all codegen).

    'boilerplate' — remove_boilerplate_lines value check: cleaned text
    and surviving line count per document, byte-for-byte vs the SQL
    recomputation.

    'dupspans' — duplicate_span_stats (exact-substring dedup, Lee et al.
    2021 shape): per-doc token counts and token positions covered by any
    corpus-duplicated 8-gram.

    'semdedup' — planted-copy invariant for semantic_dedup (SemDeDup):
    an exact copy of every nonzero embedding is planted at id + 1e6;
    the original must be kept and the copy dropped for EVERY vector.

    'jacjoin' — jaccard_join_prefix (exact All-Pairs prefix-filtered
    similarity join): the oracle computes the FULL brute-force 3-gram
    Jaccard pair set at threshold 0.5 — a missed pair (lost prefix
    completeness) or an extra pair fails the hash; values in floor-based
    integer micro-units (>= 500000 restates the 6dp >= 0.5 filter
    exactly: 0.5 converts to the same double in both engines).

    'editdist' — edit_distance_join: every pair of 12-char document
    prefixes within 3 edits from the lossless q-gram + length-window
    candidate union; the oracle brute-forces all pairs with a
    from-scratch Myers/Hyyro bit-parallel DP (see
    :func:`_myers_editdist_ctes`) — NO levenshtein builtin.
    """
    from ..operators.dedup import (
        build_shingle_bloom,
        decontaminate_bloom,
        duplicate_span_stats,
        jaccard_join_prefix,
        remove_boilerplate_lines,
        semantic_dedup,
    )
    from ..operators.linkage import edit_distance_join

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    planted = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 50 == 0,
            F.concat_ws(" ", F.col("text"), F.lit(_LEAK_8GRAM)),
        ).otherwise(F.col("text")).alias("text"),
    )
    benchmark = local_table(spark, [(_LEAK_8GRAM,)], "text string")
    decontam_leg = decontaminate(planted, benchmark, shingle_n=8).select(
        F.lit("decontam").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.col("n_contaminated_shingles").cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    # r7: the Bloom-prefiltered path must reproduce decontaminate()
    # EXACTLY (verify stage; Bloom has no false negatives) — same oracle
    # rows as 'decontam'. n_items sizes the filter without a count job.
    bloom = build_shingle_bloom(benchmark, shingle_n=8, fpp=0.05, n_items=8)
    bloomdtm_leg = decontaminate_bloom(planted, bloom, benchmark=benchmark).select(
        F.lit("bloomdtm").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.col("n_contaminated_shingles").cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    boiler_leg = remove_boilerplate_lines(d).select(
        F.lit("boilerplate").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.col("text").cast("string").alias("s1"),
        F.col("n_kept_lines").cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    dupspan_leg = duplicate_span_stats(d, span_n=8).select(
        F.lit("dupspans").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.lit(None).cast("string").alias("s1"),
        F.col("n_tokens").cast("long").alias("i1"),
        F.col("n_dup_tokens").cast("long").alias("i2"),
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    norm2 = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    eligible = e.filter(norm2 > 0)
    sd = semantic_dedup(
        eligible.unionByName(
            eligible.select((F.col("vec_id") + F.lit(1000000)).alias("vec_id"), "embedding")
        ),
        threshold=0.95,
    )
    flags = sd.select("vec_id", F.col("keep").cast("long").alias("k"))
    semdedup_leg = (
        flags.filter(F.col("vec_id") < 1000000)
        .join(
            flags.filter(F.col("vec_id") >= 1000000).select(
                (F.col("vec_id") - 1000000).alias("vec_id"),
                (F.lit(1) - F.col("k")).cast("long").alias("dropped"),
            ),
            "vec_id",
        )
        .select(
            F.lit("semdedup").alias("leg"),
            F.col("vec_id").cast("long").alias("key"),
            F.lit(None).cast("string").alias("s1"),
            F.col("k").cast("long").alias("i1"),
            F.col("dropped").cast("long").alias("i2"),
        )
    )

    # string-shingle mode: heavier shuffles than the production xxhash64
    # path, but zero collision surface and every value SQL-restatable —
    # the oracle recomputes the FULL exact pair set by brute force
    jac_leg = jaccard_join_prefix(d, threshold=0.5, hash_shingles=False).select(
        F.lit("jacjoin").alias("leg"),
        F.col("id_a").cast("long").alias("key"),
        F.col("id_b").cast("string").alias("s1"),
        fmicro_col(F.col("jaccard")).alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    # 12-char document prefixes as the "name" column: short strings with
    # heavy overlap — both candidate paths (q-gram AND length-window)
    # exercise
    ed_names = d.select("doc_id", F.substring("text", 1, 12).alias("name"))
    editdist_leg = edit_distance_join(ed_names, k=3).select(
        F.lit("editdist").alias("leg"),
        F.col("id_a").cast("long").alias("key"),
        F.col("id_b").cast("string").alias("s1"),
        F.col("distance").cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    # r13 fold: cross-corpus linkage (even half vs odd half, exact
    # prefix-filtered Jaccard join at threshold 0.5) rides as a leg —
    # the oracle's full brute-force R x S pair set is unchanged.
    xlink_leg = dedup_crosscorpus_linkage(spark, sf_dir).select(
        F.lit("xlink").alias("leg"),
        F.col("id_left").cast("long").alias("key"),
        F.col("id_right").cast("string").alias("s1"),
        F.col("jaccard_micro").cast("long").alias("i1"),
        F.lit(None).cast("long").alias("i2"),
    )

    return (
        decontam_leg.unionByName(bloomdtm_leg)
        .unionByName(boiler_leg)
        .unionByName(dupspan_leg)
        .unionByName(semdedup_leg)
        .unionByName(jac_leg)
        .unionByName(editdist_leg)
        .unionByName(xlink_leg)
        .unionByName(canary_df(spark, _SUITE_COLS))
    )


# ---------------------------------------------------------------------------
# Folded family suites (r6: frees driver slots for the thematic suites and
# the promoted pytest-only proofs — VERDICT r5 item 2)
# ---------------------------------------------------------------------------


# r13 wave 2: driver slot folded into text_profile_suite (below);
# builder stays importable, oracle rides the fold.
_TIF_ORACLE = """
    WITH t AS (
      SELECT doc_id, lang AS labeled, text,
             list_distinct(string_split_regex(lower(text), '[ \\t\\n\\r\\f]+')) AS ltoks
      FROM documents
    ), scores AS (
      SELECT doc_id, labeled, text,
             [{'hits': len(list_intersect(ltoks, ['the','and','of','is','with'])), 'lang': 'en'},
              {'hits': len(list_intersect(ltoks, ['der','die','und','ist','nicht'])), 'lang': 'de'},
              {'hits': len(list_intersect(ltoks, ['el','la','que','de','es'])), 'lang': 'es'},
              {'hits': len(list_intersect(ltoks, ['le','la','et','est','les'])), 'lang': 'fr'}] AS sc
      FROM t
    ), pred AS (
      SELECT doc_id, labeled,
             CASE WHEN regexp_matches(text, '[一-鿿぀-ヿ]') THEN 'zh'
                  WHEN list_max(sc).hits > 0 THEN list_max(sc).lang
                  ELSE 'und' END AS predicted
      FROM scores
    ), fp AS (
      SELECT doc_id,
             list_min(list_transform(range(0, greatest(len(wt) - 8, 0) + 1),
                      i -> substr(md5(array_to_string(wt[i+1:i+8], ' ')), 1, 16))) AS fingerprint
      FROM (SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\r\\f]+') AS wt FROM documents)
    )
    SELECT CAST(p.doc_id AS BIGINT) AS doc_id, CAST(p.labeled AS VARCHAR) AS labeled,
           CAST(p.predicted AS VARCHAR) AS predicted,
           CAST(f.fingerprint AS VARCHAR) AS fingerprint
    FROM pred p JOIN fp f ON p.doc_id = f.doc_id
    """


def text_id_fingerprint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID + document fingerprinting in one driver row (r6 fold
    of the r1 slots text_lang_id + text_fingerprints — both green every
    round; a JOIN on doc_id, so no union type inference exists to skew):
    the marker-hit argmax + CJK script check, and the winnowing-style
    rolling-hash fingerprint (portable md5 variant so the VALUES are
    oracle-checked; the in-engine default is the cheaper xxhash64
    ``rolling_fingerprint``)."""
    lang = text_lang_id(spark, sf_dir)
    fp = text_fingerprints(spark, sf_dir)
    return (
        lang.join(fp, "doc_id")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("labeled").cast("string").alias("labeled"),
            F.col("predicted").cast("string").alias("predicted"),
            F.col("fingerprint").cast("string").alias("fingerprint"),
        )
    )


_DEDUP_FAMILY_COLS = [
    ("key", "long"),
    ("key_b", "long"),
    ("s1", "string"),
    ("s2", "string"),
    ("i1", "long"),
]


@query(
    "dedup_exact_family_suite",
    oracle=f"""
    SELECT CAST('digest' AS VARCHAR) AS leg, CAST(min(doc_id) AS BIGINT) AS key,
           CAST(NULL AS BIGINT) AS key_b, CAST(md5(text) AS VARCHAR) AS s1,
           CAST(NULL AS VARCHAR) AS s2, CAST(count(*) AS BIGINT) AS i1
    FROM documents
    GROUP BY md5(text)
    UNION ALL
    SELECT CAST('survivor' AS VARCHAR), CAST(doc_id AS BIGINT), CAST(NULL AS BIGINT),
           CAST(lang AS VARCHAR), CAST(source AS VARCHAR), CAST(NULL AS BIGINT)
    FROM documents
    WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
    UNION ALL
    SELECT CAST('jaccard' AS VARCHAR), CAST(j.id_a AS BIGINT), CAST(j.id_b AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(j.jm AS BIGINT)
    FROM (
      WITH sh AS (
        SELECT doc_id, unnest(list_distinct(sh_list)) AS shingle
        FROM (
          SELECT doc_id,
                 CASE WHEN len(t) >= 3
                      THEN list_transform(range(1, len(t) - 1),
                                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                      ELSE [array_to_string(t, ' ')] END AS sh_list
          FROM (SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\r\\f]+') AS t FROM documents)
        )
      ), sizes AS (
        SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
      ), shf AS (
        -- the operator's max_shingle_freq=10000 guard: capped posting
        -- lists drop WHOLE before pairing (r12 review parity fix)
        SELECT sh.doc_id, sh.shingle FROM sh
        JOIN (SELECT shingle FROM sh GROUP BY shingle
              HAVING count(*) <= 10000) f USING (shingle)
      ), common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      SELECT id_a, id_b,
             {sql_fmicro("CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)")} AS jm
      FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
    ) j WHERE j.jm >= 200000
    UNION ALL
    {canary_sql(_DEDUP_FAMILY_COLS)}
    """,
)
def dedup_exact_family_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup family in one driver row (r6 fold of the r1 slots
    dedup_exact_digest + dedup_survivors + dedup_ngram_jaccard — all
    green every round):

    'digest' — exact dedup digest-groupBy: lowest-id survivor + copy
    count per distinct text.

    'survivor' — drop_exact_duplicates surviving full rows (the operator
    a training-data pipeline actually applies).

    'jaccard' — exact 3-gram Jaccard pairs >= 0.2 via inverted-index
    join (no cross join), values in floor-based integer micro-units
    (>= 200000 restates the 6dp >= 0.2 filter exactly).
    """
    from ..operators.dedup import drop_exact_duplicates

    d = load_table(spark, sf_dir, "documents")
    digest_leg = dedup_exact(d).select(
        F.lit("digest").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.lit(None).cast("long").alias("key_b"),
        F.col("digest").cast("string").alias("s1"),
        F.lit(None).cast("string").alias("s2"),
        F.col("n_copies").cast("long").alias("i1"),
    )
    survivor_leg = drop_exact_duplicates(d).select(
        F.lit("survivor").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.lit(None).cast("long").alias("key_b"),
        F.col("lang").cast("string").alias("s1"),
        F.col("source").cast("string").alias("s2"),
        F.lit(None).cast("long").alias("i1"),
    )
    jac_leg = ngram_jaccard_pairs(d, threshold=0.2).select(
        F.lit("jaccard").alias("leg"),
        F.col("id_a").cast("long").alias("key"),
        F.col("id_b").cast("long").alias("key_b"),
        F.lit(None).cast("string").alias("s1"),
        F.lit(None).cast("string").alias("s2"),
        fmicro_col(F.col("jaccard")).alias("i1"),
    )
    return (
        digest_leg.unionByName(survivor_leg)
        .unionByName(jac_leg)
        .unionByName(canary_df(spark, _DEDUP_FAMILY_COLS))
    )


@query(
    "multimodal_suite",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(md5(text) AS VARCHAR) AS checksum,
           CAST((octet_length(encode(text)) % 64) + 1 AS INT) AS width,
           CAST(((octet_length(encode(text)) * 7) % 64) + 1 AS INT) AS height,
           CAST(3 AS INT) AS n_channels
    FROM documents
    """,
)
def multimodal_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing in one driver row (r6 fold of
    multimodal_asset_meta + multimodal_image_features — both green every
    round; a JOIN on doc_id): binary asset column + typed metadata
    struct, and the mapInPandas decode path with the deterministic stub
    decoder (the oracle mirrors the stub's arithmetic, so the Arrow
    batch path, schema, and row alignment are all hash-checked; the
    PIL-guarded REAL codecs stay pinned by test_multimodal.py)."""
    meta = multimodal_asset_meta(spark, sf_dir)
    feats = multimodal_image_features(spark, sf_dir)
    return meta.join(feats, "doc_id").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("checksum").cast("string").alias("checksum"),
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("n_channels").cast("int").alias("n_channels"),
    )


# ---------------------------------------------------------------------------
# Suite: the kNN family (brute-force values + lsh/ivf/ivfpq/persisted gates)
# ---------------------------------------------------------------------------

_KNN_COLS = [("key", "long"), ("key_b", "long"), ("i1", "long"), ("i2", "long")]


@query(
    "similarity_knn_suite",
    oracle=f"""
    WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {sql_fmicro("list_dot_product(q.embedding, c.embedding) / (sqrt(list_dot_product(q.embedding, q.embedding)) * sqrt(list_dot_product(c.embedding, c.embedding)))")} AS simm
      FROM c, q
      WHERE c.vec_id != q.vec_id
    ), ranked AS (
      SELECT query_id, neighbor_id, simm,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY simm DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    )
    SELECT CAST('brute' AS VARCHAR) AS leg, CAST(query_id AS BIGINT) AS key,
           CAST(neighbor_id AS BIGINT) AS key_b, CAST(simm AS BIGINT) AS i1,
           CAST(rank AS BIGINT) AS i2
    FROM ranked WHERE rank <= 5
    UNION ALL
    SELECT CAST('lsh' AS VARCHAR), CAST(vec_id AS BIGINT), CAST(NULL AS BIGINT),
           CAST(5 AS BIGINT), CAST(1 AS BIGINT)
    FROM embeddings WHERE vec_id < 10
    UNION ALL
    SELECT CAST('ivf' AS VARCHAR), CAST(vec_id AS BIGINT), CAST(NULL AS BIGINT),
           CAST(5 AS BIGINT), CAST(1 AS BIGINT)
    FROM embeddings WHERE vec_id < 10
    UNION ALL
    SELECT CAST('ivfpq' AS VARCHAR), CAST(vec_id AS BIGINT), CAST(NULL AS BIGINT),
           CAST(5 AS BIGINT), CAST(1 AS BIGINT)
    FROM embeddings WHERE vec_id < 10
    UNION ALL
    SELECT CAST('persisted' AS VARCHAR), CAST(vec_id AS BIGINT), CAST(NULL AS BIGINT),
           CAST(5 AS BIGINT), CAST(1 AS BIGINT)
    FROM embeddings WHERE vec_id < 10
    UNION ALL
    {canary_sql(_KNN_COLS)}
    """,
)
def similarity_knn_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole kNN family in one driver row (r6 fold of
    similarity_knn_bruteforce + _lsh_recall + _ivf_recall, PLUS the r5
    pytest-only persisted-index path promoted to a driver gate —
    VERDICT r5 item 6):

    'brute' — exact cosine top-5 for query vectors vec_id < 10
    (broadcast queries, JVM-side dot products, per-query top-k), full
    VALUES in floor-based integer micro-units.

    'lsh' — random-hyperplane LSH top-5 gated per query against the
    brute-force top-5 computed in the same plan: full k results, recall
    >= 0.4 (4 planes x 8 tables on the driver's near-uniform synthetic
    embeddings — see the r5 slot docstring for the floor rationale).

    'ivf' / 'ivfpq' — IVF (sampled-kmeans coarse quantizer, exact rerank
    inside probed lists) and residual-coded IVF-PQ (ADC shortlist, exact
    rerank): per-query recall >= 0.8. r14: parameters are SCALE-AWARE —
    ``ivf_scale_params(count, geometry="uniform")`` sizes
    n_clusters/n_probe/rerank_k by the sqrt(N) rule (2*isqrt(N) lists),
    so the SAME gate holds at sf0.01 (N=500 -> 44/33/96) and sf0.1
    (N=2000 -> 88/66/200) — the r13 sweep showed the previous fixed
    16/12/96 failing 3/10 queries at sf0.1. The EXPLICIT
    geometry="uniform" (r15) is this table's documented property, not a
    default: the driver embeddings are i.i.d. near-uniform — the
    no-structure adversarial case where dense probing (0.75 of lists,
    rerank N/10) is irreducible and constant-probe recall measurably
    collapses (min 0.2 on tools/ann_decade.py's control). Real clustered
    embeddings take the library DEFAULT geometry="clustered" — constant
    probed lists, rerank ~ 4.5*sqrt(N), measured O(sqrt N) per-query
    candidate mass at recall 1.0 across the 5k -> 50k decade (SCALE.md).
    Deterministic: the count is exact, the kmeans sample and seeds are
    fixed, ranking tie-breaks on ids.

    'persisted' — build_ivfpq_index + knn_ivf_pq_from_index: the index
    is built ONCE to a scratch directory (PARTITIONED BY coarse list —
    the build-once/query-many 100 TB serving pattern), then queried with
    the same scale-aware params as 'ivfpq' and gated at the same floor;
    pytest pins bit-exact equality of the two paths, this leg makes the
    driver see it. The gate result is collect-materialized so the
    scratch index can be deleted before the driver collects.
    """
    import shutil
    import tempfile
    from pathlib import Path

    from ..operators.similarity import (
        build_ivfpq_index,
        ivf_scale_params,
        knn_ivf,
        knn_ivf_pq,
        knn_ivf_pq_from_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n_clusters, n_probe, rerank_k = ivf_scale_params(
        emb.count(), geometry="uniform"
    )
    q = emb.filter(F.col("vec_id") < 10)
    exact = knn_bruteforce(emb, q, k=5)

    brute_leg = exact.select(
        F.lit("brute").alias("leg"),
        F.col("query_id").cast("long").alias("key"),
        F.col("neighbor_id").cast("long").alias("key_b"),
        fmicro_col(F.col("sim")).alias("i1"),
        F.col("rank").cast("long").alias("i2"),
    )

    def gate_leg(approx: DataFrame, leg: str, floor: float) -> DataFrame:
        return _knn_recall_gate(q, exact, approx, k=5, floor=floor).select(
            F.lit(leg).alias("leg"),
            F.col("query_id").cast("long").alias("key"),
            F.lit(None).cast("long").alias("key_b"),
            F.col("n_results").cast("long").alias("i1"),
            F.col("recall_ok").cast("long").alias("i2"),
        )

    # coarse_metric="l2" is this table's documented property alongside
    # geometry="uniform" (r16): the fixture is near-uniform (no blob
    # structure, so no centroid norm bias for the spherical default to
    # fix) and these per-query 0.8 floors were proven on the Euclidean
    # partition — real clustered embeddings take the library default
    # coarse_metric="cosine" (see _kmeans_numpy / SCALE.md R16).
    lsh_leg = gate_leg(knn_lsh(emb, q, k=5, n_planes=4, n_tables=8), "lsh", 0.4)
    ivf_leg = gate_leg(
        knn_ivf(
            emb, q, k=5, n_clusters=n_clusters, n_probe=n_probe,
            coarse_metric="l2",
        ),
        "ivf",
        0.8,
    )
    ivfpq_leg = gate_leg(
        knn_ivf_pq(
            emb, q, k=5, n_clusters=n_clusters, n_probe=n_probe,
            ks=64, rerank_k=rerank_k, coarse_metric="l2",
        ),
        "ivfpq",
        0.8,
    )

    scratch_root = Path(__file__).resolve().parents[2] / ".scratch"
    scratch_root.mkdir(exist_ok=True)
    idx_dir = tempfile.mkdtemp(prefix="knn_idx_", dir=scratch_root)
    try:
        build_ivfpq_index(
            emb, idx_dir, n_clusters=n_clusters, m=8, ks=64,
            coarse_metric="l2",
        )
        pers = knn_ivf_pq_from_index(
            q, emb, idx_dir, k=5, n_probe=n_probe, rerank_k=rerank_k
        )
        # materialize the tiny gate result (10 rows) BEFORE deleting the
        # index files — the lazy plan would otherwise re-read them at
        # driver collect time. collect + local re-create, NOT
        # localCheckpoint: checkpoint blocks would stay pinned in executor
        # storage for the session (the no-cached-blocks standard).
        gate_rows = gate_leg(pers, "persisted", 0.8).collect()
        pers_leg = local_table(spark,
            gate_rows, "leg string, key long, key_b long, i1 long, i2 long"
        )
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    return (
        brute_leg.unionByName(lsh_leg)
        .unionByName(ivf_leg)
        .unionByName(ivfpq_leg)
        .unionByName(pers_leg)
        .unionByName(canary_df(spark, _KNN_COLS))
    )


# ---------------------------------------------------------------------------
# Promoted driver slots (VERDICT r5 item 6)
# ---------------------------------------------------------------------------




def dedup_crosscorpus_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus record linkage (jaccard_join_tables, the R x S form
    of the exact prefix-filtered Jaccard join — promoted from
    pytest-only proof to a driver value gate, VERDICT r5 item 6): the
    even-doc_id half of the corpus linked against the odd half at
    threshold 0.5 in string-shingle mode (zero collision surface, every
    value SQL-restatable). The oracle computes the FULL brute-force
    R x S 3-gram Jaccard pair set — a missed pair (lost prefix
    completeness across the union rarity order) or an extra pair fails
    the hash. The prefix theorem needs ONE total order both sides'
    prefixes restrict; pairs are generated only ACROSS sides (no
    within-side candidate ever materializes)."""
    from ..operators.dedup import jaccard_join_tables

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    left = d.filter(F.col("doc_id") % 2 == 0)
    right = d.filter(F.col("doc_id") % 2 == 1)
    out = jaccard_join_tables(left, right, threshold=0.5, hash_shingles=False)
    return out.select(
        F.col("id_left").cast("long").alias("id_left"),
        F.col("id_right").cast("long").alias("id_right"),
        fmicro_col(F.col("jaccard")).alias("jaccard_micro"),
    )


# r13: driver slot folded into profile_agg_suite (catalog/relational.py);
# the builder stays importable and its oracle rides the folded suite.
_PROFILE_COLS_ORACLE = """
    SELECT CAST('event_id' AS VARCHAR) AS col_name,
           CAST((SELECT count(*) FROM events) AS BIGINT) AS n_rows,
           CAST((SELECT count(*) FROM events WHERE event_id IS NULL) AS BIGINT) AS n_nulls,
           CAST((SELECT min(event_id) FROM events) AS VARCHAR) AS min_str,
           CAST((SELECT max(event_id) FROM events) AS VARCHAR) AS max_str,
           CAST(1 AS BIGINT) AS distinct_ok
    UNION ALL
    SELECT 'user_id',
           CAST((SELECT count(*) FROM events) AS BIGINT),
           CAST((SELECT count(*) FROM events WHERE user_id IS NULL) AS BIGINT),
           CAST((SELECT min(user_id) FROM events) AS VARCHAR),
           CAST((SELECT max(user_id) FROM events) AS VARCHAR),
           CAST(1 AS BIGINT)
    UNION ALL
    SELECT 'event_type',
           CAST((SELECT count(*) FROM events) AS BIGINT),
           CAST((SELECT count(*) FROM events WHERE event_type IS NULL) AS BIGINT),
           CAST((SELECT min(event_type) FROM events) AS VARCHAR),
           CAST((SELECT max(event_type) FROM events) AS VARCHAR),
           CAST(1 AS BIGINT)
    """


def data_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """profile_columns promoted from pytest-only proof to a driver gate
    (VERDICT r5 item 6): the ONE-aggregate-pass per-column profile
    (nulls, HLL-approximate distincts, min/max-as-string) over the
    events table's int/string columns (min/max string rendering of
    BIGINT and VARCHAR is engine-identical; DOUBLE/TIMESTAMP rendering
    is not, so those columns stay pytest-gated). The HLL distinct count
    is engine-specific, so the driver-checkable claim is the tolerance
    gate: within 15% (3 sigma of HLL++'s default rsd = 0.05 — holds at
    every scale factor, r13; identical gated value at the driver scale)
    of the exact per-column distinct count computed in the same plan
    (the approx_aggregates precedent)."""
    from ..operators.expectations import profile_columns

    cols = ["event_id", "user_id", "event_type"]
    ev = load_table(spark, sf_dir, "events").select(*cols)
    prof = profile_columns(ev, cols)
    exact = ev.agg(
        *[F.countDistinct(c).alias(f"_x_{i}") for i, c in enumerate(cols)]
    ).select(
        F.expr(
            "stack(3, "
            + ", ".join(f"'{c}', _x_{i}" for i, c in enumerate(cols))
            + ") AS (col_name, n_distinct_exact)"
        )
    )
    return (
        prof.withColumnRenamed("column", "col_name")
        .join(exact, "col_name")
        .select(
            F.col("col_name").cast("string").alias("col_name"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_nulls").cast("long").alias("n_nulls"),
            F.col("min").cast("string").alias("min_str"),
            F.col("max").cast("string").alias("max_str"),
            (
                F.abs(F.col("n_distinct_approx") - F.col("n_distinct_exact"))
                / F.col("n_distinct_exact")
                <= 0.15
            ).cast("long").alias("distinct_ok"),
        )
    )


# ---------------------------------------------------------------------------
# r13 wave 2: ONE text-profiling driver slot — token stats, quality/
# Gopher/PII features, subword token counts, and lang-id + fingerprint
# ride as tagged legs of a wide superset; all four single oracles are
# wrapped unchanged (three live in catalog/llm.py, one above).
# ---------------------------------------------------------------------------

_TP_CANARY = [
    ("canary", 1, "plain", "", None, -1, 9007199254740993, None, 0, 7, -7,
     1.5, None, -2.25, 0.0, 0.125, None, 64.0),
    ("canary", None, None, "Ünïcode-✓", "5.0", 9223372036854775807, 0, 3,
     None, -1, 2, None, 0.5, 1.0, None, -16.0, 0.0625, None),
    ("canary", -4611686018427387904, "x", None, "y", None, 5, -3, 11, None,
     0, 2.5, -8.0, None, 3.5, None, 10.0, 0.25),
]


def _tp_canary_sql() -> str:
    return typed_canary_sql(_TP_CANARY, ["VARCHAR", "BIGINT"] + ["VARCHAR"] * 3 + ["BIGINT"] * 6 + ["DOUBLE"] * 7, ["leg", "key", "s1", "s2", "s3"] + [f"i{j}" for j in range(1, 7)] + [f"d{j}" for j in range(1, 8)])


def _text_profile_oracle() -> str:
    from .llm import _BPE_COUNTS_ORACLE, _QUALITY_ORACLE, _TOKEN_STATS_ORACLE

    ns = "CAST(NULL AS VARCHAR)"
    nl = "CAST(NULL AS BIGINT)"
    nd = "CAST(NULL AS DOUBLE)"
    return f"""
    SELECT CAST('tok' AS VARCHAR) AS leg, CAST(doc_id AS BIGINT) AS key,
           CAST(lang AS VARCHAR) AS s1, {ns} AS s2, {ns} AS s3,
           CAST(n_tokens AS BIGINT) AS i1, CAST(n_distinct AS BIGINT) AS i2,
           {nl} AS i3, {nl} AS i4, {nl} AS i5, {nl} AS i6,
           CAST(distinct_ratio AS DOUBLE) AS d1,
           CAST(avg_tok_len AS DOUBLE) AS d2,
           CAST(stop_ratio AS DOUBLE) AS d3,
           {nd} AS d4, {nd} AS d5, {nd} AS d6, {nd} AS d7
    FROM ({_TOKEN_STATS_ORACLE})
    UNION ALL
    SELECT CAST('qual' AS VARCHAR), CAST(doc_id AS BIGINT),
           CAST(text_redacted AS VARCHAR), {ns}, {ns},
           CAST(has_email AS BIGINT), CAST(has_phone AS BIGINT),
           CAST(has_ipv4 AS BIGINT), CAST(n_words AS BIGINT),
           CAST(gopher_stop_hits AS BIGINT), CAST(gopher_pass AS BIGINT),
           CAST(quality AS DOUBLE), CAST(rep_3gram AS DOUBLE),
           CAST(mean_word_len AS DOUBLE), CAST(symbol_word_ratio AS DOUBLE),
           CAST(bullet_line_ratio AS DOUBLE),
           CAST(ellipsis_line_ratio AS DOUBLE),
           CAST(alpha_word_ratio AS DOUBLE)
    FROM ({_QUALITY_ORACLE})
    UNION ALL
    SELECT CAST('bpe' AS VARCHAR), CAST(doc_id AS BIGINT),
           {ns}, {ns}, {ns},
           CAST(n_bpe_tokens AS BIGINT), CAST(bpe_char_mass AS BIGINT),
           CAST(bpe_word_marks AS BIGINT), {nl}, {nl}, {nl},
           {nd}, {nd}, {nd}, {nd}, {nd}, {nd}, {nd}
    FROM ({_BPE_COUNTS_ORACLE})
    UNION ALL
    SELECT CAST('fp' AS VARCHAR), CAST(doc_id AS BIGINT),
           CAST(labeled AS VARCHAR), CAST(predicted AS VARCHAR),
           CAST(fingerprint AS VARCHAR),
           {nl}, {nl}, {nl}, {nl}, {nl}, {nl},
           {nd}, {nd}, {nd}, {nd}, {nd}, {nd}, {nd}
    FROM ({_TIF_ORACLE})
    UNION ALL
    {_tp_canary_sql()}
    """


@query("text_profile_suite", oracle=_text_profile_oracle())
def text_profile_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document text-profiling surface in one driver slot (r13
    fold of four formerly-standalone gates):

    'tok'  — text_token_stats: token counts + lexical stats;
    'qual' — text_quality_scores: composite quality, trigram repetition,
             PII flags + the redaction transform, the full Gopher rule
             set (Rae et al. 2021 App. A1.1);
    'bpe'  — text_bpe_token_counts: subword token counts (regex-BPE
             pre-tokenizer twin + word-mark arithmetic);
    'fp'   — text_id_fingerprint_suite: script/stopword lang-id and the
             portable min-of-window rolling md5 fingerprint;
    'canary' — constant rows stated identically by both engines.

    Every column remains a codegen expression recomputed exactly by the
    wrapped single oracles; one documents scan per leg, no Python."""
    from .llm import text_bpe_token_counts, text_quality_scores, text_token_stats

    nul = F.lit(None).cast("long")
    nus = F.lit(None).cast("string")
    nud = F.lit(None).cast("double")
    tok = text_token_stats(spark, sf_dir).select(
        F.lit("tok").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.col("lang").cast("string").alias("s1"),
        nus.alias("s2"), nus.alias("s3"),
        F.col("n_tokens").cast("long").alias("i1"),
        F.col("n_distinct").cast("long").alias("i2"),
        nul.alias("i3"), nul.alias("i4"), nul.alias("i5"), nul.alias("i6"),
        F.col("distinct_ratio").cast("double").alias("d1"),
        F.col("avg_tok_len").cast("double").alias("d2"),
        F.col("stop_ratio").cast("double").alias("d3"),
        nud.alias("d4"), nud.alias("d5"), nud.alias("d6"), nud.alias("d7"),
    )
    qual = text_quality_scores(spark, sf_dir).select(
        F.lit("qual").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.col("text_redacted").cast("string").alias("s1"),
        nus.alias("s2"), nus.alias("s3"),
        F.col("has_email").cast("long").alias("i1"),
        F.col("has_phone").cast("long").alias("i2"),
        F.col("has_ipv4").cast("long").alias("i3"),
        F.col("n_words").cast("long").alias("i4"),
        F.col("gopher_stop_hits").cast("long").alias("i5"),
        F.col("gopher_pass").cast("long").alias("i6"),
        F.col("quality").cast("double").alias("d1"),
        F.col("rep_3gram").cast("double").alias("d2"),
        F.col("mean_word_len").cast("double").alias("d3"),
        F.col("symbol_word_ratio").cast("double").alias("d4"),
        F.col("bullet_line_ratio").cast("double").alias("d5"),
        F.col("ellipsis_line_ratio").cast("double").alias("d6"),
        F.col("alpha_word_ratio").cast("double").alias("d7"),
    )
    bpe = text_bpe_token_counts(spark, sf_dir).select(
        F.lit("bpe").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        nus.alias("s1"), nus.alias("s2"), nus.alias("s3"),
        F.col("n_bpe_tokens").cast("long").alias("i1"),
        F.col("bpe_char_mass").cast("long").alias("i2"),
        F.col("bpe_word_marks").cast("long").alias("i3"),
        nul.alias("i4"), nul.alias("i5"), nul.alias("i6"),
        *[nud.alias(f"d{j}") for j in range(1, 8)],
    )
    fp = text_id_fingerprint_suite(spark, sf_dir).select(
        F.lit("fp").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.col("labeled").cast("string").alias("s1"),
        F.col("predicted").cast("string").alias("s2"),
        F.col("fingerprint").cast("string").alias("s3"),
        *[nul.alias(f"i{j}") for j in range(1, 7)],
        *[nud.alias(f"d{j}") for j in range(1, 8)],
    )
    canary = local_table(spark,
        _TP_CANARY,
        "leg string, key long, s1 string, s2 string, s3 string, "
        "i1 long, i2 long, i3 long, i4 long, i5 long, i6 long, "
        "d1 double, d2 double, d3 double, d4 double, d5 double, "
        "d6 double, d7 double",
    )
    return (
        tok.unionByName(qual)
        .unionByName(bpe)
        .unionByName(fp)
        .unionByName(canary)
    )
