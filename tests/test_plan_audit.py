"""Catalog-wide physical-plan invariants (r6): the per-operator plan pins
scattered through the suite guard individual shapes; this enforces the
GLOBAL floors over every registered driver query at once, so a refactor
cannot silently regress a slot nobody's specific pin covers.

Plan-only (no execution): builds each query's executedPlan string at
sf0.001 and checks node inventories.
"""

from __future__ import annotations

import re

import pytest

from kafka_streams_task_spark.catalog import CATALOG

PY_STAGES = r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"

#: queries allowed a BroadcastNestedLoopJoin — every entry is a literal
#: crossJoin against a broadcast scalar/1-row relation (corpus stats,
#: recall-gate counters) or the range-band join's inequality condition;
#: none of these grows with the corpus on its non-broadcast side.
BNLJ_ALLOWED = {
    "llm_cdc_analytics_suite",  # r7 corpus leg: 1-row quantile-gate crossJoin
    # r12 fold: the three recall gates' 1-row (n_planted, n_missed)
    # counter crossJoins now live inside the folded suite
    "dedup_recall_suite",
    "sample_pack_pipeline",
    "llm_text_model_suite",
    "llm_retrieval_suite",
    "similarity_knn_suite",
    # r13 fold: the range-band inequality join's BNLJ now lives inside
    # relational_misc_suite's 'band' leg
    "relational_misc_suite",
    # r11 fold: regex_scalar_customer's scalar-subquery crossJoin and
    # q6_q19's 1x1-row crossJoin now live inside the two folded suites
    "tpch_qsuite",
    "scalar_regex_suite",
    # r10: classifier_eval's 1-row totals (n, n_pos) broadcast-crossJoined
    # onto the distinct-score table — the quantile-gate precedent (the
    # cls: legs of the r13 model_eval_suite fold)
    "model_eval_suite",
    # r10: corpus_drift / pmi collocation 1-row token/row totals
    # broadcast-crossJoined onto vocabulary/group/bigram tables (the
    # drift:/pmi legs of the r13 corpus_stats_suite fold)
    "corpus_stats_suite",
    # r14: quantile_sketch_suite — the 1-row total-count N crossJoined
    # onto the 7-row q relation, and the rank walk's cum >= rank
    # inequality join over the ~245-row bucket table (both sides bounded
    # by the bucket DOMAIN, never the corpus; the decontam recall gate's
    # BNLJ now rides dedup_recall_suite's 'decontam' leg). r15 grouped
    # legs add the same shapes per group: the |groups|-row totals
    # crossJoined onto the 3-row q relation and the per-group
    # (grp, cum >= rank) walk — still bounded by |groups| x domain x |qs|
    "quantile_sketch_suite",
    # r10: unimax_allocation's 1-row water-level aggregate
    # broadcast-crossJoined onto the group-cardinality table (the umx:
    # legs of the r13 mixing_policy_suite fold)
    "mixing_policy_suite",
    # r10 fourth wave: chi_square_contingency's 1-row grand-total
    # broadcast-crossJoined onto the contingency cells — the quantile-
    # gate precedent (the sa: leg of the r13 stats_family_suite fold)
    "stats_family_suite",
    # r11: unicode_token_suite's dedup leg crossJoins two 1-row pair
    # counters (segmented vs raw) — the quantile-gate precedent
    "unicode_token_suite",
    # r12: heavy_hitter_suite's guard leg crossJoins the 1-row kth-count
    # and 1-row total-token aggregates — the recall-gate precedent
    "heavy_hitter_suite",
    # r14: hll_distinct_suite's est legs crossJoin the 1-row exact
    # COUNT(DISTINCT) gate aggregate — the recall-gate precedent (the
    # r15 gest legs instead equi-join the |groups|-row per-group exact
    # table and add no BNLJ)
    "hll_distinct_suite",
    # r16: theta_sketch_suite's est legs crossJoin the 1-row theta /
    # exact-count / union-size aggregates onto <= k-row sketch relations
    # — the recall-gate precedent; every BNLJ side is 1-row or k-row
    "theta_sketch_suite",
}

#: queries allowed Python/Arrow stages, with a ceiling per query — every
#: stage is a vectorized (Arrow-batched) operator documented in
#: COVERAGE.md (minhash signatures, BPE training/encode, pack_sequences
#: state, multimodal decode, kmeans/IVF-PQ train+index); row-at-a-time
#: BatchEvalPython never appears anywhere.
PY_ALLOWED = {
    # r12 fold: minhash leg keeps its 2 MapInPandas signature stages
    # (corpus + planted union sides) and the cosine leg its 2 hyperplane-
    # projection stages; simhash stays all-JVM. r14: the folded decontam
    # leg's corpus+bench bucket stages land inside the same ceiling
    # (measured 4 post-fold — zero headroom; a new Arrow stage in ANY
    # leg must justify raising this)
    "dedup_recall_suite": 4,
    # r13 fold: the bpe leg of text_profile_suite keeps the 2 stages
    "text_profile_suite": 2,
    "sample_pack_pipeline": 3,
    "llm_text_model_suite": 6,
    "multimodal_suite": 2,
    "similarity_knn_suite": 20,
    # r8 'nfc' leg: unicode_normalize is the documented Arrow seam
    # (Spark has no builtin NFC expression) — exactly one stage
    "llm_graph_layout_suite": 1,
    # r8 extension: the dense_ok column gates the dense serve-tier
    # scorer (one broadcast-vector gather-sum Arrow stage) against the
    # relational score inside the same oracle query
    "dsir_importance": 1,
    # r8 extension: the 'unesc' leg runs the exact-entity decoder — the
    # documented Arrow seam (stdlib html.unescape has no builtin twin)
    "crawl_extract_suite": 1,
    # r13 fold: image (4) + video (2) + audio (2) perceptual-hash
    # mapInPandas stages ride under one suite — numpy DCT/gradient/
    # spectral math is the documented Arrow seam
    "perceptual_dedup_suite": 8,
    # r16: the KMV builder's bounded per-partition fold (mapInPandas,
    # <= k rows out per partition — the property that keeps the shuffle
    # off the distinct domain) re-runs once per leg that consumes a
    # sketch (no caching, the no-cached-blocks standard): sketch legs
    # (1+1+2) + est legs (1+1+2) + 2 set-op legs x (2-stage match join
    # + 2-stage threshold, single-instantiated per the r16 review) = 16
    # measured, zero headroom
    "theta_sketch_suite": 16,
    # r10 fourth wave: three legs ('jw' goldens, 'link' planted names,
    # 'part' vocabulary), each one ArrowEvalPython jaro_winkler_udf
    # stage over a candidate-sized frame (r13: the jw: legs of
    # linkage_suite)
    "linkage_suite": 3,
    # r11: three legs ('order' + 'nulls' aggregate the planted frame
    # independently, 'corpus' scans documents), each exactly one
    # ArrowEvalPython zlib compression_ratio stage — zlib is the
    # documented Arrow seam (no JVM builtin)
    "compression_quality_suite": 3,
    # r12: one Misra-Gries mapInPandas stage per sketch reference —
    # the topk leg and the guard leg's kth-count branch re-execute the
    # candidate stage (union branches don't share subtrees), plus the
    # planted leg's own stage
    "heavy_hitter_suite": 4,
}

_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, spec in CATALOG.items():
        out[name] = (
            spec.fn(spark, _SF)._jdf.queryExecution().executedPlan().toString()
        )
    return out


#: the EXACT driver window, in registration order — all 50 slots are
#: driver-green; any reorder (even an innocent import/refactor shuffle
#: within the first 50) silently rebinds CORRECTNESS rows, so the full
#: list is pinned, not just the count
DRIVER_WINDOW = [
    "geohash_cells", "pipeline_enrich_daily_rollup", "latest_event_per_user",
    "events_hourly_tumbling", "session_suite", "asof_purchase_to_click",
    "weather_topology_full",
    # r12 fold: the three 1-row recall gates became one canary-protected
    # suite; r13 wave 2 folded the four per-document text gates into
    # text_profile_suite and dedup_crosscorpus_linkage into
    # llm_dedup_join_suite's 'xlink' leg (raw builders stay importable)
    "dedup_recall_suite",
    "dedup_clusters_cc", "sample_pack_pipeline",
    "llm_graph_layout_suite", "llm_cdc_analytics_suite",
    "llm_text_model_suite", "llm_retrieval_suite", "llm_dedup_join_suite",
    "dedup_exact_family_suite",
    "multimodal_suite", "similarity_knn_suite",
    "text_profile_suite",
    "q1_pricing_summary",
    "grouping_multi_suite", "join_flavors_suite",
    "setop_suite", "reshape_suite",
    "scalar_semantics_suite",
    # r11 fold: the 9 relational singles became two canary-protected
    # suites; r13 folded eight more window singles into the three
    # umbrella suites below
    "tpch_qsuite", "scalar_regex_suite",
    "profile_agg_suite", "window_family_suite", "relational_misc_suite",
    # promoted extensions (catalog/__init__.py _PROMOTED) — r13 wave 2
    # folded every remaining extension into a thematic umbrella and
    # promoted ALL of them: the driver gate now covers the entire
    # catalog (49 entries, one spare slot under the 50-row cap)
    "model_eval_suite", "perceptual_dedup_suite", "geo_suite",
    # r14 fold: privacy_kanon_suite became corpus_stats_suite's 'kanon:*'
    # legs (builder stays importable); the freed slot carries the HLL
    # distinct-count suite (the fourth sketch)
    "hll_distinct_suite", "timeseries_gapfill_suite",
    "unicode_token_suite", "temporal_join_suite",
    "script_mix_suite", "containment_pairs_suite",
    "stats_family_suite", "quality_survivor_suite", "heavy_hitter_suite",
    "compression_quality_suite",
    # r14 fold: decontam_embedding_recall became dedup_recall_suite's
    # 'decontam' leg (builder stays importable); the freed slot carries
    # the DDSketch quantile suite (the third sketch family)
    "quantile_sketch_suite",
    "dsir_importance",
    "linkage_suite", "mixing_policy_suite", "corpus_stats_suite",
    "crawl_extract_suite",
    # r13: the NEW count-min-sketch gate takes the spare 50th slot —
    # the catalog now fills the driver window exactly
    "cms_freq_suite",
]

#: opt-r16: extensions registered PAST the 50-slot driver window (the
#: optimization round reverted the interrupted asof->theta window swap;
#: these are held to the same oracle standard by tools/check_oracle.py
#: but get no driver CORRECTNESS row)
PAST_WINDOW = ["theta_sketch_suite"]


def test_catalog_fits_driver_window_completely(plans):
    # the driver evaluates the FIRST 50 registered queries (observed r3:
    # 69 registered -> 50 CORRECTNESS rows), and the order is pinned by
    # NAME AND POSITION (rebinding a slot silently rebinds its
    # CORRECTNESS row). opt-r16: the window is pinned to the r15 set —
    # the optimization no-regression contract — and theta_sketch_suite
    # registers past the cap (driver ignores it; check_oracle gates it).
    names = list(CATALOG)
    assert names[:50] == DRIVER_WINDOW
    assert names[50:] == PAST_WINDOW


def test_no_cartesian_product_anywhere(plans):
    offenders = {n for n, p in plans.items() if "CartesianProduct" in p}
    assert not offenders, f"cartesian products in: {sorted(offenders)}"


def test_nested_loop_joins_only_where_allowed(plans):
    offenders = {
        n for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_ALLOWED
    }
    assert not offenders, (
        f"unexpected BroadcastNestedLoopJoin in: {sorted(offenders)} — if the "
        "join is a deliberate broadcast-scalar crossJoin, add it to "
        "BNLJ_ALLOWED with a comment; otherwise the plan regressed"
    )


def test_python_stages_only_where_allowed(plans):
    for name, plan in plans.items():
        n_py = len(re.findall(PY_STAGES, plan))
        cap = PY_ALLOWED.get(name, 0)
        assert n_py <= cap, (
            f"{name}: {n_py} Python/Arrow stages (cap {cap}) — either a "
            "JVM-expressible path grew a UDF, or update PY_ALLOWED with "
            "the rationale"
        )


def test_no_row_at_a_time_python_anywhere(plans):
    offenders = {n for n, p in plans.items() if "BatchEvalPython" in p}
    assert not offenders, (
        f"row-at-a-time Python UDFs in: {sorted(offenders)} — use an "
        "Arrow-batched pandas UDF or a builtin expression"
    )


#: driver-table widths; a FileScan reading EVERY column of one of these
#: is the classic pruning failure (projection not reaching the scan)
_TABLE_WIDTHS = {
    "lineitem": 16, "orders": 9, "customer": 8, "supplier": 7,
    "part": 9, "nation": 4, "region": 3, "events": 6, "documents": 5,
}


def test_column_pruning_reaches_every_parquet_scan(plans):
    """r16: no catalog query's FileScan reads the FULL width of any
    multi-column driver table — column pruning reaches the parquet
    reader everywhere (the 100 TB scan-cost invariant: a 16-column
    lineitem read for a 7-column aggregate would be paying for 2x the
    IO). ``embeddings`` is exempt by construction: it has exactly two
    columns (vec_id, embedding) and every kNN consumer needs both.
    Audited catalog-wide at introduction: zero full-width scans."""
    offenders = []
    scan_re = re.compile(r"FileScan parquet ([^\n]+)")
    tbl_re = re.compile(r"/(\w+)\.parquet")
    rs_re = re.compile(r"ReadSchema: struct<(.*?)>?$")
    for name, p in plans.items():
        for m in scan_re.finditer(p):
            line = m.group(1)
            tm = tbl_re.search(line)
            if not tm or tm.group(1) not in _TABLE_WIDTHS:
                continue
            rs = rs_re.search(line)
            # plan strings may truncate; count only definite full reads
            ncols = rs.group(1).count(":") if rs else 0
            if ncols >= _TABLE_WIDTHS[tm.group(1)]:
                offenders.append((name, tm.group(1), ncols))
    assert not offenders, (
        f"full-width parquet scans (pruning failed to reach the reader): "
        f"{offenders}"
    )
