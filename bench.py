#!/usr/bin/env python
"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall seconds.

Each query executes to completion (count() over the result — full pipeline,
no driver-side materialization of wide rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q18_large_volume_customers",
    # r1 names: agg_stats_by_flag -> stats_suite_by_flag (superset),
    # window_top_order_per_customer -> window_rank_running_suite (superset)
    "stats_suite_by_flag",
    "window_rank_running_suite",
    # reference-pipeline shapes
    "weather_topology_full",
    "geohash_cells",
    "pipeline_enrich_daily_rollup",
    "latest_event_per_user",
    "events_hourly_tumbling",
    "session_window_stats",
    "asof_purchase_to_click",
    # LLM-data ops
    "dedup_exact_digest",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",  # added r2 (new operator; not in r1 baseline)
    "dedup_clusters_cc",  # added r2 (new operator; not in r1 baseline)
    "sample_pack_pipeline",  # added r2 (new operator; not in r1 baseline)
    "similarity_knn_bruteforce",
    "similarity_knn_lsh",
    "similarity_knn_ivf",
    "similarity_knn_ivf_pq",  # added r4 (new operator; not in r1 baseline)
    "semantic_dedup",  # added r5 (new operator; not in r1 baseline)
    "tfidf_top_terms",  # added r5 (new operator; not in r1 baseline)
    "text_token_stats",
    "text_quality_scores",
    "text_quality_gopher",  # added r2 (widened quality surface; not in r1 baseline)
    "text_repetition_gopher",  # added r5 (new operator; not in r1 baseline)
    "dedup_exact_substring",  # added r5 (new operator; not in r1 baseline)
    "bm25_retrieval",  # added r5 (new operator; not in r1 baseline)
    "classifier_score",  # added r5 (new operator; not in r1 baseline)
    "cdc_merge",  # added r5 (new operator; not in r1 baseline)
    "pagerank_events",  # added r5 (new operator; not in r1 baseline)
    "jaccard_join_exact",  # added r5 (new operator; not in r1 baseline)
    "multimodal_image_features",
]

# Frozen per-query steady-state baselines (sec): BENCH_BASELINE_r1.md for the
# r1 set (renames: agg_stats_by_flag -> stats_suite_by_flag,
# window_top_order_per_customer -> window_rank_running_suite), min-of-2 from
# BENCH_r02.json for the four r2-added queries. Used only as a NOISE GATE:
# if a query's min-of-2 still exceeds RETRY_FACTOR x its baseline, the
# reading is far more likely host interference (this VM shows one-sided
# multi-second outliers — BENCH_BASELINE_r1.md "Methodology change") than a
# real plan regression, so the harness takes up to MAX_EXTRA_TRIALS more
# samples and reports the min. A genuine regression still shows: extra
# trials reproduce it and the recorded value stays high.
BASELINE_SEC = {
    "q1_pricing_summary": 1.313,
    "q3_shipping_priority": 2.081,
    "q5_local_supplier_volume": 1.509,
    "q6_revenue_forecast": 0.395,
    "q18_large_volume_customers": 0.933,
    "stats_suite_by_flag": 0.419,
    "window_rank_running_suite": 0.892,
    "weather_topology_full": 2.263,
    "geohash_cells": 1.240,
    "pipeline_enrich_daily_rollup": 0.444,
    "latest_event_per_user": 0.337,
    "events_hourly_tumbling": 0.474,
    "session_window_stats": 0.818,
    "asof_purchase_to_click": 0.438,
    "dedup_exact_digest": 0.328,
    "dedup_ngram_jaccard": 3.543,
    "dedup_minhash_lsh": 4.468,
    "dedup_simhash": 3.184,
    "similarity_knn_bruteforce": 1.315,
    "similarity_knn_lsh": 1.115,
    "similarity_knn_ivf": 1.550,
    "text_token_stats": 0.435,
    "text_quality_scores": 0.421,
    "multimodal_image_features": 0.502,
    # r2-added queries (min-of-2 from BENCH_r02.json)
    "dedup_embedding_cosine": 3.198,
    "dedup_clusters_cc": 2.267,
    "sample_pack_pipeline": 1.518,
    "text_quality_gopher": 0.395,
    # r4-added operator (steady-state measured at introduction)
    "similarity_knn_ivf_pq": 2.5,
    # r5-added operators (steady-state measured at introduction)
    "semantic_dedup": 2.9,
    # r17 receipt (VERDICT r16 item 2): the r16 driver reading of 1.65
    # was a window artifact, not a regression of the r16 window-df
    # rewrite — fresh same-tree A/B (tools/exp_tfidf_ab.py, min-of-5
    # alternating): window form 0.871 vs the r15 groupBy+join-back form
    # 0.874, with the window form scanning the corpus once less
    # (Scans 2 vs 3); r17 round-start bench reads 0.991. Freeze kept.
    "tfidf_top_terms": 1.05,
    "text_repetition_gopher": 1.45,
    "dedup_exact_substring": 0.5,
    "bm25_retrieval": 2.9,
    "classifier_score": 0.3,
    "cdc_merge": 0.65,
    "pagerank_events": 2.2,
    "jaccard_join_exact": 3.8,  # r5: PPJoin positional filter (-60% candidates)
}
RETRY_FACTOR = 2.0
MAX_EXTRA_TRIALS = 2

#: r9 fixtures shared between the untimed prep in _ops_workloads and
#: the timed closures: the snapshot-diff table path and the fitted,
#: driver-materialized DSIR model (a 1-element list so the closures
#: read what prep wrote)
_SNAP_DIFF_TBL = "/tmp/spark_graft_bench_snapdiff/tbl"
_DSIR_WEIGHTS: list = [None]
_KN_DENSE: list = [None]

#: r8 (VERDICT r7 item 2): the r7 crawl/compliance/versioning surface as a
#: NON-HEADLINE section — measured with the same min-of-2 + retry harness,
#: reported under "ops_queries"/"ops_total" so the headline total stays
#: round-over-round comparable. First measurements frozen in
#: BENCH_BASELINE_r1.md's operator-change table.
OPS_SECTION = [
    "warc_parse",
    "robots_match",
    "bloom_decontaminate",
    "psl_domains",
    "assign_splits_events",
    "snapshot_write_read",
    "dsir_select",
    "html_extract",
    # r9 (VERDICT r8 item 3): the r8/r9 surface gets perf tracking
    "export_training_shards",
    "snapshot_diff",
    "crawl_delays",
    "warc_charset_report",
    "dsir_score_dense",
    "image_phash_dedup",
    "video_phash_dedup",
    "audio_fp_dedup",
    # r10: interpolated-KN bigram LM (fit on the src1 split + score the
    # whole corpus — the CCNet perplexity-filter shape)
    "kn_lm_perplexity",
    # r10: rank-based classifier metrics over 100k scored events
    # (distributed prefix sum + confusion sweep + calibration)
    "classifier_eval",
    # r10: JS-divergence drift + per-source mix shift between two
    # synthetic versions of the documents corpus
    "corpus_drift",
    # r10: the KN serve tier — pruned broadcast model, one Arrow stage
    "kn_score_dense",
    # r10 second wave: NDCG/MAP/MRR over 100k events (1500 queries,
    # per-query windows + one (query, doc) join)
    "retrieval_eval",
    # r10 second wave: PMI/NPMI collocations over the documents corpus
    # (two count aggs + vocabulary-bounded joins + top-k)
    "pmi_collocations",
    # r10 third wave: CCNet bands (distinct-score table + per-group
    # windows + assignment join) over 100k scored events by type
    "score_buckets",
    # r10 third wave: UniMax waterfilling (one corpus count agg +
    # group-cardinality closed form)
    "unimax_alloc",
    # r10 third wave: embedding decontamination, LSH tier (two bucket
    # stages + bench-broadcast collision join + cosine verify)
    "decontam_embedding",
    # r10 fourth wave: privacy audit + suppression repair (customer),
    # hourly gap-fill grid + stats (events), grid-blocked 25 km radius
    # self-join (orders), phonetic block histogram (document words)
    "privacy_kanon",
    "timeseries_gapfill",
    "geo_radius_join",
    "soundex_blocks",
    # r10 fourth wave: Arrow JW scorer over ~50k adjacent-word pairs
    "jaro_winkler_verify",
    # r10 fourth wave: trailing-window z-scores over 100k events
    "anomaly_zscore",
    # r10 fourth wave: pooled quantile normalization over 100k events
    "quantile_normalize",
    # r10 fourth wave closing batch: journey transitions, gapfill->
    # forecast chain, CUSUM closed form, robust scaling, screening
    # audits — all over the 100k-event volume
    "markov_transitions",
    "trend_forecast",
    "cusum_shift",
    "robust_scale",
    "stat_audit",
    # r11: Unicode-segmentation tokenizer (CJK bigram) vocabulary build
    # over 100k generated 40-char Han runs + latin tails — the regex
    # run-marking -> split -> per-run transform chain at corpus volume
    "unicode_tokens",
    # r11: directional containment pairs over the documents corpus —
    # the shared inverted-index machinery with the asymmetric filter
    "containment_pairs",
    # r11: zlib quality signal over the documents corpus — one Arrow
    # stage + summary agg
    "compression_ratio",
    # r12: quality-aware survivor selection — exact-dup cluster edges +
    # connected components + per-cluster argmax window over documents
    "quality_survivors",
    # r12: nearest-direction as-of join — the two-channel single-shuffle
    # window over purchases x deduped clicks
    "asof_nearest",
    # r12: Misra-Gries candidates (one Arrow stage, O(capacity) state,
    # no shuffle) + candidate-bounded exact recount top-20
    "heavy_hitter_topk",
    # r13: count-min sketch build (bounded depth x width key domain)
    # + broadcast probe lookup over documents
    "cms_freq",
    "dd_quantiles",
    "hll_distinct",
    "hll_grouped",
    # r16: KMV theta sketch — two cohort builds (bounded per-partition
    # fold) + the intersection estimate from the two k-row sketches
    "theta_overlap",
]

#: frozen first-measurements for the ops section (set r8, steady-state
#: min-of-2 at sf0.1) — noise gate only, same semantics as BASELINE_SEC
OPS_BASELINE_SEC = {
    "warc_parse": 0.32,
    # r17 re-freeze with receipts (VERDICT r16 item 3): the r16 driver
    # run read 0.789 (1.75x the old 0.45 freeze) in a degraded window;
    # fresh min-of-5 receipts straddle the old freeze (bench-protocol
    # window 0.352 at calib 2.99; ab_trials window 0.575-0.65 at calib
    # 2.33) — the entry's steady state is window-dominated, so the
    # freeze moves to the receipt median. Noise gate only.
    "robots_match": 0.55,
    # r11 re-freeze with receipts (VERDICT r10 item 3): the r10 reading
    # (2.097 at calib 3.329) vs the r8 freeze (1.30) was NOT a code
    # regression — an A/B on one host (calib 2.107) ran the r9 checkout
    # and the r11 tree on identical data: r9 steady-state 0.64 build +
    # 1.32 probe = 1.96s, r11 0.64 + 1.11 = 1.75s (dedup.py's bloom path
    # is byte-identical between the rounds; git diff 1993c8e..5d7d080
    # touches only decontaminate_embedding/hamming). The 1.30 freeze was
    # a lucky in-harness reading; re-frozen at the reproducible
    # steady-state minimum.
    "bloom_decontaminate": 1.90,
    "psl_domains": 1.42,
    "assign_splits_events": 0.15,
    # post-footer-audit steady state (the pre-change op measured 1.36)
    "snapshot_write_read": 0.70,
    # r11: CJK bigram vocabulary build — 100k generated 40-char Han runs
    # through regexp run-marking -> per-run bigram transform -> 4M-token
    # explode + count agg. First in-harness measurement (calib 2.078,
    # fast host).
    "unicode_tokens": 3.92,
    # r11 (in-harness min-of-2 at calib 2.27): directional containment
    # pairs over the documents corpus — same posting machinery as
    # dedup_ngram_jaccard, asymmetric filter
    "containment_pairs": 2.27,
    # r11 (same run): zlib ratio Arrow stage + summary agg over 5k docs
    "compression_ratio": 0.18,
    # r12 first measurements (min-of-3 steady state at calib 4.374 — a
    # SLOW window, so these ceilings are deliberately generous noise
    # gates; raw runs in BENCH_BASELINE_r1.md)
    "quality_survivors": 1.02,
    "asof_nearest": 0.34,
    # r12: MG candidates + candidate-bounded exact recount top-20;
    # min-of-3 [1.235, 0.801, 0.798] at calib 2.18 (fast host)
    "heavy_hitter_topk": 0.80,
    # r14 re-freeze (VERDICT r13 item 2): the r13 freeze (0.40, from a
    # min-of-2 in-harness run) was the low tail of the distribution —
    # the r13 DRIVER run read 0.624 (1.56x) with no code change, and the
    # r14 same-host A/B (receipts in BENCH_BASELINE_r1.md) shows a
    # 0.63-0.80 steady-state band on BOTH the r13 checkout (8-trial min
    # 0.638) and the r14 tree (6-trial min 0.634, identical
    # distribution — the r14 cms_estimate empty-sketch rework is
    # perf-neutral). Re-frozen at the reproducible minimum across the
    # r13 driver run and both A/B distributions.
    "cms_freq": 0.62,
    # r14 first measurement: DDSketch build over 600k l_extendedprice
    # values (bounded ~245-cell bucket domain, one bounded shuffle) +
    # the 7-point quantile walk. min-of-4 [1.492, 1.011, 1.025, 0.983]
    # at calib 1.965 (fast window) in the bench-config session
    # (tools/ab_trials.py); frozen at the top of the steady band, not
    # the min — the cms_freq lesson.
    "dd_quantiles": 1.00,
    # r14 first measurement: HLL register build over 600k l_partkey
    # values (constant 1024-register domain) + the estimate closed form.
    # min-of-4 [0.442, 0.336, 0.307, 0.330] in the bench-config session
    # (tools/ab_trials.py); frozen at the top of the steady band.
    "hll_distinct": 0.40,
    # r15 first measurement: grouped HLL (per-event_type registers over
    # events.user_id + per-group estimates). 5 trials [1.123, 0.754,
    # 0.533, 0.718, 1.06] at calib 3.678 — a SLOW host window (typical
    # calib ~2.0) — in the bench-config session (tools/ab_trials.py);
    # frozen at the top of the steady band, generous for the window.
    "hll_grouped": 0.90,
    # r16 first measurement: theta corpus overlap (two cohort sketch
    # builds + the k-row intersection estimate). 5 trials [2.092, 1.277,
    # 1.129, 1.113, 1.033] at calib 2.945 (~1.5x slow vs the typical
    # ~2.0) in the bench-config session (tools/ab_trials.py); frozen at
    # the top of the steady band, generous for the window.
    "theta_overlap": 1.30,
    # r8 third wave: post-model-pin steady state (pre-pin measured 4.2 —
    # the bucket-count aggs re-executed for every downstream consumer);
    # r11 re-freeze, same A/B receipt as bloom_decontaminate: r9 checkout
    # 3.28s vs r11 tree 3.04s steady-state on one host (dsir.py unchanged
    # r9->r11); the 2.60 freeze was the low tail of host variance.
    "dsir_select": 3.00,
    # r8 third wave: 100k pages x 4 planted shapes through the
    # html_to_text + clean_text codegen chain
    "html_extract": 0.70,
    # r9 first measurements (steady-state min-of-2 at sf0.1,
    # calib_sec 3.012 on the measuring run)
    "export_training_shards": 0.62,
    # r17 re-freeze with receipts (VERDICT r16 item 3): the old 0.45
    # freeze made the retry gate 0.9s, which degraded windows trip
    # chronically (the r16 driver run retried this entry 4x and still
    # recorded 0.748). Fresh min-of-5 receipts: 0.536 (bench-protocol
    # window, calib 2.99), 0.631-0.697 (ab_trials window, calib 2.33).
    # Frozen at the receipt median; noise gate only.
    "snapshot_diff": 0.65,
    "crawl_delays": 1.62,
    "warc_charset_report": 0.42,
    "dsir_score_dense": 0.62,
    "image_phash_dedup": 1.05,
    # r9 second wave (steady-state min-of-2 at sf0.1, clean run at
    # calib_sec 2.33)
    "video_phash_dedup": 2.83,
    # r9 third wave (first measurement, clean run at calib_sec 2.46)
    "audio_fp_dedup": 1.99,
    # r10 (re-frozen from the first IN-HARNESS run at calib 3.311 —
    # standalone first measurements were 1.6-5x higher purely from cold
    # worker pools and would mask real regressions)
    "kn_lm_perplexity": 1.13,
    # r10: AUC/AP/KS prefix sum over ~100k distinct scores + confusion +
    # calibration (the exact-global-prefix actions dominate)
    "classifier_eval": 1.82,
    # r10: JS drift + mix shift over the split documents corpus
    "corpus_drift": 0.93,
    # r10: KN serve tier — one Arrow stage over the corpus, model
    # collapsed outside the timed region
    "kn_score_dense": 0.18,
    # r10 second wave (first in-harness measurements at calib 3.576 —
    # an elevated-host run; expect headroom on a quiet host)
    "retrieval_eval": 0.63,
    "pmi_collocations": 1.02,
    # r10 third wave (first in-harness measurements at calib 2.968 —
    # a baseline-speed host)
    "score_buckets": 0.38,
    "unimax_alloc": 0.43,
    "decontam_embedding": 0.95,
    # r10 fourth wave (first measurements, min-of-2 in-harness at
    # calib_sec 2.643 — a baseline-speed host)
    "privacy_kanon": 0.25,
    "timeseries_gapfill": 0.44,
    "geo_radius_join": 3.08,
    # post-let-binding steady state, re-frozen from the next
    # IN-HARNESS run (min-of-2 at calib 2.392; the un-bound expression
    # tree measured 4.13 — Catalyst inlined the 13-step chain at every
    # reference, the geohash transform let-binding fix halved it)
    "soundex_blocks": 1.33,
    # r10 fourth wave, second freeze batch (min-of-2 in-harness at
    # calib_sec 2.777)
    "jaro_winkler_verify": 0.12,
    "anomaly_zscore": 0.22,
    # r10 fourth wave, third freeze batch (min-of-2 in-harness at
    # calib_sec 2.399 — a fast host)
    "quantile_normalize": 1.48,
    # r10 fourth wave closing batch (min-of-2 in-harness at calib
    # 2.392 — a fast host)
    "markov_transitions": 0.63,
    "trend_forecast": 0.84,
    "cusum_shift": 0.33,
    "robust_scale": 0.62,
    "stat_audit": 0.66,
}


def _warc_fixture_dir() -> str:
    """Synthetic Common-Crawl-style fixture for warc_parse: 6 shards,
    each 1500 one-member-per-record gzip members (response records with
    small HTML bodies). Deterministic bytes; built once per /tmp
    lifetime, OUTSIDE any timed region."""
    import gzip

    fix = "/tmp/spark_graft_bench_warc"
    marker = os.path.join(fix, "_COMPLETE")
    if os.path.exists(marker):
        return fix
    os.makedirs(fix, exist_ok=True)
    for shard in range(6):
        members = []
        for i in range(1500):
            body = (
                "<html><head><title>doc %d-%d</title></head><body>"
                "<p>paragraph %d</p><a href=\"https://d%d.com/x\">l</a>"
                "</body></html>" % (shard, i, i, i % 37)
            ).encode()
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
                + body
            )
            block = (
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                + f"WARC-Record-ID: <urn:uuid:{shard}-{i}>\r\n".encode()
                + f"WARC-Target-URI: http://s{i % 97}.com/p{i}\r\n".encode()
                + b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
                b"Content-Type: application/http; msgtype=response\r\n"
                + f"Content-Length: {len(http)}\r\n\r\n".encode()
                + http + b"\r\n\r\n"
            )
            members.append(gzip.compress(block))
        with open(os.path.join(fix, f"shard{shard}.warc.gz"), "wb") as f:
            f.write(b"".join(members))
    with open(marker, "w") as f:
        f.write("ok")
    return fix


def _ops_workloads():
    """r8 ops-section workloads (all deterministic, all over the shared
    testdata tables or the warc fixture)."""
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.operators.dedup import (
        build_shingle_bloom,
        decontaminate_bloom,
    )
    from kafka_streams_task_spark.operators.robots import (
        parse_robots,
        robots_allowed,
    )
    from kafka_streams_task_spark.operators.sampling import assign_splits
    from kafka_streams_task_spark.functions.url import with_registered_domain_psl
    from kafka_streams_task_spark.schemas import load_table, local_table
    from kafka_streams_task_spark.sources.warc import read_warc

    fix = _warc_fixture_dir()
    # prior bench invocations' snapshot dirs (uuid-named) are dead weight
    import shutil

    shutil.rmtree("/tmp/spark_graft_bench_snap", ignore_errors=True)

    def _warc_parse(s, d):
        # parse throughput over the path-only scan (9000 gz records)
        return read_warc(s, fix, record_types=("response",))

    def _robots_match(s, d):
        # 100k URLs x (40 domains x ~6 rules): the windows + LIKE +
        # max_by chain at events volume
        bodies = local_table(s,
            [
                (
                    f"d{i}.com",
                    "User-agent: trainbot\nDisallow: /blocked%d\n\n"
                    "User-agent: *\nDisallow: /private/\nAllow: /private/ok/\n"
                    "Disallow: /*.pdf$\nAllow: /p%d" % (i, i % 7),
                )
                for i in range(40)
            ],
            "domain string, robots_txt string",
        )
        ev = load_table(s, d, "events")
        urls = ev.select(
            "event_id",
            F.concat(F.lit("d"), (F.col("event_id") % 40).cast("string"),
                     F.lit(".com")).alias("domain"),
            F.concat(
                F.lit("https://d"), (F.col("event_id") % 40).cast("string"),
                F.lit(".com/p"), (F.col("event_id") % 50).cast("string"),
                F.element_at(
                    F.array(F.lit(""), F.lit("/private/x"), F.lit("/private/ok/y"),
                            F.lit("/a.pdf"), F.lit("/blocked5/z")),
                    (F.col("event_id") % 5 + 1).cast("int"),
                ),
            ).alias("url"),
        )
        return robots_allowed(urls, parse_robots(bodies), agent="trainbot")

    def _bloom_decontaminate(s, d):
        # eval set = every 50th doc; corpus = all docs; pure Bloom path
        # (the 100 TB shape: k broadcast word probes, no exact verify)
        docs = load_table(s, d, "documents").select("doc_id", "text")
        bench = docs.filter(F.col("doc_id") % 50 == 0).select("text")
        bloom = build_shingle_bloom(bench, shingle_n=8, fpp=0.01)
        return decontaminate_bloom(docs, bloom)

    def _psl_domains(s, d):
        # 100k URLs through the K broadcast PSL probes, host shapes
        # cycling private-wildcard / multi-part ICANN / plain / deep
        ev = load_table(s, d, "events")
        host = F.element_at(
            F.array(
                F.concat(F.lit("a"), (F.col("event_id") % 997).cast("string"),
                         F.lit(".github.io")),
                F.concat(F.lit("www.x"), (F.col("event_id") % 499).cast("string"),
                         F.lit(".co.uk")),
                F.concat(F.lit("m"), (F.col("event_id") % 1009).cast("string"),
                         F.lit(".example.com")),
                F.concat(F.lit("i"), (F.col("event_id") % 211).cast("string"),
                         F.lit(".us-east-1.compute.amazonaws.com")),
            ),
            (F.col("event_id") % 4 + 1).cast("int"),
        )
        urls = ev.select(
            "event_id", F.concat(F.lit("https://"), host, F.lit("/p")).alias("url")
        )
        return with_registered_domain_psl(urls)

    def _assign_splits_events(s, d):
        # shuffle-free hash splits at events volume, grouped by user
        # (the leakage unit)
        ev = load_table(s, d, "events")
        return assign_splits(
            ev, {"train": 0.9, "val": 0.05, "test": 0.05},
            group_col="user_id", id_col="event_id",
        )

    def _snapshot_write_read(s, d):
        # one full version commit (write + footer audit + manifest +
        # atomic publish) and the pinned read back, fresh dir per run
        import shutil
        import uuid

        from kafka_streams_task_spark.operators.snapshots import (
            snapshot_read,
            snapshot_write,
        )

        docs = load_table(s, d, "documents")
        path = f"/tmp/spark_graft_bench_snap/{uuid.uuid4().hex}"
        shutil.rmtree(path, ignore_errors=True)
        v = snapshot_write(s, docs, path)
        return snapshot_read(s, path, v)

    def _html_extract(s, d):
        # html_to_text + clean_text throughput at events volume: 100k
        # pages cycling 4 planted shapes (script-heavy, deep block
        # nesting, entity-dense, unclosed container) via broadcast map
        from kafka_streams_task_spark.functions.text import (
            clean_text,
            html_to_text,
        )

        shapes = local_table(s,
            [
                (0, "<html><head><script>var a=1;</script><style>p{}</style>"
                    "</head><body>" + "<p>para text here</p>" * 20 + "</body></html>"),
                (1, "<div>" + "<ul><li>item</li><li>item2</li></ul>" * 15 + "</div>"),
                (2, "<p>" + "&amp; &lt;x&gt; &quot;q&quot; &nbsp; " * 30 + "</p>"),
                (3, "<p>lead</p><script>var tail=1;" + "x" * 500),
            ],
            "hm int, page string",
        )
        ev = load_table(s, d, "events")
        pages = ev.select(
            "event_id", (F.col("event_id") % 4).cast("int").alias("hm")
        ).join(F.broadcast(shapes), "hm")
        # aggregate OVER the extracted text: the harness materializes
        # via count(), and a bare projection would be column-pruned
        # away — the chain must feed the result or the bench times an
        # events scan and nothing else (review catch)
        return pages.agg(
            F.sum(F.length(clean_text(html_to_text(F.col("page"))))).alias(
                "total_chars"
            ),
            F.count(F.lit(1)).alias("n_pages"),
        )

    def _dsir_select(s, d):
        # the full DSIR recipe at corpus volume: fit (two bucket aggs +
        # tiny full-outer join), broadcast-join scoring, Gumbel top-k
        from kafka_streams_task_spark.operators.dsir import dsir_select

        docs = load_table(s, d, "documents")
        target = docs.filter(F.col("source") == "src1")
        return dsir_select(docs, target, 200, n_features=1 << 13)

    # ---- r9 additions (VERDICT r8 item 3): the r8/r9 surface ----

    def _export_training_shards(s, d):
        # the two-level distributed prefix sum at corpus volume:
        # ~budget-sized shards over the documents' char mass
        from kafka_streams_task_spark.operators.sampling import (
            export_training_shards,
        )

        docs = load_table(s, d, "documents").select(
            "doc_id", F.length("text").alias("n_tokens")
        )
        return export_training_shards(docs, budget=200_000)

    def _snapshot_diff(s, d):
        # version-to-version governance diff over two planted versions
        # (written ONCE outside the timed region, below): hash-collapse
        # both sides, (key, count, hash) full-outer join, classify
        from kafka_streams_task_spark.operators.snapshots import (
            snapshot_diff,
        )

        return snapshot_diff(s, _SNAP_DIFF_TBL, 1, 2, ["doc_id"])

    def _crawl_delays(s, d):
        # effective Crawl-delay per domain at fleet volume: 100k rows
        # cycling 6 planted body shapes (agent-scoped, * fallback,
        # malformed, absent) across 20k distinct domains
        from kafka_streams_task_spark.operators.robots import crawl_delays

        shapes = local_table(s,
            [
                (0, "User-agent: *\nCrawl-delay: 2\n"),
                (1, "User-agent: trainbot\nCrawl-delay: 0.5\n\n"
                    "User-agent: *\nCrawl-delay: 10\n"),
                (2, "User-agent: *\nDisallow: /x\n"),           # no delay
                (3, "User-agent: trainbot\nCrawl-delay: abc\n"),  # malformed
                (4, "User-agent: other\nCrawl-delay: 7\n"),       # other scope
                (5, "User-agent: *\ncrawl-DELAY:  3.25  \n"),
            ],
            "cm int, robots_txt string",
        )
        ev = load_table(s, d, "events")
        bodies = ev.select(
            F.concat(F.lit("d"), (F.col("event_id") % 20000).cast("string"),
                     F.lit(".com")).alias("domain"),
            (F.col("event_id") % 6).cast("int").alias("cm"),
        ).join(F.broadcast(shapes), "cm")
        return crawl_delays(bodies, agent="trainbot")

    def _warc_charset_report(s, d):
        # one codegen charset sniff + single aggregate over the 9000-
        # record warc fixture parse
        from kafka_streams_task_spark.sources.warc import (
            read_warc,
            warc_charset_report,
        )

        return warc_charset_report(
            read_warc(s, fix, record_types=("response",))
        )

    def _dsir_score_dense(s, d):
        # the streaming/serve scorer at corpus volume: broadcast dense
        # λ-vector, ONE Arrow gather-sum stage. The model is fitted and
        # materialized ONCE outside the timed region (_DSIR_WEIGHTS);
        # the aggregate over dsir_logw keeps the Arrow stage load-
        # bearing (a bare count would column-prune the projection away)
        from kafka_streams_task_spark.operators.dsir import (
            dsir_score_dense,
        )

        docs = load_table(s, d, "documents")
        scored = dsir_score_dense(docs, _DSIR_WEIGHTS[0])
        return scored.agg(
            F.sum("dsir_logw").alias("total_logw"),
            F.sum("n_grams").alias("total_grams"),
            F.count(F.lit(1)).alias("n_docs"),
        )

    def _kn_score_dense(s, d):
        # r10: stateless serve scorer at corpus volume. The model is
        # fitted+collapsed ONCE outside the timed region (_KN_DENSE);
        # the aggregate keeps the Arrow stage load-bearing.
        from kafka_streams_task_spark.operators.kn_lm import kn_score_dense

        docs = load_table(s, d, "documents")
        scored = kn_score_dense(docs, _KN_DENSE[0])
        return scored.agg(
            F.sum("kn_avg_nll").alias("total_nll"),
            F.sum("kn_n_tokens").alias("total_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )

    def _corpus_drift(s, d):
        # r10: token-distribution drift (two token-count aggs + one
        # vocabulary-sized full outer join) + per-source mix shift
        from kafka_streams_task_spark.operators.drift import (
            corpus_drift_report,
            mix_shift_report,
        )

        docs = load_table(s, d, "documents")
        old = docs.filter(F.col("doc_id") % 2 == 0)
        new = docs.filter(F.col("doc_id") % 2 == 1)
        drift = corpus_drift_report(old, new)
        mix = mix_shift_report(old, new, "source").agg(
            F.sum(F.abs("delta")).alias("tv"), F.count(F.lit(1)).alias("g")
        )
        return drift.crossJoin(mix)

    def _retrieval_eval(s, d):
        # r10 second wave: ranked-retrieval metrics over the events
        # volume — 1500 queries x ~67 candidates; rank window (hits the
        # WindowGroupLimit pushdown), (query, doc) join against a 33k-
        # row qrels table, AP cumsum window, per-query aggregates.
        # count() returns the per-query table, so every metric executes.
        from kafka_streams_task_spark.operators.retrieval_eval import (
            retrieval_eval,
        )

        ev = load_table(s, d, "events")
        run = ev.select(
            F.col("user_id").alias("query_id"),
            F.col("event_id").alias("doc_id"),
            F.col("value").alias("score"),
        )
        qrels = ev.filter(F.col("event_id") % 3 == 0).select(
            F.col("user_id").alias("query_id"),
            F.col("event_id").alias("doc_id"),
            (F.col("event_id") % 4).alias("rel"),
        )
        return retrieval_eval(run, qrels, k=10)

    def _pmi_collocations(s, d):
        # r10 second wave: collocation mining over the 5k-document
        # corpus — unigram+bigram count aggs (the two corpus passes),
        # vocabulary-bounded marginal joins, micro-exact top-100
        from kafka_streams_task_spark.operators.collocations import (
            pmi_collocations,
        )

        docs = load_table(s, d, "documents")
        return pmi_collocations(docs, min_count=5, top_k=100)

    def _score_buckets(s, d):
        # r10 third wave: CCNet bands over 100k events grouped by
        # event_type — distinct-score collapse, per-group windows,
        # assignment join; count() returns all rows so the join runs
        from kafka_streams_task_spark.operators.sampling import (
            score_buckets_by_group,
        )

        ev = load_table(s, d, "events").select(
            "event_id", "event_type", F.col("value").alias("score")
        )
        return score_buckets_by_group(
            ev, group_col="event_type", score_col="score", labels=None
        )

    def _unimax_alloc(s, d):
        # r10 third wave: waterfilling over the documents corpus by
        # lang — one corpus token-count agg (checkpoint-pinned) + the
        # group-cardinality closed form
        from kafka_streams_task_spark.operators.sampling import (
            unimax_allocation,
        )

        docs = load_table(s, d, "documents").filter(F.col("lang").isNotNull())
        return unimax_allocation(docs, budget=150000.0)

    def _decontam_embedding(s, d):
        # r10 third wave: the LSH tier against a 50-vector "benchmark"
        # (copies of vec_id < 50) — two mapInPandas bucket stages, the
        # bench-broadcast collision join, exact cosine verify
        from kafka_streams_task_spark.operators.dedup import (
            decontaminate_embedding,
        )

        emb = load_table(s, d, "embeddings")
        bench = emb.filter(F.col("vec_id") < 50).select("embedding")
        return decontaminate_embedding(emb, bench, threshold=0.99)

    def _classifier_eval(s, d):
        # r10: AUC/AP/KS through the two-level distributed prefix sum
        # over 100k scored events (continuous scores -> the distinct-
        # score table is ~row-sized: the prefix tier is load-bearing),
        # plus a 3-threshold confusion pass and a 10-bin calibration
        from kafka_streams_task_spark.operators.evaluation import (
            calibration_bins,
            classifier_eval,
            confusion_at_thresholds,
        )

        ev = load_table(s, d, "events").filter(F.col("value").isNotNull())
        scored = ev.select(
            (F.col("value") / (F.col("value") + 100.0)).alias("score"),
            (F.col("event_id") % 5 < 2).cast("int").alias("label"),
        )
        summary = classifier_eval(scored)
        conf = confusion_at_thresholds(scored, [0.2, 0.5, 0.8]).agg(
            F.sum("tp").alias("tp"), F.sum("fp").alias("fp")
        )
        cal = calibration_bins(scored, 10).agg(
            F.sum("n").alias("n"), F.avg("pos_rate").alias("pr")
        )
        return summary.crossJoin(conf).crossJoin(cal)

    def _kn_lm_perplexity(s, d):
        # r10: frozen-model perplexity scoring. The FIT (count tables +
        # the one scalar collect) is part of the timed region — a real
        # filter run pays it — and scoring joins the three model tables
        # back against the full corpus.
        from kafka_streams_task_spark.operators.kn_lm import (
            kn_bigram_fit,
            kn_bigram_score,
        )

        docs = load_table(s, d, "documents")
        model = kn_bigram_fit(docs.filter(F.col("source") == "src1"))
        return kn_bigram_score(docs, model).agg(
            F.sum("avg_nll").alias("total_nll"),
            F.sum("n_tokens").alias("total_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )

    def _video_phash_dedup(s, d):
        # r9 second wave: fused frame-sample+hash stage + inverted
        # frame-hash index pairing over text-derived "video" payloads
        from kafka_streams_task_spark.operators.image_hash import (
            video_near_dup_pairs,
        )

        docs = load_table(s, d, "documents").select(
            "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
        )
        return video_near_dup_pairs(docs, min_shared_frames=2)

    def _audio_fp_dedup(s, d):
        # r9 third wave: fused decode+FFT+band sub-fingerprint stage +
        # inverted-index pairing over text-derived "audio" payloads
        from kafka_streams_task_spark.operators.audio_fp import (
            audio_near_dup_pairs,
        )

        docs = load_table(s, d, "documents").select(
            "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
        )
        return audio_near_dup_pairs(docs, min_shared=2)

    def _image_phash_dedup(s, d):
        # r9 perceptual image near-dedup at corpus volume: one Arrow
        # pHash stage over text-derived payloads (the multimodal bench
        # convention), then Hamming band-blocking + bit_count verify
        from kafka_streams_task_spark.operators.image_hash import (
            image_near_dup_pairs,
        )

        docs = load_table(s, d, "documents").select(
            "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
        )
        return image_near_dup_pairs(docs, max_hamming=6, n_blocks=8)

    def _privacy_kanon(s, d):
        # r10 fourth wave: the full audit + suppression repair over the
        # customer table — two-level sensitive-value aggregate, class
        # table broadcast, null-safe suppression join
        from kafka_streams_task_spark.operators.privacy import (
            suppress_below_k,
        )

        cust = load_table(s, d, "customer")
        return suppress_below_k(
            cust, ["c_nationkey", "c_mktsegment"], k=10
        )

    def _timeseries_gapfill(s, d):
        # r10 fourth wave: hourly spine + LOCF/interp windows + the
        # gaps-and-islands stats over 100k events in 5 series
        from kafka_streams_task_spark.operators.gapfill import (
            gap_stats,
            gapfill_series,
        )

        ev = load_table(s, d, "events")
        grid = gapfill_series(ev, ["event_type"], "ts", "value")
        return gap_stats(grid, ["event_type"])

    def _geo_radius_join(s, d):
        # r10 fourth wave: grid-blocked 25 km self-join over 150k
        # md5-scattered points — 3x3 ring explode, cell equi-join,
        # codegen haversine verify
        from kafka_streams_task_spark.operators.spatial import (
            radius_self_join,
        )

        # opt-r16 (guide §2.5): fan the one raw column out BEFORE the md5
        # coordinate derivation — deriving after the exchange runs the
        # md5/conv chain at session parallelism instead of fused into the
        # single-split scan task (the production analogue: a real point
        # table has many splits). radius_join's internal fan_out_scan
        # detects the existing repartition and does not add a second
        # exchange. Same points, same result.
        from kafka_streams_task_spark.schemas import fan_out_scan

        h = F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":geo")))
        pts = fan_out_scan(load_table(s, d, "orders").select("o_orderkey")).select(
            F.col("o_orderkey").alias("id"),
            ((F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 1200)
             / 10.0 - 60.0).alias("lat"),
            ((F.conv(F.substring(h, 9, 8), 16, 10).cast("long") % 3600)
             / 10.0 - 180.0).alias("lon"),
        )
        return radius_self_join(
            pts, 25.0, cell_deg=0.5, max_abs_lat=60.0, validate=False
        )

    def _jaro_winkler_verify(s, d):
        # r10 fourth wave: Arrow jaro_winkler_udf throughput over 50k
        # deterministic md5-hex pseudo-name pairs (8-13 chars; the
        # documents table's synthetic 31-word vocabulary is too small
        # to exercise the scorer)
        from kafka_streams_task_spark.operators.linkage import (
            jaro_winkler_udf,
        )

        pairs = s.range(50_000).select(
            F.substring(
                F.md5(F.col("id").cast("string")), 1,
                (8 + F.col("id") % 6).cast("int"),
            ).alias("a"),
            F.substring(
                F.md5((F.col("id") + 1).cast("string")), 1,
                (8 + (F.col("id") + 3) % 6).cast("int"),
            ).alias("b"),
        )
        jw = jaro_winkler_udf()
        return pairs.select(jw("a", "b").alias("x")).agg(
            F.avg("x").alias("avg_s"), F.count(F.lit(1)).alias("n")
        )

    def _anomaly_zscore(s, d):
        # r10 fourth wave: trailing-window z-scores over 100k events in
        # 5 series — one per-series sliding window + summary agg
        from kafka_streams_task_spark.operators.anomaly import (
            rolling_zscore,
        )

        ev = load_table(s, d, "events").filter(F.col("value").isNotNull())
        out = rolling_zscore(
            ev, ["event_type"], ["ts", "event_id"], "value"
        )
        return out.agg(
            F.sum("is_anomaly").alias("n_anom"),
            F.count("z").alias("n_scored"),
        )

    def _quantile_normalize(s, d):
        # r10 fourth wave: pooled order-statistics explode (~100k
        # integer-keyed rows) + per-group percent_rank window + two
        # equi-joins over 100k events
        from kafka_streams_task_spark.operators.quantile_norm import (
            quantile_normalize,
        )

        ev = load_table(s, d, "events").select(
            "event_id", "event_type", F.col("value").cast("double")
        )
        out = quantile_normalize(ev, ["event_type"], "value")
        return out.agg(
            F.avg("qn_score").alias("m"), F.count(F.lit(1)).alias("n")
        )

    def _markov_transitions(s, d):
        # r10 fourth wave: per-user journey window + (from,to) agg
        # over 100k events
        from kafka_streams_task_spark.operators.funnel import (
            event_transitions,
        )

        return event_transitions(load_table(s, d, "events"))

    def _trend_forecast(s, d):
        # r10 fourth wave: gapfill locf grid -> seasonal-naive eval +
        # least-squares trend per series
        from kafka_streams_task_spark.operators.forecast import (
            linear_trend,
            seasonal_naive_eval,
        )
        from kafka_streams_task_spark.operators.gapfill import (
            gapfill_series,
        )

        grid = gapfill_series(
            load_table(s, d, "events"), ["event_type"], "ts", "value"
        )
        naive = seasonal_naive_eval(
            grid, ["event_type"], "bucket_idx", "v_locf", season=24
        )
        trend = linear_trend(grid, ["event_type"], "bucket_idx", "v_locf")
        return naive.join(trend, "event_type")

    def _cusum_shift(s, d):
        # r10 fourth wave: two cumsums + two running extrema per series
        # over 100k events
        from kafka_streams_task_spark.operators.anomaly import (
            cusum_by_series,
        )

        ev = load_table(s, d, "events").filter(F.col("value").isNotNull())
        out = cusum_by_series(ev, ["event_type"], ["ts", "event_id"], "value")
        return out.agg(
            F.sum("is_shift").alias("n"), F.max("cusum_pos").alias("m")
        )

    def _robust_scale(s, d):
        # r10 fourth wave: two exact-percentile passes + broadcast cut
        # joins over 100k events
        from kafka_streams_task_spark.operators.robust import (
            robust_scale_by_group,
            winsorize_by_group,
        )

        ev = load_table(s, d, "events").select(
            "event_id", "event_type", F.col("value").cast("double")
        )
        wz = winsorize_by_group(ev, ["event_type"], "value", 0.05, 0.95)
        out = robust_scale_by_group(wz, ["event_type"], "value")
        return out.agg(
            F.avg("robust_z").alias("m"), F.count(F.lit(1)).alias("n")
        )

    def _unicode_tokens(s, d):
        # r11: CJK bigram vocabulary build — 100k generated 40-char Han
        # runs (synthetic doc vocab is too tiny for string kernels, the
        # r10 lesson) with latin tails, through the full codegen chain:
        # regex run-marking -> split -> per-run bigram transform ->
        # explode -> count agg
        from kafka_streams_task_spark.functions.text import tokens_unicode

        from kafka_streams_task_spark.schemas import fan_out_scan

        # opt-r16: the whole generate->tokenize->bigram chain fuses into
        # the events scan stage; a single-split source ran its 4.1 s of
        # CPU in ONE task. Fan the one generator column out first (the
        # production analogue: a corpus scan has many splits).
        ev = fan_out_scan(load_table(s, d, "events").select("event_id"))
        alph = F.array(*[F.lit(chr(0x4E00 + i)) for i in range(64)])
        run = F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.element_at(
                    alph, (F.pmod(F.col("event_id") * i, 64) + 1).cast("int")
                ),
            ),
            "",
        )
        docs = ev.select(
            F.concat(
                run, F.lit(" latin"), (F.col("event_id") % 97).cast("string")
            ).alias("text")
        )
        return (
            # explode_outer + post-generate null filter: a plain explode
            # makes the optimizer infer `size(tokens_unicode(..)) > 0` and
            # sink it below the fan-out exchange with the whole
            # generate+tokenize chain substituted in — the chain then runs
            # serially in the scan task and again post-exchange. Same
            # result: every generated text tokenizes non-empty.
            docs.select(F.explode_outer(tokens_unicode("text")).alias("t"))
            .filter(F.col("t").isNotNull())
            .groupBy("t")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def _containment_pairs(s, d):
        # r11: asymmetric near-dup pairs at max-direction 0.6 over the
        # full documents corpus (same posting machinery as
        # dedup_ngram_jaccard; the filter is the only difference)
        from kafka_streams_task_spark.operators.dedup import (
            ngram_containment_pairs,
        )

        docs = load_table(s, d, "documents").select("doc_id", "text")
        return ngram_containment_pairs(docs, threshold=0.6)

    def _compression_ratio(s, d):
        # r11: zlib ratio over every document + a one-row summary agg
        # (the Arrow stage is the timed object)
        from kafka_streams_task_spark.operators.compression import (
            compression_ratio,
        )

        docs = load_table(s, d, "documents")
        return docs.select(
            compression_ratio("text").alias("cr")
        ).agg(
            F.count("cr").alias("n"),
            F.avg("cr").alias("mean_cr"),
            F.min("cr").alias("min_cr"),
            F.max("cr").alias("max_cr"),
        )

    def _quality_survivors(s, d):
        # r12: exact-dup cluster edges + connected components + per-
        # cluster argmax over the documents corpus — the SAME builder
        # the gated suite uses, so the benchmark measures exactly the
        # gated construction
        from kafka_streams_task_spark.catalog.extensions import (
            qs_corpus_inputs,
        )
        from kafka_streams_task_spark.operators.dedup import (
            keep_best_per_cluster,
        )

        scored, edges = qs_corpus_inputs(s, d)
        return keep_best_per_cluster(scored, edges, score_col="score")

    def _heavy_hitter_topk(s, d):
        # r12: the full two-phase sketch over documents (MG Arrow stage
        # + broadcast-candidate exact recount + global top-20 window)
        from kafka_streams_task_spark.operators.sketch import (
            topk_tokens_sketched,
        )

        return topk_tokens_sketched(
            load_table(s, d, "documents"), k=20, capacity=4096
        )

    def _cms_freq(s, d):
        # r13: full-corpus CMS (constant depth x width key domain) +
        # estimates for the doc_id % 97 probe tokens
        from kafka_streams_task_spark.operators.sketch import (
            cms_estimate,
            count_min_table,
        )

        docs = load_table(s, d, "documents")
        cms = count_min_table(docs, depth=4, width=4096)
        probes = (
            docs.filter(F.col("doc_id") % 97 == 0)
            .select(
                F.explode(
                    F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+")
                ).alias("token")
            )
            .filter(F.col("token") != "")
            .distinct()
        )
        return cms_estimate(cms, probes)

    def _dd_quantiles(s, d):
        # r14: full-corpus DDSketch over l_extendedprice (bounded bucket
        # domain, one bounded shuffle) + the 7-point quantile walk
        from kafka_streams_task_spark.operators.sketch import (
            dd_quantiles,
            dd_sketch_table,
        )

        li = load_table(s, d, "lineitem")
        sk = dd_sketch_table(li, "l_extendedprice", gamma=1.02)
        return dd_quantiles(
            sk, [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99], gamma=1.02
        )

    def _hll_distinct(s, d):
        # r14: HLL register build over 600k l_partkey values (constant
        # 1024-register domain, one bounded shuffle) + the estimate
        from kafka_streams_task_spark.operators.sketch import (
            hll_cardinality,
            hll_register_table,
        )

        li = load_table(s, d, "lineitem")
        return hll_cardinality(hll_register_table(li, "l_partkey", b=10), b=10)

    def _hll_grouped(s, d):
        # r15: grouped HLL — per-event_type register tables over
        # events.user_id in one pass (bounded |groups| x 1024 key
        # domain, one bounded shuffle) + the per-group estimate
        from kafka_streams_task_spark.operators.sketch import (
            hll_cardinality_grouped,
            hll_register_table_grouped,
        )

        ev = load_table(s, d, "events")
        return hll_cardinality_grouped(
            hll_register_table_grouped(ev, "event_type", "user_id", b=10),
            b=10,
        )

    def _theta_overlap(s, d):
        # r16: KMV theta sketch corpus overlap — build both cohort
        # sketches (bounded per-partition fold, shuffle <= k*partitions
        # rows) and estimate |A ∩ B| from the two k-row summaries
        from kafka_streams_task_spark.operators.sketch import (
            theta_intersect,
            theta_sketch_table,
        )

        ev = load_table(s, d, "events")

        def cohort(t):
            return ev.filter(
                (F.col("event_type") == t)
                & F.col("user_id").isNotNull()
                & F.col("ts").isNotNull()
            ).select(
                F.concat_ws(
                    ":", F.col("user_id"), F.col("ts").cast("date").cast("string")
                ).alias("ud")
            )

        sa = theta_sketch_table(cohort("purchase"), "ud", k=512)
        sb = theta_sketch_table(cohort("click"), "ud", k=512)
        return theta_intersect(sa, sb, k=512)

    def _asof_nearest(s, d):
        # r12: the nearest-direction as-of join — one shuffle, one sort,
        # two window channels over purchases x deduped clicks
        from kafka_streams_task_spark.operators.asof import asof_join

        e = load_table(s, d, "events")
        purchases = e.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        clicks = (
            e.filter(F.col("event_type") == "click")
            .groupBy("user_id", "ts")
            .agg(F.max("event_id").alias("event_id"))
            .select("event_id", "user_id", "ts")
        )
        return asof_join(
            purchases, clicks, on="ts", by="user_id", direction="nearest"
        )

    def _stat_audit(s, d):
        # r10 fourth wave: Benford digit agg + chi-square contingency
        # over 100k events
        from kafka_streams_task_spark.operators.audit_stats import (
            benford_audit,
            chi_square_contingency,
        )

        ev = load_table(s, d, "events").select(
            "event_type",
            (F.col("user_id") % 3).alias("cohort"),
            F.col("value").cast("double"),
        )
        bf = benford_audit(ev, "value").agg(
            F.sum("chi2_term").alias("b")
        )
        chi = chi_square_contingency(ev, "event_type", "cohort").agg(
            F.sum("chi2_term").alias("c")
        )
        return bf.crossJoin(chi)

    def _soundex_blocks(s, d):
        # r10 fourth wave: the phonetic key chain (regex strip + code
        # translate + 7 collapse regexes) over every distinct document
        # word, then the block histogram
        from kafka_streams_task_spark.functions.phonetic import (
            soundex_expr,
        )

        # opt-r16 (guide §2.5): the split/explode/distinct-partial chain
        # fused into the single-split scan ran 2.1-2.6s in ONE task; fan
        # the projected text column out first. explode_outer + the
        # existing w != "" filter (null w fails it too) instead of plain
        # explode, so the inferred size() filter can't sink below the
        # exchange with the split chain substituted in. Same rows.
        from kafka_streams_task_spark.schemas import fan_out_scan

        words = (
            fan_out_scan(load_table(s, d, "documents").select("text"))
            .select(F.explode_outer(F.split(F.lower("text"), "\\s+")).alias("w"))
            .filter(F.col("w").isNotNull() & (F.col("w") != ""))
            .distinct()
        )
        return words.select(soundex_expr("w").alias("sdx")).groupBy(
            "sdx"
        ).count()

    # one-time (untimed) fixture prep for the r9 entries: the snapshot-
    # diff table's two versions and the dense scorer's fitted model
    from pyspark.sql import SparkSession

    s0 = SparkSession.getActiveSession()
    from kafka_streams_task_spark.operators.dsir import dsir_fit
    from kafka_streams_task_spark.schemas import local_table
    from kafka_streams_task_spark.operators.snapshots import snapshot_write

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs0 = load_table(s0, sf_dir, "documents")
    shutil.rmtree(os.path.dirname(_SNAP_DIFF_TBL), ignore_errors=True)
    snapshot_write(s0, docs0, _SNAP_DIFF_TBL, mode="overwrite")
    v2 = (
        docs0.filter(F.col("doc_id") % 17 != 0)   # removals
        .withColumn(
            "text",
            F.when(F.col("doc_id") % 5 == 0,
                   F.concat(F.col("text"), F.lit(" EDITED")))
            .otherwise(F.col("text")),             # updates
        )
    )
    snapshot_write(s0, v2, _SNAP_DIFF_TBL, mode="overwrite")
    w_rows = dsir_fit(
        docs0.filter(F.col("source") == "src1"), docs0, n_features=1 << 13
    ).collect()
    _DSIR_WEIGHTS[0] = local_table(s0,
        w_rows, "idx long, log_ratio double, n_features long"
    )
    from kafka_streams_task_spark.operators.kn_lm import (
        kn_bigram_fit,
        kn_dense_model,
    )

    _KN_DENSE[0] = kn_dense_model(
        kn_bigram_fit(docs0.filter(F.col("source") == "src1"))
    )

    return {
        "warc_parse": _warc_parse,
        "robots_match": _robots_match,
        "bloom_decontaminate": _bloom_decontaminate,
        "psl_domains": _psl_domains,
        "assign_splits_events": _assign_splits_events,
        "snapshot_write_read": _snapshot_write_read,
        "dsir_select": _dsir_select,
        "html_extract": _html_extract,
        "export_training_shards": _export_training_shards,
        "snapshot_diff": _snapshot_diff,
        "crawl_delays": _crawl_delays,
        "warc_charset_report": _warc_charset_report,
        "dsir_score_dense": _dsir_score_dense,
        "image_phash_dedup": _image_phash_dedup,
        "video_phash_dedup": _video_phash_dedup,
        "audio_fp_dedup": _audio_fp_dedup,
        "kn_lm_perplexity": _kn_lm_perplexity,
        "classifier_eval": _classifier_eval,
        "corpus_drift": _corpus_drift,
        "kn_score_dense": _kn_score_dense,
        "retrieval_eval": _retrieval_eval,
        "pmi_collocations": _pmi_collocations,
        "score_buckets": _score_buckets,
        "unimax_alloc": _unimax_alloc,
        "decontam_embedding": _decontam_embedding,
        "privacy_kanon": _privacy_kanon,
        "timeseries_gapfill": _timeseries_gapfill,
        "geo_radius_join": _geo_radius_join,
        "soundex_blocks": _soundex_blocks,
        "jaro_winkler_verify": _jaro_winkler_verify,
        "anomaly_zscore": _anomaly_zscore,
        "quantile_normalize": _quantile_normalize,
        "markov_transitions": _markov_transitions,
        "trend_forecast": _trend_forecast,
        "cusum_shift": _cusum_shift,
        "robust_scale": _robust_scale,
        "stat_audit": _stat_audit,
        "unicode_tokens": _unicode_tokens,
        "containment_pairs": _containment_pairs,
        "compression_ratio": _compression_ratio,
        "quality_survivors": _quality_survivors,
        "asof_nearest": _asof_nearest,
        "heavy_hitter_topk": _heavy_hitter_topk,
        "cms_freq": _cms_freq,
        "dd_quantiles": _dd_quantiles,
        "hll_distinct": _hll_distinct,
        "hll_grouped": _hll_grouped,
        "theta_overlap": _theta_overlap,
    }


def _raw_ops():
    """Frozen r1 workloads for the approximate ops whose CATALOG entries
    became recall-gate queries in r2 (gates add planted corpora / brute-
    force comparison — strictly more work). Benching the raw operators
    keeps round-over-round deltas meaningful (BENCH_BASELINE_r1.md)."""
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.catalog.relational import (
        q3_shipping_priority,
        q5_local_supplier_volume,
        q6_revenue_df,
        q18_large_volume_customers,
    )
    from kafka_streams_task_spark.operators.dedup import (
        embedding_near_dup_pairs,
        minhash_lsh_candidates,
        semantic_dedup,
        simhash_near_dup_pairs,
    )
    from kafka_streams_task_spark.operators.tfidf import tfidf_top_terms
    from kafka_streams_task_spark.operators.similarity import (
        knn_ivf,
        knn_ivf_pq,
        knn_lsh,
    )
    from kafka_streams_task_spark.schemas import load_table

    def _emb_pair(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        return emb, emb.filter(F.col("vec_id") < 10)

    from kafka_streams_task_spark.functions.text import (
        gopher_quality_columns,
        pii_flags,
        quality_score,
        repetition_ratio,
    )

    def _quality_r1(s, d):
        # the r1 column set, frozen for round-over-round comparability; the
        # r2-widened catalog query (8 extra Gopher columns) benches as
        # text_quality_gopher
        docs = load_table(s, d, "documents")
        return docs.select(
            "doc_id",
            quality_score("text").alias("quality"),
            F.round(repetition_ratio("text") + 1e-09, 6).alias("rep_3gram"),
            *pii_flags("text"),
        )

    def _quality_gopher(s, d):
        docs = load_table(s, d, "documents")
        return docs.select("doc_id", *gopher_quality_columns("text"))

    def _repetition_gopher(s, d):
        from kafka_streams_task_spark.functions.text import gopher_repetition_table
        from kafka_streams_task_spark.schemas import fan_out_scan

        # opt-r16 (guide §2.5): the repetition signals are one map-only
        # mega-projection (array sorts + aggregates per row) — fused into
        # a single-split scan it ran serially; fan the projected columns
        # out first (no-op on multi-split tables). Scored via the factored
        # table form (same stats bit-for-bit): the single-projection
        # column form spent 0.9-1.4s/run in Catalyst planning over
        # duplicated subtrees (fresh-df noop 1.47s -> 0.61s).
        docs = fan_out_scan(load_table(s, d, "documents").select("doc_id", "text"))
        return gopher_repetition_table(docs, "text")

    def _exact_substring(s, d):
        from kafka_streams_task_spark.operators.dedup import duplicate_span_stats

        docs = load_table(s, d, "documents").select("doc_id", "text")
        return duplicate_span_stats(docs, span_n=8)

    def _sample_pack_r2(s, d):
        # frozen r2 workload: sample -> pack (the r4 catalog entry added a
        # chunking stage; benching the original chain keeps deltas
        # comparable with BENCH_r02/r03)
        from kafka_streams_task_spark.catalog.llm import _MIX_RATES, _PACK_BUDGET
        from kafka_streams_task_spark.operators.sampling import (
            hash_stratified_sample,
            pack_sequences,
        )

        docs = load_table(s, d, "documents").select("doc_id", "lang", "text")
        sampled = hash_stratified_sample(docs, _MIX_RATES, "lang", "doc_id")
        packed = pack_sequences(sampled, budget=_PACK_BUDGET, num_partitions=32)
        fills = packed.groupBy("pack_id").agg(
            F.sum("n_tokens").alias("fill"), F.count(F.lit(1)).alias("n_in_pack")
        )
        bad = fills.filter(
            (F.col("fill") > _PACK_BUDGET) & (F.col("n_in_pack") > 1)
        ).agg(F.count(F.lit(1)).alias("n_bad"))
        per_lang = (
            packed.join(sampled.select("doc_id", "lang"), on="doc_id")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("total_tokens"))
        )
        return per_lang.crossJoin(bad).select(
            "lang", "n_docs", "total_tokens", F.col("n_bad").alias("n_bad_packs")
        )

    def _session_window_r1(s, d):
        # frozen r1 workload: the native session_window query (its driver
        # slot merged into session_suite in r4)
        from kafka_streams_task_spark.catalog.pipeline import session_window_stats

        return session_window_stats(s, d)

    def _asof_r1(s, d):
        # frozen r1 workload: the plain backward as-of (its driver slot
        # folded into temporal_join_suite's 'asof' leg in r16)
        from kafka_streams_task_spark.catalog.pipeline import (
            asof_purchase_to_click,
        )

        return asof_purchase_to_click(s, d)

    # r6: these four catalog slots folded into family suites
    # (dedup_exact_family_suite / multimodal_suite / similarity_knn_suite);
    # benching the raw operators keeps the per-query baselines comparable.
    from kafka_streams_task_spark.catalog.llm import (
        dedup_exact_digest,
        dedup_ngram_jaccard,
        multimodal_image_features,
        similarity_knn_bruteforce,
    )

    # r13: these catalog slots folded into profile_agg_suite /
    # window_family_suite / text_profile_suite; same precedent — bench the
    # raw builders so the frozen r1 per-query baselines stay comparable.
    from kafka_streams_task_spark.catalog.llm import text_token_stats
    from kafka_streams_task_spark.catalog.relational import (
        stats_suite_by_flag,
        window_rank_running_suite,
    )

    return {
        "stats_suite_by_flag": stats_suite_by_flag,
        "window_rank_running_suite": window_rank_running_suite,
        "text_token_stats": text_token_stats,
        "q6_revenue_forecast": q6_revenue_df,  # r2: registered as q6_q19_filter_aggregates
        # r11: the TPC-H singles folded into tpch_qsuite; benching the
        # raw functions keeps the frozen r1 per-query baselines comparable
        "q3_shipping_priority": q3_shipping_priority,
        "q5_local_supplier_volume": q5_local_supplier_volume,
        "q18_large_volume_customers": q18_large_volume_customers,
        "dedup_exact_digest": dedup_exact_digest,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "multimodal_image_features": multimodal_image_features,
        "similarity_knn_bruteforce": similarity_knn_bruteforce,
        "text_quality_scores": _quality_r1,
        "text_quality_gopher": _quality_gopher,
        "text_repetition_gopher": _repetition_gopher,
        "dedup_exact_substring": _exact_substring,
        "sample_pack_pipeline": _sample_pack_r2,
        "session_window_stats": _session_window_r1,
        # r16: driver slot folded into temporal_join_suite's 'asof' leg;
        # bench the unregistered raw function (session_window precedent)
        "asof_purchase_to_click": _asof_r1,
        "dedup_minhash_lsh": lambda s, d: minhash_lsh_candidates(load_table(s, d, "documents")),
        "dedup_simhash": lambda s, d: simhash_near_dup_pairs(load_table(s, d, "documents")),
        "dedup_embedding_cosine": lambda s, d: embedding_near_dup_pairs(load_table(s, d, "embeddings")),
        "similarity_knn_lsh": lambda s, d: knn_lsh(*_emb_pair(s, d), k=5),
        # coarse_metric="l2" pins the workload IDENTITY these baselines
        # were frozen measuring (review r16): the r16 spherical default
        # targets clustered geometry; these entries run the near-uniform
        # driver embeddings, the same fixture the suite pins to l2
        "similarity_knn_ivf": lambda s, d: knn_ivf(
            *_emb_pair(s, d), k=5, coarse_metric="l2"
        ),
        "similarity_knn_ivf_pq": lambda s, d: knn_ivf_pq(
            *_emb_pair(s, d), k=5, n_probe=12, ks=64, rerank_k=96,
            coarse_metric="l2",
        ),
        # r5 operators: semantic_dedup at threshold 0.5 so the sf0.1 corpus
        # (max natural cosine ~0.6) produces real edges and the connected-
        # components grouping stage is exercised, not short-circuited
        "semantic_dedup": lambda s, d: semantic_dedup(
            load_table(s, d, "embeddings"), threshold=0.5
        ),
        "tfidf_top_terms": lambda s, d: tfidf_top_terms(
            load_table(s, d, "documents").select("doc_id", "text"), k=3
        ),
        "bm25_retrieval": _bm25,
        "classifier_score": _classifier_score,
        "cdc_merge": _cdc_merge,
        "pagerank_events": _pagerank_events,
        "jaccard_join_exact": _jaccard_join_exact,
    }


def _jaccard_join_exact(s, d):
    from kafka_streams_task_spark.operators.dedup import jaccard_join_prefix
    from kafka_streams_task_spark.schemas import load_table

    docs = load_table(s, d, "documents").select("doc_id", "text")
    return jaccard_join_prefix(docs, threshold=0.5)


def _pagerank_events(s, d):
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.operators.graph import pagerank
    from kafka_streams_task_spark.schemas import load_table

    ev = load_table(s, d, "events")
    ea = ev.select(F.col("event_id").alias("eid"), F.col("user_id").alias("src"))
    eb = ev.select(F.col("event_id").alias("eid2"), F.col("user_id").alias("dst"))
    edges = ea.join(eb, F.col("eid2") == F.col("eid") * 2).select("src", "dst")
    return pagerank(edges, n_iter=3, damping=0.75)


def _bm25(s, d):
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.functions.text import tokens
    from kafka_streams_task_spark.operators.tfidf import bm25_top_docs
    from kafka_streams_task_spark.schemas import load_table

    docs = load_table(s, d, "documents").select("doc_id", "text")
    queries = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens(F.col("text")), 1, 4), " ").alias("text"),
    )
    return bm25_top_docs(docs, queries, k=10)


def _classifier_score(s, d):
    # pure scoring throughput (the 100 TB path): hash -> pool -> weight
    # join -> margin; weights from the deterministic closed form the
    # catalog leg uses (training itself is GD-iterative, pinned by pytest)
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.operators.classifier import (
        hashed_features,
        logreg_score,
    )
    from kafka_streams_task_spark.schemas import load_table

    docs = load_table(s, d, "documents").select("doc_id", "text")
    weights = (
        hashed_features(docs, n_features=1 << 18)
        .select("idx")
        .distinct()
        .withColumn("w", ((F.col("idx") % 997) - 498) / F.lit(1000.0))
    )
    return logreg_score(docs, weights, n_features=1 << 18)


def _cdc_merge(s, d):
    from pyspark.sql import functions as F

    from kafka_streams_task_spark.operators.merge import (
        OP_DELETE,
        OP_UPSERT,
        apply_changes,
    )
    from kafka_streams_task_spark.schemas import load_table

    ev = load_table(s, d, "events").select("event_id", "user_id", "value")
    sevens = ev.filter(F.col("event_id") % 7 == 0)
    delta = (
        sevens.select(
            "event_id", "user_id", (F.col("value") + 1000.0).alias("value"),
            F.lit(OP_UPSERT).alias("op"), F.lit(1).alias("version"),
        )
        .unionByName(
            sevens.select(
                "event_id", "user_id", (F.col("value") + 2000.0).alias("value"),
                F.lit(OP_UPSERT).alias("op"), F.lit(2).alias("version"),
            )
        )
        .unionByName(
            ev.filter(F.col("event_id") % 10 == 0).select(
                "event_id", "user_id", "value",
                F.lit(OP_DELETE).alias("op"), F.lit(9).alias("version"),
            )
        )
    )
    return apply_changes(ev, delta, ["event_id"])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from kafka_streams_task_spark.catalog import CATALOG
    from kafka_streams_task_spark.plans import get_spark

    spark = get_spark(app_name="bench")

    # warm the JVM once: codegen compiler, parquet reader, shuffle, Python
    # worker pool (each query is then measured on a warm engine)
    spark.range(1000).count()
    warm = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    warm.groupBy("l_returnflag").count().collect()
    warm.selectExpr("l_orderkey").distinct().count()
    # actually spawn the per-core Python workers (identity mapInPandas over
    # one partition per core) — otherwise the first Arrow-stage query is
    # charged ~2-3s of one-time worker startup
    n_part = spark.sparkContext.defaultParallelism
    spark.range(0, n_part * 10, 1, n_part).mapInPandas(
        lambda it: it, "id long"
    ).count()

    # r9 (VERDICT r8 item 2): host-speed calibration — a FIXED CPU-bound
    # probe (the frozen geohash codegen expression over a generated
    # frame: pure JVM whole-stage codegen, zero IO, zero Python, one
    # trivial final aggregate). Three rounds litigated uniform no-code-
    # change drifts (r6 up, r7 down, r8 up: same-host interference);
    # calib_sec makes that drift measurable: comparing rounds, divide
    # each round's totals by (calib_sec / frozen baseline calib_sec)
    # before reading anything as a regression. min-of-2 like every
    # other entry; the probe never counts toward any total.
    from pyspark.sql import functions as F_sql

    from kafka_streams_task_spark.functions.geohash import geohash_expr

    def _calib_once() -> float:
        t0 = time.time()
        frame = spark.range(0, 4_000_000, 1, n_part).select(
            ((F_sql.col("id") % 1_800_000) / 10_000.0 - 90.0).alias("lat"),
            ((F_sql.col("id") % 3_600_000) / 10_000.0 - 180.0).alias("lng"),
        )
        frame.select(geohash_expr("lat", "lng", 6).alias("g")).agg(
            F_sql.max("g"), F_sql.min("g"), F_sql.count(F_sql.lit(1))
        ).collect()
        return round(time.time() - t0, 3)

    calib_sec = min(_calib_once(), _calib_once())
    print(f"# calib_sec: {calib_sec}", file=sys.stderr)

    # r12 (VERDICT r11 item 3): a SECOND frozen probe exercising what the
    # CPU probe is blind to — shuffle write/read + parquet encode/decode
    # (r11's headline rose 5.5% raw while calib_sec improved 21%: the
    # pure-codegen probe cannot see IO/shuffle-side host drift, so
    # normalizing by it alone over-corrects). Fixed workload: 1M rows,
    # hash-repartition on a 1000-key column, parquet round-trip to local
    # disk, two-level aggregate. min-of-2; never counts toward any total.
    # Two-probe rule (BENCH_BASELINE_r1.md): codegen-bound comparisons
    # normalize by calib_sec; shuffle/IO-heavy comparisons by
    # calib_io_sec; a drift that survives BOTH normalizations is code.
    import shutil
    import tempfile

    def _calib_io_once() -> float:
        d = tempfile.mkdtemp(prefix="bench_calib_io_")
        try:
            t0 = time.time()
            frame = spark.range(0, 1_000_000, 1, n_part).select(
                F_sql.col("id"),
                (F_sql.col("id") % 1000).alias("k"),
                F_sql.md5(F_sql.col("id").cast("string")).alias("payload"),
            )
            frame.repartition(32, "k").write.mode("overwrite").parquet(f"{d}/t")
            spark.read.parquet(f"{d}/t").groupBy("k").agg(
                F_sql.count(F_sql.lit(1)).alias("n"),
                F_sql.max("payload").alias("mx"),
            ).agg(F_sql.count(F_sql.lit(1)), F_sql.max("mx")).collect()
            return round(time.time() - t0, 3)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    calib_io_sec = min(_calib_io_once(), _calib_io_once())
    print(f"# calib_io_sec: {calib_io_sec}", file=sys.stderr)

    # r14 (VERDICT r13 item 3): a THIRD frozen probe for the resource the
    # first two are blind to — the Python-worker/Arrow lane. The r13
    # driver run drifted 1.2-1.4x uniformly on scan/shuffle queries while
    # calib_sec read FASTER and calib_io_sec flat, i.e. neither probe
    # carried the drifting resource; the common denominator of the top
    # movers (multimodal decode, LSH matmuls, WARC parse) is Arrow
    # batch transfer + pandas compute in Python workers. Fixed workload:
    # 2M generated rows with an md5 payload through one mapInPandas
    # round-trip (JVM -> Arrow -> pandas transform -> Arrow -> JVM) into
    # a trivial final aggregate. Workers are already spawned by the
    # warm-up above, so this measures steady-state lane throughput, not
    # spin-up. min-of-2; never counts toward any total. Three-probe rule
    # (BENCH_BASELINE_r1.md): Python/Arrow-stage comparisons normalize
    # by calib_py_sec; a drift surviving ALL applicable probes is code.
    def _calib_py_once() -> float:
        t0 = time.time()
        frame = spark.range(0, 2_000_000, 1, n_part).select(
            F_sql.col("id"),
            F_sql.md5(F_sql.col("id").cast("string")).alias("payload"),
        )

        def _transform(it):
            for pdf in it:
                pdf["h"] = pdf["payload"].str.len() + (pdf["id"] % 7)
                yield pdf[["id", "h"]]

        frame.mapInPandas(_transform, "id long, h long").agg(
            F_sql.count(F_sql.lit(1)), F_sql.max("h")
        ).collect()
        return round(time.time() - t0, 3)

    calib_py_sec = min(_calib_py_once(), _calib_py_once())
    print(f"# calib_py_sec: {calib_py_sec}", file=sys.stderr)

    # r15 fourth probe (the residual candidate the r14 end-probe addendum
    # named): a scan over PRE-EXISTING fixture files — parquet decode +
    # column scan of the same on-disk bytes the real queries read, so it
    # carries the storage-side state (page-cache residency of the
    # fixtures, filesystem readahead) that the synthetic probes cannot:
    # calib_io_sec writes FRESH files (always page-hot), calib_sec and
    # calib_py_sec touch no storage at all. Fixed workload: full scan +
    # aggregate over documents + lineitem at the bench sf. min-of-2;
    # never counts toward any total. Frozen r15 reference: the value in
    # BENCH_r15.json (first round it exists — the family convention).
    def _calib_scan_once() -> float:
        t0 = time.time()
        spark.read.parquet(f"{sf_dir}/documents.parquet").agg(
            F_sql.count(F_sql.lit(1)), F_sql.max("text"), F_sql.max("doc_id")
        ).collect()
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").agg(
            F_sql.count(F_sql.lit(1)),
            F_sql.max("l_shipdate"),
            F_sql.sum("l_extendedprice"),
        ).collect()
        return round(time.time() - t0, 3)

    calib_scan_sec = min(_calib_scan_once(), _calib_scan_once())
    print(f"# calib_scan_sec: {calib_scan_sec}", file=sys.stderr)

    # Each query runs twice in the same session: run 1 pays one-time JVM
    # codegen/JIT compilation of that query's generated classes (seconds of
    # driver-side latency that a long-lived cluster amortizes to zero); run 2
    # is steady-state. "queries"/"value" report the per-query MIN of the two
    # runs — the standard noise-robust estimator; this host shows one-sided
    # multi-second outliers (periodic external activity) that land on a
    # different query each invocation. Both raw runs stay visible in
    # "run1_queries"/"run2_queries".
    raw = _raw_ops()
    ops = _ops_workloads()
    all_runs: dict[str, list[float]] = {}
    n_trials: dict[str, int] = {}
    calib_mid: dict[str, float] = {}
    for name in HEADLINE + OPS_SECTION:
        if name == OPS_SECTION[0] and not calib_mid:
            # r15 MID-RUN probes, between the headline and ops sections:
            # the start/end bracket cannot see a transient interference
            # window that opens mid-run and closes before the sweep ends
            # — the r15 in-round run showed exactly that shape (quintile
            # geomeans 0.65/0.84/1.18/1.48/1.00 vs frozen, with start
            # AND end probes flat; BENCH_BASELINE_r1.md r15 worked
            # example). A third position sample turns the probe series
            # into a coarse timeline: flags in a section whose nearest
            # probes are inflated normalize by THOSE probes.
            calib_mid["calib_sec_mid"] = min(_calib_once(), _calib_once())
            calib_mid["calib_py_sec_mid"] = min(
                _calib_py_once(), _calib_py_once()
            )
            print(f"# calib_mid: {calib_mid}", file=sys.stderr)
        if name in ops:
            fn = ops[name]
        else:
            fn = raw[name] if name in raw else CATALOG[name].fn

        def timed_run() -> tuple[float, int]:
            # clear persisted operator indexes before EACH timed run: every
            # measurement is a full isolated execution, and cached blocks from
            # 25 queries don't pile up in the unified memory manager and
            # squeeze execution memory for later queries (observed: mid-run
            # 10x slowdowns, "Asked to cache already cached data" warnings)
            spark.catalog.clearCache()
            t0 = time.time()
            rows = fn(spark, sf_dir).count()
            return round(time.time() - t0, 3), rows

        # run 1 pays one-time JVM codegen/JIT of this query's generated
        # classes (a long-lived cluster amortizes that to zero); run 2 is
        # steady-state. If the min of the two still exceeds RETRY_FACTOR x
        # the frozen baseline, the sample window almost certainly overlapped
        # one of this host's multi-second interference events (r3 recorded
        # 22.2 s for a query that re-measures at 2.0 s steady-state), so take
        # up to MAX_EXTRA_TRIALS more samples. min over all trials is
        # reported; a real regression survives the retries.
        runs = []
        t, n = timed_run()
        runs.append(t)
        t, n = timed_run()
        runs.append(t)
        base = BASELINE_SEC.get(name, OPS_BASELINE_SEC.get(name, float("inf")))
        gate = RETRY_FACTOR * base
        while min(runs) > gate and len(runs) < 2 + MAX_EXTRA_TRIALS:
            print(
                f"# {name}: min-of-{len(runs)} {min(runs)}s exceeds "
                f"2x baseline ({base}s) — retrying",
                file=sys.stderr,
            )
            t, n = timed_run()
            runs.append(t)
        all_runs[name] = runs
        n_trials[name] = len(runs)
        print(
            f"# {name}: min {min(runs)}s of {runs} ({n} rows)",
            file=sys.stderr,
        )

    # r14: re-measure the CPU and Python-lane probes AFTER the full query
    # sweep. The probes run on a fresh session; the ops section runs ~70
    # queries later on an aged one (JVM heap fragmentation, GC pressure,
    # Python-worker-pool state). A start-vs-end probe delta makes
    # session-aging drift measurable and separable from host drift —
    # the r14 closing run's uniform ops drift was invisible to all three
    # START-of-run probes, which is exactly the gap these close.
    calib_sec_end = min(_calib_once(), _calib_once())
    calib_py_sec_end = min(_calib_py_once(), _calib_py_once())
    calib_scan_sec_end = min(_calib_scan_once(), _calib_scan_once())
    print(
        f"# calib_sec_end: {calib_sec_end} calib_py_sec_end: {calib_py_sec_end}"
        f" calib_scan_sec_end: {calib_scan_sec_end}",
        file=sys.stderr,
    )

    best = {k: min(v) for k, v in all_runs.items() if k in HEADLINE}
    ops_best = {k: min(v) for k, v in all_runs.items() if k in OPS_SECTION}
    total = round(sum(best.values()), 3)
    ops_total = round(sum(ops_best.values()), 3)
    # raw per-run breakdowns go to stderr: the driver keeps only a bounded
    # tail of stdout and parses the LAST line as JSON — r2's single line with
    # run1/run2 embedded overflowed that buffer and recorded parsed=null
    print(f"# all_runs: {json.dumps(all_runs)}", file=sys.stderr)
    retried = {k: v for k, v in n_trials.items() if v > 2}
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": best,
                "sf": sf,
                "timing": "min_of_2_runs_retry_on_2x_baseline",
                "retried": retried,
                # r9 host-speed calibration (frozen geohash codegen
                # probe, min-of-2): normalize cross-round comparisons by
                # calib_sec / <frozen r9 value in BENCH_BASELINE_r1.md>
                "calib_sec": calib_sec,
                # r12 second probe: shuffle+parquet round-trip (see the
                # two-probe rule in BENCH_BASELINE_r1.md)
                "calib_io_sec": calib_io_sec,
                # r14 third probe: mapInPandas/Arrow lane round-trip (the
                # resource the r13 uniform drift rode — see the
                # three-probe rule in BENCH_BASELINE_r1.md)
                "calib_py_sec": calib_py_sec,
                # r14: the same two probes re-measured AFTER the sweep —
                # end/start ratio isolates session-aging drift (heap/GC/
                # worker-pool state) from host drift; ops-section
                # comparisons normalize by the END values when the ratio
                # exceeds ~1.2 (BENCH_BASELINE_r1.md)
                "calib_sec_end": calib_sec_end,
                "calib_py_sec_end": calib_py_sec_end,
                # r15 fourth probe: pre-existing-fixture scan (storage-
                # side state — page-cache residency, readahead), start
                # and end; frozen reference = BENCH_r15.json
                "calib_scan_sec": calib_scan_sec,
                "calib_scan_sec_end": calib_scan_sec_end,
                # r15 mid-run probes (between headline and ops sections):
                # position resolution for transient interference windows
                # the start/end bracket cannot see
                **calib_mid,
                # r8 non-headline ops section (r7 crawl/compliance/
                # versioning surface); excluded from "value" so the
                # headline total stays round-over-round comparable
                "ops_queries": ops_best,
                "ops_total": ops_total,
            }
        ),
        # r17 (VERDICT r16 item 3): the receipt contract is ONE JSON
        # object as the FINAL stdout line — flush it explicitly so a
        # driver that kills or snapshots the process right after the
        # sweep can never lose the line to block buffering (the r15
        # record parsed null; nothing else writes to stdout after this)
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
