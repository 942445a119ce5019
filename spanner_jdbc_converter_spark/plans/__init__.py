"""Query corpus: every operator from SURVEY.md §2 as a (PySpark fn, oracle SQL) pair.

Importing this package loads every corpus module into the shared registry.
"""

from spanner_jdbc_converter_spark.plans.registry import ORACLE, QUERIES, register  # noqa: F401
from spanner_jdbc_converter_spark.plans import queries as _queries  # noqa: F401,E402
from spanner_jdbc_converter_spark.plans import tpch_suite as _tpch_suite  # noqa: F401,E402
from spanner_jdbc_converter_spark.plans import windows_aggs as _windows_aggs  # noqa: F401,E402
from spanner_jdbc_converter_spark.plans import scalars as _scalars  # noqa: F401,E402
from spanner_jdbc_converter_spark.plans import extensions as _extensions  # noqa: F401,E402
from spanner_jdbc_converter_spark.plans import etl as _etl  # noqa: F401,E402
from spanner_jdbc_converter_spark.plans import streaming_queries as _streaming  # noqa: F401,E402
from spanner_jdbc_converter_spark.plans import mining as _mining  # noqa: F401,E402
from spanner_jdbc_converter_spark.plans import behavior as _behavior  # noqa: F401,E402
from spanner_jdbc_converter_spark.plans import curation as _curation  # noqa: F401,E402
from spanner_jdbc_converter_spark.plans import features as _features  # noqa: F401,E402

# The driver's correctness gate checks the FIRST 50 entries in registration
# order; coverage rotates each round so every entry periodically gets a
# driver row.  Per-entry staleness is machine-tracked in GATE_HISTORY.json
# (regenerate with `python scripts/gate_history.py --propose 50` — this
# list is the round-15 window, derived verbatim from that proposal after
# GATE_HISTORY was regenerated from CORRECTNESS_r14 as the FIRST commit of
# the round per VERDICT r14 "Next round #3"; tests/test_config.py asserts
# the window stays consistent with the history):
#   (0) the 42 entries whose last driver row is r10 — the staleness tail
#       VERDICT r14 names explicitly (agg_cms_*, agg_decile_binning,
#       agg_hll_hourly_users, ...) — after this round no entry is older
#       than 4 rounds unchecked;
#   (1) the 8 oldest r11 entries, proposal order;
#   (2) every entry registered THIS round — membership explicit, the
#       list is EXACTLY the 50-slot window.
# RULE (VERDICT r6 #3): any entry registered mid-round is appended to this
# list IN THE SAME COMMIT (inside the first 50, displacing the newest tail
# entries of group (1)) and the final commit of the round re-runs the
# proposal so the frozen window always contains every never-checked entry —
# a round must mint zero new never-checked entries.
_GATE_PRIORITY = [
    # (0) last driver row r10 (the 42-entry stale tail, proposal order)
    "dedup_benchmark_span_hits",
    "dedup_span_contamination",
    "dedup_connected_groups",
    "select_leakage_safe_split",
    "dedup_quality_keeper",
    "sim_hard_negatives",
    "sim_mmr_rerank",
    "dedup_semantic_clusters",
    "text_bpe_merges",
    "text_bpe_segment",
    "text_boilerplate_scrub",
    "text_bigram_surprisal",
    "text_tokenizer_fertility",
    "text_bpe_encode",
    "text_quality_classifier",
    "validate_quality_drift",
    "select_pack_bpe_sequences",
    "text_ngram_novelty",
    "select_dsir_importance",
    "cluster_kcenter_coreset",
    "events_sessionization",
    "events_markov_transitions",
    "events_mad_outliers",
    "events_hourly_resample_ffill",
    "events_lag1_autocorr",
    "events_session_features",
    "events_seasonal_deviation",
    "events_cusum_alarms",
    "text_bm25_ranking",
    "select_interleave_sources",
    "join_copurchase_lift",
    "report_source_data_card",
    "select_epoch_shuffle",
    "agg_cms_heavy_hitters",
    "agg_decile_binning",
    "events_time_weighted_avg",
    "graph_pagerank_brands",
    "agg_incremental_rollup_merge",
    "agg_cms_join_cardinality",
    "join_bloom_prefilter",
    "events_latest_per_user",
    "agg_hll_hourly_users",
    # (1) last driver row r11 (oldest-first, proposal order; displaced
    # so far by r15 registrations: dedup_fingerprint_groups,
    # dedup_minhash_signatures, dedup_winnow_pairs,
    # dedup_winnow_fingerprints, text_mixed_lang_windows,
    # text_token_stats, text_top_tokens, join_bucketed_colocated —
    # group (1) fully displaced; all eight r11 entries rotate to r16)
    # (2) registered in r15 (the RULE above): each new entry displaces the
    # newest tail entry of group (1) in the same commit it registers.
    "multimodal_jpeg_decode",
    "dedup_jpeg_image_pairs",
    "text_crossdoc_scrub",
    "validate_stream_disorder",
    "graph_triangle_coeffs",
    "text_pii_contact_redact",
    "select_weighted_reservoir",
    "multimodal_jpeg420_decode",
]


def _rotate_gate_window() -> None:
    missing = [n for n in _GATE_PRIORITY if n not in QUERIES]
    if missing:  # a rename upstream should fail loudly, not silently de-gate
        raise RuntimeError(f"gate-priority entries missing from registry: {missing}")
    ordered = _GATE_PRIORITY + [n for n in QUERIES if n not in set(_GATE_PRIORITY)]
    for mapping in (QUERIES, ORACLE):
        snapshot = dict(mapping)
        mapping.clear()
        mapping.update({n: snapshot[n] for n in ordered if n in snapshot})


_rotate_gate_window()

__all__ = ["QUERIES", "ORACLE", "register"]
