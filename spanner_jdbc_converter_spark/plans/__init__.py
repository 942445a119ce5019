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
# list is the round-10 window, derived verbatim from that proposal after
# the r9 rounds were recorded, and tests/test_config.py asserts the
# window stays consistent with the history):
#   (0) all 19 entries whose last driver row is r5 — the stale tail
#       VERDICT r9 "Next round #1" requires front-loaded (the r9 window
#       was mistakenly NOT rotated, so these are 4 driver-rounds stale);
#   (1) the oldest r6 entries, in proposal (registration) order, trimmed
#       so the list is EXACTLY the 50-slot window — membership explicit,
#       not positional.  After this window lands, nothing in the corpus
#       is older than r6.
# RULE (VERDICT r6 #3): any entry registered mid-round is appended to this
# list IN THE SAME COMMIT (inside the first 50, displacing the newest tail
# entries of group (1)) and the final commit of the round re-runs the
# proposal so the frozen window always contains every never-checked entry —
# a round must mint zero new never-checked entries.
_GATE_PRIORITY = [
    # (0) last driver row r5 (all 19 — the stale tail, proposal order)
    "events_sessionization",
    "events_markov_transitions",
    "events_mad_outliers",
    "events_hourly_resample_ffill",
    "events_lag1_autocorr",
    "events_session_features",
    "events_seasonal_deviation",
    "text_bm25_ranking",
    "select_interleave_sources",
    "join_copurchase_lift",
    "agg_cms_heavy_hitters",
    "agg_decile_binning",
    "events_time_weighted_avg",
    "graph_pagerank_brands",
    "agg_incremental_rollup_merge",
    "agg_cms_join_cardinality",
    "join_bloom_prefilter",
    "events_latest_per_user",
    "agg_hll_hourly_users",
    # (1) last driver row r6, proposal order
    "q11_important_parts",
    "grouping_sets_priority_status",
    "events_banded_range_join",
    "events_hypertable_rollup",
    "skew_salted_aggregation",
    "text_quality_scores",
    "text_lang_id",
    "text_bpe_tokens_fingerprint",
    "dedup_connected_groups",
    # (2) registered in r10 (the RULE above): the nineteen never-checked
    # new entries take the tail slots, displacing copy_incremental_diff/
    # copy_merge_upsert/multimodal_video_decode/multimodal_pgm_decode/
    # multimodal_wav_decode/multimodal_frame_sample/dedup_exact_rows/
    # vector_column_stats/multimodal_media_summary/
    # multimodal_feature_extract/sim_embedding_near_pairs_lsh/
    # dedup_simhash_near_pairs/sim_ivf_topk/sim_embedding_near_pairs/
    # sim_lsh_ann_topk/sim_topk_cosine/dedup_jaccard_pairs/
    # dedup_lsh_candidates/dedup_minhash_signatures/
    # dedup_fingerprint_groups/text_top_tokens/text_token_stats (all
    # r6 — the histogram stays "nothing older than r6").
    "dedup_semantic_clusters",
    "dedup_span_contamination",
    "dedup_benchmark_span_hits",
    "select_leakage_safe_split",
    "report_source_data_card",
    "text_bpe_merges",
    "text_bpe_segment",
    "text_boilerplate_scrub",
    "text_bigram_surprisal",
    "sim_hard_negatives",
    "text_tokenizer_fertility",
    "text_bpe_encode",
    "text_quality_classifier",
    "select_dsir_importance",
    "dedup_quality_keeper",
    "text_ngram_novelty",
    "select_pack_bpe_sequences",
    "validate_quality_drift",
    "select_epoch_shuffle",
    "events_cusum_alarms",
    "sim_mmr_rerank",
    "cluster_kcenter_coreset",
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
