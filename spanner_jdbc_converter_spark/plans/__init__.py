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
# list is the round-16 window, derived verbatim from that proposal after
# GATE_HISTORY was regenerated from CORRECTNESS_r15 as the FIRST commit of
# the round per VERDICT r15 "Next round #2"; tests/test_config.py asserts
# the window stays consistent with the history):
#   the 50 entries whose last driver row is r11 — the staleness front
#   (the 8 entries displaced from r15's window by its registrations lead
#   this list) — after this round no entry is older than r12-checked.
# RULE (VERDICT r6 #3): any entry registered mid-round is appended to this
# list IN THE SAME COMMIT (inside the first 50, displacing the newest tail
# entries) and the final commit of the round re-runs the proposal so the
# frozen window always contains every never-checked entry — a round must
# mint zero new never-checked entries.
_GATE_PRIORITY = [
    "join_bucketed_colocated",
    "text_top_tokens",
    "text_token_stats",
    "text_mixed_lang_windows",
    "dedup_winnow_fingerprints",
    "dedup_winnow_pairs",
    "dedup_fingerprint_groups",
    "dedup_minhash_signatures",
    "dedup_lsh_candidates",
    "dedup_jaccard_pairs",
    "validate_split_leakage",
    "dedup_simhash_near_pairs",
    "sim_topk_cosine",
    "sim_lsh_ann_topk",
    "sim_ivf_topk",
    "sim_embedding_near_pairs",
    "sim_embedding_near_pairs_lsh",
    "multimodal_media_summary",
    "multimodal_feature_extract",
    "vector_column_stats",
    "dedup_exact_rows",
    "multimodal_frame_sample",
    "multimodal_wav_decode",
    "multimodal_pgm_decode",
    "multimodal_png_decode",
    "multimodal_video_decode",
    "copy_incremental_diff",
    "copy_merge_upsert",
    "select_stratified_sample",
    "select_token_budget",
    "dedup_survivor_docs",
    "sim_quantized_topk",
    "sim_ann_recall_report",
    "pipeline_curate_report",
    "events_tumbling_hourly",
    "events_sliding_windows",
    "events_session_windows",
    "events_user_totals",
    "text_bigram_pmi",
    "cluster_silhouette_report",
    "ml_linear_probe",
    "vector_dim_profile",
    "events_level_shift_detect",
    "events_scd2_intervals",
    "events_first_touch_attribution",
    # r16 registrations (the RULE below): each displaces the newest
    # tail entry of the r11-stale block (displaced so far:
    # events_debounce, text_pii_scan_redact, text_pii_email_ip_redact,
    # select_length_bucketed_batches, select_curriculum_order — they
    # lead r17's window).
    "multimodal_jpeg_prog_decode",
    "sim_ivfpq_refine_topk",
    "graph_triangle_estimate",
    "multimodal_jpeg422_decode",
    "sim_residual_refine_topk",
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
