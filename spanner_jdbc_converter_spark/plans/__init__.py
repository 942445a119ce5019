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
# list is the round-8 window, derived from that proposal, and
# tests/test_config.py asserts the window stays consistent with the
# history):
#   (0) all 19 entries whose last driver row is r4 — the stale tail
#       VERDICT r7 "Next round #1" requires front-loaded, including the 5
#       displaced from the r7 window (q7/q8/q9/window_lead_next_event/
#       text_repetition_scores);
#   (1) 3 entries whose BEHAVIOR changes this round and therefore need a
#       fresh driver row even though they were checked r5–r7: the q20
#       pruned-aggregation fix (VERDICT "What's wrong #1"), the
#       incremental-dedup signature store (#3), and the
#       pipeline_curate_documents oracle upgrade from rows-only to
#       hash-checked (#4);
#   (2) the oldest r5 entries, in proposal (registration) order, trimmed
#       so the list is EXACTLY the 50-slot window — membership explicit,
#       not positional; the entries displaced by group (1) are named in
#       the trailing comment below the list.
# RULE (VERDICT r6 #3): any entry registered mid-round is appended to this
# list IN THE SAME COMMIT (inside the first 50) and the final commit of the
# round re-runs the proposal so the frozen window always contains every
# never-checked entry — a round must mint zero new never-checked entries.
_GATE_PRIORITY = [
    # (0) last driver row r4 (all 19 — the stale tail, proposal order)
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "window_lead_next_event",
    "text_repetition_scores",
    "text_top_token_per_doc",
    "text_chunk_windows",
    "dedup_benchmark_overlap",
    "dedup_chunk_groups",
    "validate_table_checksums",
    "validate_snapshot_diff",
    "validate_fk_orphans",
    "validate_column_profile",
    "select_mix_report",
    "text_vocab_df",
    "join_doc_embedding_features",
    "events_interval_join",
    "events_asof_join",
    "events_rolling_window_1h",
    # (1) behavior changes this round — need fresh driver rows
    "q20_significant_suppliers",
    "dedup_incremental_batch",
    "pipeline_curate_documents",
    # (2) last driver row r5, proposal order
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_predicate",
    "q22_prospect_segments",
    "q15_top_supplier",
    "q16_supplier_counts_excluding",
    "q21_sole_returned_supplier",
    "q12_priority_class_counts",
    "window_rank_surface",
    "window_running_frames",
    "agg_stats_moments",
    "agg_median_percentiles",
    "pivot_status_by_priority",
    "dedup_containment_pairs",
    "select_pack_sequences",
    "cluster_kmeans_embeddings",
    "text_tfidf_top_terms",
    "events_zscore_outliers",
    "agg_value_histogram",
    "join_fuzzy_blocked_names",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "agg_winsorized_stats",
    "agg_hll_distinct_custkeys",
    "text_bigram_stats",
    "select_quality_weighted_sample",
    "layout_zorder_cells",
    "select_train_val_test_split",
]
# Displaced to r9 by group (1)'s 3 behavior-change slots (they stay r5, which
# still satisfies "nothing older than r5"): events_sessionization,
# events_markov_transitions, events_mad_outliers.


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
