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
# list IS that proposal's output for round 7, and tests/test_config.py
# asserts the window stays consistent with the history):
#   (0) the 12 entries with NO driver row yet — the 6 that registered
#       after the r6 window froze plus the 6 NEW r7 entries (pack
#       invariants, temperature mix, incremental batch dedup, token
#       spectrum, Zipf slope, source-overlap matrix), each added here in
#       its own registration commit per the rule below;
#   (1) the 7 r3-stale scalar-surface entries deferred from r6
#       (array/map/date/string functions, null semantics, JSON props);
#   (2) 31 of the 50 entries whose last driver row was r4 (the 5 new r7
#       registrations displaced q7/q8/q9/window_lead_next_event/
#       text_repetition_scores to r8 — the list is trimmed to EXACTLY the
#       50-slot window so membership is explicit, not positional).
# RULE (VERDICT r6 #3): any entry registered mid-round is appended to this
# list IN THE SAME COMMIT (inside the first 50) and the final commit of the
# round re-runs the proposal so the frozen window always contains every
# never-checked entry — a round must mint zero new never-checked entries.
_GATE_PRIORITY = [
    # (0) never driver-checked
    "agg_sampled_quantiles",
    "dedup_lsh_verified_pairs",
    "text_vocab_encode",
    "pipeline_pack_invariants",
    "select_source_cap",
    "events_ewma_smoothing",
    "events_user_trend",
    "select_temperature_mix",  # new r7, registered inside the window (rule above)
    "dedup_incremental_batch",  # new r7, same rule
    "text_token_spectrum",  # new r7, same rule
    "text_zipf_slope",  # new r7, same rule
    "dedup_source_overlap_matrix",  # new r7, same rule
    # (1) last driver row r3 (the deferred scalar surfaces)
    "string_functions_extended",
    "conditional_null_surface",
    "array_functions_surface",
    "map_functions_surface",
    "notin_null_semantics",
    "date_functions_surface",
    "events_json_props",
    # (2) last driver row r4, in registration order
    "flagship_revenue_by_nation",
    "s8_cardinality_probes",
    "w6_delete_strategy_probe",
    "p1_explicit_projection",
    "p2_pk_only_projection",
    "p4_composite_pk_range_scan",
    "w5_ranged_delete_survivors",
    "o1_o2_pk_ordered_chunk",
    "o3_offset_pagination",
    "a4_row_size_estimate",
    "q1_pricing_summary",
    "agg_distinct_custs_per_priority",
    "rollup_lineitem_status",
    "join_order_counts_per_customer",
    "join_anti_customers_without_recent_orders",
    "join_semi_suppliers_with_shipments",
    "join_full_outer_part_lineitem_brands",
    "setops_customer_segments",
    "window_top3_orders_per_segment",
    "scalar_function_surface",
    "q3_unshipped_topk",
    "q10_returned_revenue",
    "q17_small_quantity_revenue",
    "s1_catalog_column_scan",
    "window_event_interarrival",
    "cube_returnflag_status",
    "exists_suppliers_of_large_orders",
    "q2_min_acctbal_supplier_per_part",
    "q4_priority_with_returns",
    "q5_regional_supplier_volume",
    "q6_revenue_forecast",
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
