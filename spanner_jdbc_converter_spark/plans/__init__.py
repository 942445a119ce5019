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

# The driver's correctness gate checks the FIRST 50 entries in registration
# order; coverage rotates each round so every corpus half periodically gets a
# driver row (round 2: relational; round 3: the 44 extension entries — all
# green in CORRECTNESS_r03).  Round 4 front-loads (a) the four queries broken
# by the Spark-4 TIMESTAMP_NTZ regression, proving the fix under the driver,
# (b) the new validate_* copy-validation entries, and (c) the relational
# corpus, which last had driver rows in r02.  Entries past the 50-window stay
# covered by tests/test_oracle_parity.py, which runs the identical check.
_GATE_PRIORITY = [
    # (a) re-greened after the Spark-4 timestamp_ntz fix
    "events_interval_join",
    "events_asof_join",
    "window_event_interarrival",
    "window_lead_next_event",
    # (b) new copy-validation + data-quality surface
    "validate_table_checksums",
    "validate_snapshot_diff",
    "validate_fk_orphans",
    "validate_column_profile",
    "text_repetition_scores",
    "text_top_token_per_doc",
    "dedup_benchmark_overlap",
    "text_chunk_windows",
    "dedup_chunk_groups",
    "events_rolling_window_1h",
    "select_mix_report",
    "text_vocab_df",
    "join_doc_embedding_features",
    # (c) relational corpus (driver-gated r01/r02, de-gated in r03)
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
    "cube_returnflag_status",
    "exists_suppliers_of_large_orders",
    "q2_min_acctbal_supplier_per_part",
    "q4_priority_with_returns",
    "q5_regional_supplier_volume",
    "q6_revenue_forecast",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_predicate",
    "q22_prospect_segments",
    "q15_top_supplier",
    "q16_supplier_counts_excluding",
    "q20_significant_suppliers",
    "q21_sole_returned_supplier",
    "q12_priority_class_counts",
    "window_rank_surface",
    "window_running_frames",
    "agg_stats_moments",
    "agg_median_percentiles",
    "pivot_status_by_priority",
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
