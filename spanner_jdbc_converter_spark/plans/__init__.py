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
# order. Rounds 1-2 only ever gated the relational corpus, so rotate the 44
# extension entries (dedup / similarity / text / multimodal / selection / ETL /
# streaming twins / scalar surfaces) to the front; the relational entries stay
# behind them and remain covered by tests/test_oracle_parity.py.
_GATE_PRIORITY = [
    "grouping_sets_priority_status",
    "events_banded_range_join",
    "events_hypertable_rollup",
    "skew_salted_aggregation",
    "string_functions_extended",
    "conditional_null_surface",
    "array_functions_surface",
    "map_functions_surface",
    "text_top_tokens",
    "notin_null_semantics",
    "date_functions_surface",
    "text_token_stats",
    "text_quality_scores",
    "text_lang_id",
    "text_bpe_tokens_fingerprint",
    "dedup_fingerprint_groups",
    "dedup_minhash_signatures",
    "dedup_lsh_candidates",
    "dedup_jaccard_pairs",
    "dedup_connected_groups",
    "dedup_simhash_near_pairs",
    "sim_topk_cosine",
    "sim_lsh_ann_topk",
    "sim_ivf_topk",
    "sim_embedding_near_pairs",
    "multimodal_media_summary",
    "multimodal_feature_extract",
    "events_json_props",
    "vector_column_stats",
    "dedup_exact_rows",
    "multimodal_frame_sample",
    "copy_incremental_diff",
    "copy_merge_upsert",
    "select_stratified_sample",
    "select_token_budget",
    "dedup_survivor_docs",
    "select_pack_sequences",
    "sim_quantized_topk",
    "events_tumbling_hourly",
    "events_sliding_windows",
    "events_session_windows",
    "events_interval_join",
    "events_user_totals",
    "events_asof_join",
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
