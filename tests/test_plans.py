"""Physical-plan regression tests — the scale contract, checked.

Correctness is the oracle harness's job; these tests pin the PLAN
properties that matter at 100 TB and would silently regress otherwise:
filters reaching the parquet scan, dimension broadcasts, exchange
counts of the dedup pipelines, and no accidental cartesian products.
"""

from __future__ import annotations

import pytest

from spanner_jdbc_converter_spark.plans import QUERIES


def _plan(spark, name: str, sf_dir: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(jmode)


def test_flagship_pushdown_and_broadcast(spark, sf_dir):
    plan = _plan(spark, "flagship_revenue_by_nation", sf_dir)
    # the order-date range must reach the orders scan (row-group skipping)
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "LessThan(o_orderdate" in plan
    # nation must broadcast — a shuffle of the fact side keyed on
    # nationkey would be the classic scale mistake
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q3_filters_pushed(spark, sf_dir):
    plan = _plan(spark, "q3_unshipped_topk", sf_dir)
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert "GreaterThan(l_shipdate" in plan
    # top-10 must be a TopK, not a global sort materialization
    assert "TakeOrderedAndProject" in plan


def test_minhash_single_exchange_pipeline(spark, sf_dir):
    """The signature pipeline promises: one hash(doc_id) exchange feeds
    window + per-doc aggregation; no other shuffle."""
    head = _plan(spark, "dedup_minhash_signatures", sf_dir).split("\n\n")[0]
    assert head.count("Exchange") <= 2  # window shuffle (+AQE node wrapper)
    assert "SortMergeJoin" not in head
    assert "CartesianProduct" not in head


def test_jaccard_is_inverted_index_not_all_pairs(spark, sf_dir):
    head = _plan(spark, "dedup_jaccard_pairs", sf_dir).split("\n\n")[0]
    # all-pairs would appear as a nested-loop/cartesian join
    assert "CartesianProduct" not in head
    assert "BroadcastNestedLoopJoin" not in head
    # single-scan postings: the corpus parquet is read at most twice
    # (once per self-join side), never four times
    assert head.count("Scan parquet") <= 2


def test_topk_cosine_broadcasts_queries_not_corpus(spark, sf_dir):
    plan = _plan(spark, "sim_topk_cosine", sf_dir)
    # the deliberate small-side broadcast exists, and the corpus side is
    # never exchanged before scoring (scores reduce via the window)
    assert "BroadcastExchange" in plan


def test_projection_prunes_scan_columns(spark, sf_dir):
    plan = _plan(spark, "p2_pk_only_projection", sf_dir)
    # PK-only projection must prune the scan schema (P2: true column
    # pruning, REF/data/TableDeleter.java:68)
    scan_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_schema, "no ReadSchema in plan"
    assert "l_comment" not in scan_schema[0]
    assert "l_extendedprice" not in scan_schema[0]


@pytest.mark.parametrize(
    "name",
    ["q10_returned_revenue", "q17_small_quantity_revenue", "join_order_counts_per_customer"],
)
def test_no_cartesian_anywhere(spark, sf_dir, name):
    assert "CartesianProduct" not in _plan(spark, name, sf_dir)
