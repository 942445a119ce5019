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
    [
        "q10_returned_revenue",
        "q17_small_quantity_revenue",
        "join_order_counts_per_customer",
        "q2_min_acctbal_supplier_per_part",
        "q7_volume_shipping",
        "q8_market_share",
        "q9_product_profit",
        "q15_top_supplier",
        "q16_supplier_counts_excluding",
        "q18_large_volume_customers",
        "q20_significant_suppliers",
        "text_top_tokens",
    ],
)
def test_no_cartesian_anywhere(spark, sf_dir, name):
    assert "CartesianProduct" not in _plan(spark, name, sf_dir)


def test_q5_broadcasts_dims_and_pushes_dates(spark, sf_dir):
    plan = _plan(spark, "q5_regional_supplier_volume", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan  # range reaches orders scan
    assert "CartesianProduct" not in plan


def test_q6_whole_predicate_pushed(spark, sf_dir):
    plan = _plan(spark, "q6_revenue_forecast", sf_dir)
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity" in plan


def test_q19_disjunction_still_hash_join(spark, sf_dir):
    # the OR-of-ANDs must not demote the p_partkey equi-join to a
    # nested-loop — Catalyst extracts the common key, residual post-join
    plan = _plan(spark, "q19_disjunctive_predicate", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q21_decorrelates_to_semi_and_anti(spark, sf_dir):
    plan = _plan(spark, "q21_sole_returned_supplier", sf_dir)
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_interval_join_keeps_equi_key(spark, sf_dir):
    # user_id equi-condition must anchor a hash/merge join; the time
    # bounds are residual predicates, not a nested-loop driver
    plan = _plan(spark, "events_interval_join", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_similarity_kernels_are_arrow_batched(spark, sf_dir):
    # regression gates for the measured 3-10x interpreted-HOF cliffs:
    # bucket keys via one pandas UDF, pair scoring via mapInPandas
    assert "ArrowEvalPython" in _plan(spark, "sim_lsh_ann_topk", sf_dir)
    assert "MapInPandas" in _plan(spark, "sim_embedding_near_pairs", sf_dir)


def test_pq_topk_broadcasts_queries_single_shuffle(spark, sf_dir):
    """PQ promises: the LUT-carrying query frame broadcasts over the
    encoded corpus (BNLJ, never a shuffled cartesian), the corpus is
    never exchanged before scoring, and the only shuffle is the
    per-query rank — with map-side WindowGroupLimit pruning to k rows
    per query before it."""
    plan = _plan(spark, "sim_pq_topk", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles <= 2  # the query_id rank exchange (tree + detail line)
    assert "WindowGroupLimit" in plan
    # regression gate for the measured 14 s interpreted-encode cliff:
    # the per-subspace arg-min must ride the Arrow-batched numpy kernel
    assert "ArrowEvalPython" in plan


def test_repetition_scores_is_shuffle_free(spark, sf_dir):
    """The repetition filter is pure per-row expressions — any Exchange
    appearing here means someone broke the staged-projection shape."""
    plan = _plan(spark, "text_repetition_scores", sf_dir)
    assert "Exchange" not in plan


def test_benchmark_overlap_broadcasts_benchmark_grams(spark, sf_dir):
    """Decontamination joins the corpus gram stream against the (tiny)
    benchmark gram set — that side must broadcast; shuffling the corpus
    on gram value would be the 100 TB mistake."""
    plan = _plan(spark, "dedup_benchmark_overlap", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_mining_entries_plan_shapes(spark, sf_dir):
    # fuzzy linkage: blocked equi-join over the distinct-name domain —
    # never a cartesian product over names
    plan = _plan(spark, "join_fuzzy_blocked_names", sf_dir)
    assert "CartesianProduct" not in plan
    # tf-idf: vocab-sized df frame and the one-row corpus count both broadcast
    plan = _plan(spark, "text_tfidf_top_terms", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # z-score: stats frame broadcast back, no window over the data
    plan = _plan(spark, "events_zscore_outliers", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_kmeans_broadcasts_centroids(spark, sf_dir):
    # every assignment round scores against BROADCAST centroid rows (a
    # broadcast nested-loop over K rows, never a shuffled cartesian)
    plan = _plan(spark, "cluster_kmeans_embeddings", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_sessionization_single_exchange(spark, sf_dir):
    """Sessionization promises ONE shuffle on user_id: lag, running
    session index, and the session-level groupBy all ride the same
    partitioning."""
    plan = _plan(spark, "events_sessionization", sf_dir)
    assert plan.count("Exchange") <= 2  # the user_id hash exchange (+AQE wrap)
    assert "CartesianProduct" not in plan


def test_interleave_has_no_global_sort(spark, sf_dir):
    """The global position is arithmetic — a single-partition window over
    the DATA would be the 100 TB mistake.  Single-partition exchanges may
    appear only under the metadata-sized source-map/count branches."""
    plan = _plan(spark, "select_interleave_sources", sf_dir)
    assert "CartesianProduct" not in plan
    # the data-side rank window partitions on (source, band) — present
    assert "row_number" in plan


def test_copurchase_lift_no_self_join_on_orders(spark, sf_dir):
    """Pair generation is per-basket array combinatorics; an order-keyed
    self-join (SortMergeJoin on l_orderkey against itself) must not
    reappear."""
    plan = _plan(spark, "join_copurchase_lift", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the part dimension broadcast survives
    assert "BroadcastHashJoin" in plan


def test_bm25_single_tokenizer_and_takeordered(spark, sf_dir):
    plan = _plan(spark, "text_bm25_ranking", sf_dir)
    # top-10 must be a distributed TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in plan
    # the one-row stats frame broadcasts
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_mad_outliers_broadcasts_stats(spark, sf_dir):
    plan = _plan(spark, "events_mad_outliers", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_cms_grid_partial_aggregates(spark, sf_dir):
    """The sketch grid must partial-aggregate map-side (HashAggregate
    before the exchange) and broadcast to the key side."""
    plan = _plan(spark, "agg_cms_heavy_hitters", sf_dir)
    assert "HashAggregate" in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_unpivot_is_shuffle_free(spark, sf_dir):
    plan = _plan(spark, "reshape_unpivot_customer", sf_dir)
    assert "Exchange" not in plan


def test_level_shift_single_exchange(spark, sf_dir):
    """Both RANGE frames ride one user_id shuffle."""
    plan = _plan(spark, "events_level_shift_detect", sf_dir)
    assert plan.count("Exchange") <= 2
    assert "CartesianProduct" not in plan


def test_bloom_prefilter_probe_never_shuffled(spark, sf_dir):
    """The bitset and build keys broadcast; the lineitem probe side must
    reach the final one-row aggregate without a SortMergeJoin (i.e. no
    fact-side shuffle for any of the 4 joins)."""
    plan = _plan(spark, "join_bloom_prefilter", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_session_features_reuses_session_exchange(spark, sf_dir):
    """session_idx rides the user_id shuffle; the within-session windows
    extend the same key — at most the one data exchange (+AQE wrapper)."""
    plan = _plan(spark, "events_session_features", sf_dir)
    assert plan.count("Exchange") <= 2
    assert "CartesianProduct" not in plan


def test_seasonal_deviation_broadcasts_baseline(spark, sf_dir):
    plan = _plan(spark, "events_seasonal_deviation", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_twa_and_autocorr_single_exchange(spark, sf_dir):
    for name in ("events_time_weighted_avg", "events_lag1_autocorr"):
        plan = _plan(spark, name, sf_dir)
        assert plan.count("Exchange") <= 2, name
        assert "CartesianProduct" not in plan, name


def test_latest_per_user_is_aggregate_not_window(spark, sf_dir):
    """max_by compacts via an aggregate with a map-side partial (struct
    ordering keys compile to SortAggregate) — the exchange carries one
    row per (partition, user), and no Window ever sees the data."""
    plan = _plan(spark, "events_latest_per_user", sf_dir)
    assert "Window" not in plan
    assert "partial_max_by" in plan


def test_percent_rank_scalable_distributes(spark, sf_dir):
    """The whole point: no per-priority single-partition sort of the
    data.  The only SinglePartition exchanges allowed are under the
    metadata-sized offset/total branches; the data-side window
    partitions on (priority, band)."""
    plan = _plan(spark, "window_percent_rank_scalable", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # the data-side rank window must carry the band in its partition key
    assert "band" in plan


def test_embedding_lsh_pairs_prunes_pair_space(spark, sf_dir):
    """The LSH-prefiltered threshold-pair path must never materialize
    the N² pair space: no cartesian / nested-loop join anywhere, and
    the only exchange before scoring is the groupBy(bucket) shuffle."""
    plan = _plan(spark, "sim_embedding_near_pairs_lsh", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # one corpus scan feeds the bucket packing — the exact kernel's
    # two-sided block cross join would scan twice
    head = plan.split("\n\n")[0]
    assert head.count("Scan parquet") == 1


def test_source_cap_has_no_single_partition_data_window(spark, sf_dir):
    """per_group_cap must rank through banded offsets — no cartesian,
    no nested loop; the only windows partition by (group, band)."""
    plan = _plan(spark, "select_source_cap", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_vocab_encode_plan_shape(spark, sf_dir):
    """Vocabulary rank + encode: no cartesian; the corpus-side join on
    the token key is a hash join."""
    plan = _plan(spark, "text_vocab_encode", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_verified_pairs_candidate_sized_joins(spark, sf_dir):
    """The Jaccard verify stage must join by ids/grams — never an
    all-pairs product."""
    plan = _plan(spark, "dedup_lsh_verified_pairs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ewma_is_single_window_pass(spark, sf_dir):
    """All K+1 lags must ride ONE sorted window pass on user_id — one
    exchange, one Window node."""
    head = _plan(spark, "events_ewma_smoothing", sf_dir).split("\n\n")[0]
    assert head.count("Exchange") <= 2  # window shuffle (+AQE wrapper)
    assert head.count("Window") == 1


def test_sampled_quantiles_sample_filter_before_agg(spark, sf_dir):
    """The hash-sample filter must run in the scan/project stage —
    the aggregate sees only the 1/16 sample, never the full table."""
    plan = _plan(spark, "agg_sampled_quantiles", sf_dir)
    assert "CartesianProduct" not in plan
    # the modulo-16 sample predicate exists as a Filter above the scan
    assert "% 16) = 0" in plan or "% 16 = 0" in plan.replace("(", "").replace(")", "")


def test_incremental_dedup_batch_sided_candidates(spark, sf_dir):
    """The increment path never enumerates corpus x corpus pairs: the
    band join's left side is the (broadcast-filtered) batch banding and
    nothing is a cartesian.  Inspect the LAZY form (materialize=False) —
    the registered entry's eager stage checkpoints would hide the
    candidate pipeline behind ExistingRDD scans and make this vacuous."""
    from pyspark.sql import functions as F

    from spanner_jdbc_converter_spark.catalog import load_table
    from spanner_jdbc_converter_spark.operators import dedup as dd

    d = load_table(spark, sf_dir, "documents")
    lazy = dd.incremental_near_dedup(
        d.filter(F.col("doc_id") % 5 != 0),
        d.filter(F.col("doc_id") % 5 == 0),
        materialize=False,
    )
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = lazy._jdf.queryExecution().explainString(jmode)
    # (connected_groups is internally eager — its per-round checkpoints
    # appear as ExistingRDD leaves even here; the candidate/verify
    # pipeline itself is what must stay visible and cartesian-free)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # batch ids reach the banding via a broadcast hash join
    assert "BroadcastHashJoin" in plan


def test_incremental_dedup_stage1_no_corpus_exchange(spark, sf_dir, tmp_path):
    """VERDICT r9 'What's wrong #1': stage 1's corpus touch must be
    SCAN-ONLY — the batch fingerprint/id sets broadcast onto a single
    pass of the corpus (id, fp) projection, with NO Exchange and no
    SortMergeJoin anywhere above the corpus-side scan.  A regression to
    the pre-r9 corpus-wide distinct + shuffled anti-join shape would
    re-shuffle the 100 TB corpus on every 1 TB increment.

    The state is parquet-backed (the production loop's shape) and the
    batch fp/id sets are local frames, so the ONLY exchanges the probe
    plan may contain are the two batch-side BroadcastExchanges — a
    corpus-sided shuffle would surface as a plain Exchange and fail."""
    from pyspark.sql import functions as F

    from spanner_jdbc_converter_spark.catalog import load_table
    from spanner_jdbc_converter_spark.operators import dedup as dd

    d = load_table(spark, sf_dir, "documents")
    store = str(tmp_path / "state")
    dd.signature_state(d).write.parquet(store)
    src = spark.read.parquet(store).select(
        F.col("doc_id"), F.col("fp").alias("__fp")
    )
    batch_fps = spark.createDataFrame([("a" * 32,), ("b" * 32,)], "__fp string")
    batch_ids = spark.createDataFrame([(1,), (2,)], "doc_id bigint")
    probe = dd._stage1_corpus_probe(src, batch_fps, batch_ids, "doc_id")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    head = probe._jdf.queryExecution().explainString(jmode).split("\n\n")[0]
    import re

    plain_exchanges = [
        m for m in re.findall(r"\b(\w*Exchange)\b", head) if m == "Exchange"
    ]
    assert not plain_exchanges, f"corpus-sided shuffle in stage-1 probe:\n{head}"
    assert "SortMergeJoin" not in head
    assert head.count("BroadcastHashJoin") == 2
    assert "CartesianProduct" not in head
    assert head.count("Scan parquet") == 1  # the ONE corpus-metadata pass


def test_semantic_dedup_is_cluster_bucketed(spark, sf_dir):
    """SemDedup's pair work must be the cluster-packed numpy kernel —
    one groupBy(cluster) pack feeding MapInPandas — never a pair-level
    join; the only nested-loop joins are the K-row centroid broadcasts
    of the k-means assignment.  Inspect the LAZY form — the registered
    entry's assignment checkpoint would hide the k-means subtree."""
    from spanner_jdbc_converter_spark.catalog import load_table
    from spanner_jdbc_converter_spark.operators import clustering as cl

    emb = load_table(spark, sf_dir, "embeddings")
    lazy = cl.semantic_dedup(emb, materialize=False)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = lazy._jdf.queryExecution().explainString(jmode)
    head = plan.split("\n\n")[0]
    assert "CartesianProduct" not in plan
    # the pair kernel is the packed-bucket Arrow scorer, not a join
    assert "MapInPandas" in plan
    # nested-loop joins exist ONLY as K-row centroid broadcasts (one per
    # assignment round, ×2 because the lazy assignment feeds two
    # consumers) — a vector-pair enumeration would add more
    assert head.count("BroadcastNestedLoopJoin") <= 2 * cl.KMEANS_ITERS


def test_span_contamination_postings_bounded(spark, sf_dir):
    """The verbatim-span pair expansion is expression-only over capped
    posting lists: no pair join, no cartesian; the df cap filters the
    posting arrays BEFORE the explode."""
    plan = _plan(spark, "dedup_span_contamination", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the pair expansion is a Generate (explode), not a join
    assert "Generate" in plan
    # the [2, max_df] postings cap exists as a Filter on the array size
    assert "size(" in plan


def test_benchmark_span_hits_broadcasts_benchmark_side(spark, sf_dir):
    """The benchmark span set and id set must BROADCAST onto the corpus
    shingle pass — a shuffled join on the span hash would re-exchange
    the corpus-sized span frame for a tiny eval suite."""
    from pyspark.sql import functions as F

    from spanner_jdbc_converter_spark.catalog import load_table
    from spanner_jdbc_converter_spark.operators import dedup as dd

    d = load_table(spark, sf_dir, "documents")
    out = dd.benchmark_span_hits(d, F.col("doc_id") % 7 == 0)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    head = out._jdf.queryExecution().explainString(jmode).split("\n\n")[0]
    assert "CartesianProduct" not in head
    assert "BroadcastNestedLoopJoin" not in head
    # all three benchmark-side attachments ride broadcasts; the only
    # sort-merge work allowed is the corpus-side per-doc span dedup
    assert head.count("BroadcastExchange") >= 3
    assert "SortMergeJoin" not in head


def test_source_overlap_matrix_no_doc_pair_blowup(spark, sf_dir):
    """The inverted index is the DISTINCT (source, gram) projection —
    no cartesian, no doc-level pair join, per-source totals broadcast."""
    plan = _plan(spark, "dedup_source_overlap_matrix", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # per-source totals


def test_zipf_rank_has_no_vocabulary_sized_global_window(spark, sf_dir):
    """The vocabulary rank is banded: row_number partitions by cnt and
    offsets broadcast from the metadata-sized histogram — no
    single-partition window over the whole vocabulary."""
    plan = _plan(spark, "text_zipf_slope", sf_dir)
    assert "CartesianProduct" not in plan
    # offsets rejoin by broadcast
    assert "BroadcastHashJoin" in plan
    # the data-side row_number window must carry the cnt band in its
    # partition key — a global-rank regression would partition by nothing
    import re

    rn_windows = re.findall(
        r"Arguments: \[[^\]]*row_number[^\]]*\], \[([^\]]*)\]", plan
    )
    assert rn_windows and all("cnt" in spec for spec in rn_windows), rn_windows


def test_temperature_mix_filter_is_in_scan_side(spark, sf_dir):
    """Rates broadcast; the document side is scanned once and never
    shuffled for the rate join."""
    plan = _plan(spark, "select_temperature_mix", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q20_part_filter_below_both_aggregates(spark, sf_dir):
    """VERDICT r7 'What's wrong #1': q20 must semi-join lineitem against
    the broadcast blue-part keys BEFORE both grouped aggregates, so
    neither groupBy shuffles a non-blue row.  Locks (a) each lineitem
    Aggregate in the optimized plan has a LeftSemi join strictly inside
    its subtree, and (b) no inner join with part above the aggregates."""
    df = QUERIES["q20_significant_suppliers"](spark, sf_dir)
    lines = df._jdf.queryExecution().optimizedPlan().toString().splitlines()
    agg_idx = [i for i, l in enumerate(lines) if "Aggregate [l_" in l]
    semi_idx = [i for i, l in enumerate(lines) if "Join LeftSemi" in l]
    assert len(agg_idx) == 2, lines
    assert len(semi_idx) == 2, lines
    # children print below their parent: each aggregate must be followed
    # by its LeftSemi before the next aggregate / end of plan
    bounds = agg_idx[1:] + [len(lines)]
    for start, end in zip(agg_idx, bounds):
        assert any(start < s < end for s in semi_idx), lines[start:end]
    # no LeftSemi above the first aggregate (i.e. filter not hoisted)
    assert all(s > agg_idx[0] for s in semi_idx)
    # the redundant post-aggregation inner join with part is gone
    assert not any("Join Inner" in l and "p_partkey" in l for l in lines)
    phys = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in phys
    assert "BroadcastHashJoin" in phys


def test_bpe_merges_winner_broadcast_no_vocab_shuffle_join(spark, sf_dir):
    """Each BPE round's winning pair must reach the vocabulary fold as a
    broadcast one-row frame — a shuffled join of the vocab against the
    arg-max (SortMergeJoin) or a real cartesian would be the regression.
    Pair counting must partially aggregate (map-side combine) before its
    exchange."""
    from spanner_jdbc_converter_spark.catalog import load_table
    from spanner_jdbc_converter_spark.operators.text import bpe_merges

    d = load_table(spark, sf_dir, "documents")
    df = bpe_merges(d, rounds=2, materialize=False)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(jmode)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the one-row winner frames
    assert "partial_sum" in plan  # pair counts combine map-side


def test_boilerplate_scrub_broadcasts_boiler_set(spark, sf_dir):
    """The high-df span set must BROADCAST onto the positioned shingle
    frame (it is small by definition); the docs-side reassembly join is
    also broadcast-able at the entry's scale.  A SortMergeJoin of the
    corpus against the boilerplate set or a cartesian would be the
    scale regression."""
    plan = _plan(spark, "text_boilerplate_scrub", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_hard_negatives_broadcasts_queries_not_corpus(spark, sf_dir):
    """Hard-negative mining keeps cosine_topk's contract: queries
    broadcast, corpus scored in place (no corpus exchange before the
    window reduction), label filter inside the scoring pass."""
    plan = _plan(spark, "sim_hard_negatives", sf_dir)
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_bigram_surprisal_lm_join_is_stats_driven_equi_join(spark, sf_dir):
    """The LM→scoring join must be a plain EQUI-join on the bigram key —
    never a forced broadcast (the LM is corpus-sized at 100 TB; at the
    fixture scale Catalyst's size stats legitimately pick
    BroadcastHashJoin, at scale the same plan becomes a shuffle join)
    and never a nested loop.  The only nested-loop join allowed is the
    one-row V count cross.  Grouped counts must partially aggregate."""
    plan = _plan(spark, "text_bigram_surprisal", sf_dir)
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan and "partial_sum" in plan
    # ONE nested-loop join in the plan tree: the V one-row cross
    head = plan.split("\n\n")[0]
    assert head.count("BroadcastNestedLoopJoin") == 1
    # every other join is hash-keyed (equi), stats-free of hints
    assert "broadcast" not in _bigram_surprisal_hints()


def _bigram_surprisal_hints():
    """Source-level check that bigram_surprisal only force-broadcasts the
    one-row V frame (plan-level checks can't see hints once stats pick
    the same strategy)."""
    import inspect

    from spanner_jdbc_converter_spark.operators.text import bigram_surprisal

    src = inspect.getsource(bigram_surprisal)
    # exactly one F.broadcast call: the one-row vocabulary-size frame
    assert src.count("F.broadcast(") == 1 and "F.broadcast(v)" in src
    return ""


def test_nb_classifier_scoring_join_is_stats_driven_equi_join(spark, sf_dir):
    """The weight→scoring join must be a plain EQUI-join on the token
    key — never a forced broadcast (the vocabulary is corpus-scale at
    100 TB; fixture-scale stats may legitimately pick broadcast).  The
    only nested-loop joins allowed are the two one-row crosses (totals,
    prior).  Training counts must partially aggregate."""
    plan = _plan(spark, "text_quality_classifier", sf_dir)
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan and "partial_sum" in plan
    # three one-row crosses: weights×totals, meta×totals, score×meta
    head = plan.split("\n\n")[0]
    assert head.count("BroadcastNestedLoopJoin") == 3
    # source-level: the ONLY forced broadcasts are the one-row frames
    import inspect

    from spanner_jdbc_converter_spark.operators.text import (
        nb_model_frames,
        nb_score_with_model,
    )

    train_src = inspect.getsource(nb_model_frames)
    assert train_src.count("F.broadcast(") == 2  # tot, into weights + meta
    assert "F.broadcast(tot)" in train_src
    score_src = inspect.getsource(nb_score_with_model)
    assert score_src.count("F.broadcast(") == 1  # the one-row meta
    assert "F.broadcast(meta)" in score_src


def test_dsir_model_broadcast_and_banded_rank(spark, sf_dir):
    """DSIR's scale contract: the hashed-bigram model is a FIXED
    8192-row frame and must broadcast (scoring never shuffles the
    bigram stream); the per-source top-fraction rides banded_rank, not
    a per-source single-task sort; one one-row cross (totals); no
    cartesians, no sort-merge joins anywhere."""
    # The registry entry materializes the per-doc frame (it feeds three
    # downstream references), so the executed plan sits entirely above
    # the checkpoint: rank + selection joins only, all broadcast.
    plan = _plan(spark, "select_dsir_importance", sf_dir)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the lazy plan (scoring pipeline visible) keeps the same contract:
    # the h-keyed model join must be broadcast, never sort-merge
    from spanner_jdbc_converter_spark.catalog import load_table
    from spanner_jdbc_converter_spark.operators.text import dsir_importance

    lazy = dsir_importance(
        load_table(spark, sf_dir, "documents"), materialize=False
    )
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    lplan = lazy._jdf.queryExecution().explainString(jmode)
    assert "CartesianProduct" not in lplan
    assert "SortMergeJoin" not in lplan
    import inspect

    src = inspect.getsource(dsir_importance)
    # forced broadcasts: totals (one row), the 8192-row model, the
    # per-source count frame — and the rank comes from banded_rank,
    # with the reused per-doc frame checkpointed
    assert "F.broadcast(lw)" in src and "F.broadcast(ns)" in src
    assert "banded_rank(" in src and "_stage_checkpoint(per)" in src


def test_kcenter_coreset_rounds_read_cache_not_lineage(spark):
    """VERDICT r10 #1: every FPS round after the first must read the
    PREDECESSOR round's persisted survivors (InMemoryTableScan), not
    replay the whole lineage back to the source — unpersisted, round t
    recomputed ALL prior rounds' distance maps from the source scan
    (O(k²) scans; ~36 instead of 8 at k=8).  Scans stay linear in k iff
    each round's plan is one pass over the cached predecessor."""
    from pyspark.sql import functions as F

    from spanner_jdbc_converter_spark.operators import clustering as cl

    emb = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("double"), (F.col("id") % 5).cast("double")
        ).alias("embedding"),
    )
    plans: list[str] = []
    out = cl.kcenter_coreset(emb, k=5, _debug_rounds=plans)
    assert out.count() == 5
    assert len(plans) == 4  # rounds 2..5
    # round 2's frame is the first persisted snapshot (built directly
    # from the source); every LATER round must scan its predecessor's
    # cache and never reach back to the source relation
    for plan in plans[1:]:
        assert "InMemoryTableScan" in plan, plan
        assert "Scan ExistingRDD" not in plan and "Scan parquet" not in plan, plan


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    """The storage-bucketing contract: both sides of the orderkey join
    scan 8-bucket layouts, so the merge join needs NO Exchange on
    either input — the only exchange in the whole plan is the 5-key
    priority aggregation's.  (Per-bucket sort metadata does NOT elide
    the merge-join sorts — Spark cannot trust intra-bucket order across
    files — but the sorts are partition-local CPU, not network.)"""
    import re

    plan = _plan(spark, "join_bucketed_colocated", sf_dir)
    assert "SortMergeJoin" in plan
    # exactly ONE Exchange node in the whole plan — the groupBy's; the
    # join inputs shuffle nothing (tree order puts the agg exchange
    # ABOVE the join, so node-count, don't substring-split)
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, re.M)
    assert len(exchanges) == 1, plan
    # both scans really read the bucketed layout
    assert plan.count("SelectedBucketsCount: 8 out of 8") == 2, plan


def test_winnow_fingerprints_single_exchange(spark, sf_dir):
    """The winnowing pipeline promise: shingles, md5, BOTH window
    functions, and the per-doc dedup all ride one hash(doc_id)
    exchange; no join anywhere."""
    head = _plan(spark, "dedup_winnow_fingerprints", sf_dir).split("\n\n")[0]
    assert head.count("Exchange") <= 2  # the one shuffle (+AQE wrapper)
    assert "Join" not in head
    assert "CartesianProduct" not in head


def test_first_touch_attribution_no_self_join(spark, sf_dir):
    """Attribution is ONE range-frame window on one user_id exchange —
    never the per-user range self-join naive formulations write."""
    head = _plan(spark, "events_first_touch_attribution", sf_dir).split("\n\n")[0]
    assert "Join" not in head
    assert head.count("Exchange") <= 2
    assert "Window" in head


def test_scd2_two_windows_one_exchange(spark, sf_dir):
    """SCD2's run-start lag and interval-closing lead share the (user)
    partitioning: two Window nodes, one exchange, no join."""
    head = _plan(spark, "events_scd2_intervals", sf_dir).split("\n\n")[0]
    assert head.count("Window") >= 2
    assert head.count("Exchange") <= 2
    assert "Join" not in head


def test_ann_recall_exact_set_broadcast_no_cartesian(spark, sf_dir):
    """The recall report's hit-join takes the tiny exact top-k set
    broadcast; nothing in the union of three approximate pipelines may
    degenerate to a cartesian/nested-loop product (the scoring
    crossJoins are all broadcast-one-side by construction)."""
    plan = _plan(spark, "sim_ann_recall_report", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_silhouette_broadcasts_centroids_no_shuffled_cartesian(spark, sf_dir):
    """Silhouette scoring is point × K broadcast centroid rows — a
    broadcast nested-loop over metadata, never a shuffled cartesian."""
    plan = _plan(spark, "cluster_silhouette_report", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_debounce_single_entity_exchange(spark, sf_dir):
    """Debounce groups Arrow batches on the ENTITY alone (the 14.1s →
    3.0s lesson: per-group overhead beats group size) — one exchange,
    one FlatMapGroupsInPandas, no join."""
    head = _plan(spark, "events_debounce", sf_dir).split("\n\n")[0]
    assert head.count("Exchange") <= 2
    assert "FlatMapGroupsInPandas" in head
    assert "Join" not in head


def test_pattern_match_single_exchange_zero_joins(spark, sf_dir):
    """VERDICT r12 #2: the CEP click→purchase rule is two conditional
    running-MAXes over ONE user_id window — the docstring's "one
    exchange, zero joins" promise, pinned (the naive formulation is a
    3-way range self-join that explodes at scale)."""
    plan = _plan(spark, "events_pattern_match", sf_dir)
    head = plan.split("\n\n")[0]
    assert head.count("Exchange") == 1
    assert "Join" not in head
    assert "hashpartitioning(user_id" in plan  # the one exchange IS the window's


def test_luhn_redact_is_shuffle_free_codegen(spark, sf_dir):
    """VERDICT r12 #2: the unrolled 16-term Luhn gate is pure per-row
    codegen — zero Exchange, zero Python eval, one scan; anything else
    means the checksum fell off scan speed."""
    plan = _plan(spark, "text_pii_ccn_luhn_redact", sf_dir)
    assert "Exchange" not in plan
    assert "Python" not in plan
    assert plan.split("\n\n")[0].count("Scan parquet") == 1


def test_quantile_normalize_no_global_sort(spark, sf_dir):
    """VERDICT r12 #2: both rank sides ride value-banded banded_rank —
    no rangepartitioning (global sort) anywhere, no cartesian, and the
    data-side windows carry the band in their partition keys; the only
    SinglePartition branches are the metadata-sized one-row totals."""
    plan = _plan(spark, "select_quantile_normalize", sf_dir)
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan
    assert "_band" in plan
    assert plan.count("SinglePartition") <= 2


def test_ivfpq_candidate_sized_joins_arrow_encode(spark, sf_dir):
    """VERDICT r12 #2: the IVF+PQ hybrid's promises, pinned — LUT/query
    frames broadcast (every nested-loop is broadcast-one-side, never a
    shuffled cartesian), the non-broadcast shuffles carry id-keyed pair
    rows only (query_id / match_id rank exchanges), and both encode
    paths ride the Arrow numpy kernel (the 14 s interpreted-HOF cliff)."""
    plan = _plan(spark, "sim_ivfpq_topk", sf_dir)
    head = plan.split("\n\n")[0]
    assert "CartesianProduct" not in plan
    assert plan.count("ArrowEvalPython") >= 2
    shuffles = head.count("Exchange") - head.count("BroadcastExchange")
    assert shuffles <= 3
    for ln in plan.splitlines():
        if "hashpartitioning" in ln:
            assert "query_id" in ln or "match_id" in ln, ln


def test_power_iteration_rounds_read_cache_not_source(spark, sf_dir):
    """VERDICT r12 #2 (the kcenter precedent): every matvec round must
    scan the persisted single-column frame (InMemoryTableScan), never
    replay lineage to the parquet source — unpersisted, round t would
    re-read the corpus from disk iters× per component."""
    from spanner_jdbc_converter_spark.catalog import load_table
    from spanner_jdbc_converter_spark.operators import clustering as cl

    emb = load_table(spark, sf_dir, "embeddings")
    plans: list[str] = []
    out = cl.power_iteration_pc1(emb, _debug_rounds=plans)
    assert out.count() == 64
    assert len(plans) == cl.PC1_ITERS
    for plan in plans:
        assert "InMemoryTableScan" in plan, plan
        # the live execution path (everything ABOVE the cached-relation
        # definition, which legitimately records the original FileScan)
        # must never re-reach the parquet source
        assert "Scan parquet" not in plan.split("InMemoryRelation")[0], plan


def test_pca2_rounds_and_projection_read_cache(spark, sf_dir):
    """VERDICT r12 #2 + ADVICE r12: all 2·iters deflation rounds AND
    the RETURNED projection frame read the persisted input — the
    premature unpersist that silently recomputed the final scan from
    source is fixed (eviction now deferred to the next call)."""
    from spanner_jdbc_converter_spark.operators import clustering as cl
    from spanner_jdbc_converter_spark.plans import QUERIES

    plans: list[str] = []
    from spanner_jdbc_converter_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = cl.pca2_coords(emb, _debug_rounds=plans)
    assert len(plans) == 2 * cl.PC1_ITERS
    for plan in plans:
        assert "InMemoryTableScan" in plan, plan
        assert "Scan parquet" not in plan.split("InMemoryRelation")[0], plan
    # ADVICE r13: the returned projection is a MATERIALIZED checkpoint —
    # independent of the (already unpersisted) input cache, so consuming
    # it after a later pca2_coords call can never recompute from source
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    final = out._jdf.queryExecution().explainString(jmode)
    assert "Scan ExistingRDD" in final, final
    assert "Scan parquet" not in final, final


def test_audio_fingerprint_pairs_bucketed_never_all_pairs(spark, sf_dir):
    """VERDICT r13 missing #2: the audio fingerprint pairing rides the
    SAME pigeonhole band buckets as the image path — no cartesian /
    nested-loop pair space; the fingerprint pass is one Arrow-batched
    decode (MapInPandas) and the bucket join is an equi-join keyed on
    the band value."""
    plan = _plan(spark, "dedup_audio_fingerprint_pairs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" in plan
    assert "HashJoin" in plan and "bk#" in plan


def test_image_phash_bucketed_never_all_pairs(spark, sf_dir):
    """VERDICT r12 #4: the image dHash pairing rides pigeonhole band
    buckets — no cartesian / nested-loop pair space anywhere; the hash
    pass is one Arrow-batched decode (MapInPandas) and the bucket join
    shuffles (id, hash) rows keyed by band value only."""
    plan = _plan(spark, "dedup_image_phash", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" in plan
    # the pair join is an EQUI-join keyed on the band value (broadcast at
    # fixture scale, shuffled at corpus scale — either way never a
    # product over images)
    assert "HashJoin" in plan and "bk#" in plan


def test_residual_ivfpq_candidate_sized_joins_arrow_encode(spark, sf_dir):
    """Residual IVF+PQ promises, pinned: coarse centroids/LUT frames
    broadcast (no shuffled cartesian), both the residual encode and the
    query-LUT path ride Arrow, and the non-broadcast shuffles carry
    id-keyed rows only (match_id join + query_id rank)."""
    plan = _plan(spark, "sim_residual_ivfpq_topk", sf_dir)
    head = plan.split("\n\n")[0]
    assert "CartesianProduct" not in plan
    assert plan.count("ArrowEvalPython") >= 1
    shuffles = head.count("Exchange") - head.count("BroadcastExchange")
    assert shuffles <= 3
    for ln in plan.splitlines():
        if "hashpartitioning" in ln:
            assert "query_id" in ln or "match_id" in ln, ln


def test_banding_frontier_never_rescans_corpus(spark, sf_dir):
    """The frontier consumes the session-cached STAGE frames (exact
    pairs + LSH candidates, checkpointed) — it must never re-run LSH or
    rescan the documents parquet.  r18 (VERDICT r17 "Next round #3"):
    the report aggregation itself now runs in the entry's plan (over the
    pair-frame-sized checkpoints), so pair-keyed exchanges ARE expected;
    what must never appear is a corpus rescan or a pair-space cross."""
    # prime the session cache the entry path uses
    from spanner_jdbc_converter_spark.plans.extensions import _oprep_stages_for

    _oprep_stages_for(spark, sf_dir)
    plan = _plan(spark, "dedup_lsh_banding_frontier", sf_dir)
    assert "Scan parquet" not in plan
    assert "CartesianProduct" not in plan
    # the inputs are the materialized stage checkpoints, nothing else
    assert "Scan ExistingRDD" in plan


def test_unigram_pieces_served_from_session_cache(spark, sf_dir):
    """The unigram model entry returns the persisted frame from the
    session-shared EM loop — InMemoryTableScan, never a re-run of the
    rounds (which would re-segment the vocabulary per consumer)."""
    from spanner_jdbc_converter_spark.plans.mining import _unigram_frames

    _unigram_frames(spark, sf_dir)
    plan = _plan(spark, "text_unigram_lm_pieces", sf_dir)
    assert "InMemoryTableScan" in plan.split("InMemoryRelation")[0]


def test_gopher_rules_zero_shuffle_codegen(spark, sf_dir):
    """The rule card is a projection: every ratio rule is a
    cross-multiplied integer predicate — zero exchanges, no joins."""
    head = _plan(spark, "text_gopher_rules", sf_dir).split("\n\n")[0]
    assert "Exchange" not in head
    assert "Join" not in head
    assert "BatchEvalPython" not in head  # expressions, not Python UDFs


def test_audio_silence_single_clip_exchange(spark, sf_dir):
    """Decode feeds doc_id-keyed windows and counts: the report is a
    couple of doc_id exchanges over a one-long-per-frame frame — no
    joins wider than the per-clip aggregates, no cartesian."""
    head = _plan(spark, "multimodal_audio_silence", sf_dir).split("\n\n")[0]
    assert "CartesianProduct" not in head
    assert "BroadcastNestedLoopJoin" not in head
    assert "ArrowEvalPython" in head or "MapInPandas" in head  # Arrow decode


def test_video_scenes_single_clip_exchange_no_joins(spark, sf_dir):
    """Scene detection is window + grouped count on doc_id: zero joins,
    one clip-id exchange chain (AQE may add wrappers)."""
    head = _plan(spark, "multimodal_video_scenes", sf_dir).split("\n\n")[0]
    assert "Join" not in head
    assert "CartesianProduct" not in head


def test_contamination_verdict_reuses_cached_passes(spark, sf_dir):
    """The verdict composes the session-cached span + winnow frames:
    the corpus text is NOT re-shingled — at most the base doc_id
    projection reads documents parquet; the probe sides come from
    InMemoryTableScan."""
    QUERIES["dedup_benchmark_span_hits"](spark, sf_dir).count()
    QUERIES["dedup_benchmark_winnow_hits"](spark, sf_dir).count()
    head = _plan(spark, "dedup_contamination_verdict", sf_dir).split("\n\n")[0]
    assert head.count("InMemoryTableScan") >= 2
    # documents parquet appears only for the base/verify projections,
    # never for a full re-shingle (the shingle pass would show regexp
    # splits over a parquet scan)
    assert "CartesianProduct" not in head


def test_mixture_waterfill_metadata_scale(spark, sf_dir):
    """One data pass (the grouped token count); everything downstream —
    totals, exclusive prefix sums, saturated-set sums — is global
    windows over the per-source metadata frame: ONE parquet scan, zero
    joins (the self-referencing-aggregate alternative measured four
    full scans)."""
    head = _plan(spark, "select_mixture_waterfill", sf_dir).split("\n\n")[0]
    assert head.count("Scan parquet") == 1  # documents read once
    assert "Join" not in head
    assert "CartesianProduct" not in head


def test_iban_redact_is_shuffle_free_codegen(spark, sf_dir):
    """The mod-97 Horner fold is unrolled integer expressions over
    substring digits — zero exchanges, zero joins, zero Python (the
    Luhn discipline at 24-digit length)."""
    head = _plan(spark, "text_pii_iban_redact", sf_dir).split("\n\n")[0]
    assert "Exchange" not in head
    assert "Join" not in head
    assert "BatchEvalPython" not in head


def test_savings_report_reuses_cached_groups(spark, sf_dir):
    """The component frame must come from the session-cached
    _near_dup_groups (InMemoryTableScan), not a fresh banding pass:
    documents parquet is read once for the token projection."""
    QUERIES["dedup_quality_keeper"](spark, sf_dir).count()  # warm the cache
    head = _plan(spark, "dedup_savings_report", sf_dir).split("\n\n")[0]
    assert "InMemoryTableScan" in head
    assert head.count("Scan parquet") == 1
    assert "CartesianProduct" not in head


def test_zipf_audit_windows_over_vocab_not_corpus(spark, sf_dir):
    """One corpus pass (the token grouped count); the ranking window
    and moment fold run over the vocab-sized aggregate — no SMJ, no
    cartesian, a single parquet scan."""
    head = _plan(spark, "text_zipf_audit", sf_dir).split("\n\n")[0]
    assert head.count("Scan parquet") == 1
    assert "SortMergeJoin" not in head
    assert "CartesianProduct" not in head


def test_source_report_composes_cached_gates(spark, sf_dir):
    """The dashboard must reuse the session-cached winnow/span passes
    and the cached near-dup closure — never re-shingle or re-band: with
    the caches warm, at most 3 scans READ TEXT (the fused
    quality+rules+tokens base and the verdict internals); the remaining
    scans are doc_id-pruned id probes, and the cached frames surface as
    InMemoryTableScan."""
    QUERIES["dedup_benchmark_span_hits"](spark, sf_dir).count()
    QUERIES["dedup_benchmark_winnow_hits"](spark, sf_dir).count()
    QUERIES["dedup_quality_keeper"](spark, sf_dir).count()
    plan = _plan(spark, "pipeline_source_report", sf_dir)
    head = plan.split("\n\n")[0]
    assert "InMemoryTableScan" in head
    assert "CartesianProduct" not in head
    text_scans = sum(
        1
        for ln in plan.splitlines()
        if "ReadSchema" in ln and "text" in ln
    )
    assert text_scans <= 3


def test_heaps_audit_single_pass_regression_over_metadata(spark, sf_dir):
    """One corpus pass for the (source, token) counts; the regression
    runs over the per-source frame."""
    head = _plan(spark, "text_heaps_audit", sf_dir).split("\n\n")[0]
    assert head.count("Scan parquet") == 1
    assert "SortMergeJoin" not in head
    assert "CartesianProduct" not in head


def test_top_paths_single_user_window_vocab_topk(spark, sf_dir):
    """The trigram build is the user_id window exchange; the path count
    is vocabulary-keyed; no joins at all."""
    head = _plan(spark, "events_top_paths", sf_dir).split("\n\n")[0]
    assert "Join" not in head
    assert head.count("Scan parquet") == 1


def test_tokenizer_roundtrip_reuses_cached_encodes(spark, sf_dir):
    """The audit composes the session-cached encode streams — warm
    caches mean the learn loops never rerun (InMemoryTableScan present,
    no cartesian)."""
    QUERIES["text_bpe_encode"](spark, sf_dir).count()
    QUERIES["text_unigram_encode"](spark, sf_dir).count()
    head = _plan(spark, "validate_tokenizer_roundtrip", sf_dir).split("\n\n")[0]
    assert "InMemoryTableScan" in head
    assert "CartesianProduct" not in head


def test_intradoc_scrub_id_keyed_no_joins_beyond_starts(spark, sf_dir):
    """One positioned shingle pass + one (id, hash) first-occurrence
    exchange + the per-doc start-list join back — no cartesian, no
    Python, documents read at most twice (shingle side + rebuild side)."""
    head = _plan(spark, "text_intradoc_scrub", sf_dir).split("\n\n")[0]
    assert "CartesianProduct" not in head
    assert "BatchEvalPython" not in head
    assert head.count("Scan parquet") <= 2


def test_shuffle_width_falls_back_on_non_integer_conf(spark):
    """`extensions._shuffle_width` must survive sessions whose
    spark.sql.shuffle.partitions is not a plain integer ("auto" under
    AQE-managed platforms) by falling back to defaultParallelism
    (ADVICE r15)."""
    from spanner_jdbc_converter_spark.plans.extensions import _shuffle_width

    assert _shuffle_width(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )

    class _Conf:
        def get(self, key):
            return "auto"

    class _Stub:
        conf = _Conf()
        sparkContext = spark.sparkContext

    assert _shuffle_width(_Stub()) == spark.sparkContext.defaultParallelism


def test_ivfpq_refine_adds_only_broadcasts_and_one_rank_exchange(spark, sf_dir):
    """The refine stage's 100 TB contract (VERDICT r15 #4): exact
    re-scoring touches the CANDIDATE SET only — the candidate ids and
    the norm-carrying query frame broadcast onto the corpus scan (two
    extra BroadcastExchange), and the only added shuffle is the final
    |Q|·refine_n rank window.  A corpus-sized exchange or cartesian
    here would silently turn refine into a second brute-force pass."""

    def counts(name: str) -> tuple[int, int]:
        head = _plan(spark, name, sf_dir).split("\n\n")[0]
        assert "CartesianProduct" not in head
        assert "BatchEvalPython" not in head
        bx = head.count("BroadcastExchange")
        return head.count("Exchange") - bx, bx

    base_shuffles, base_bx = counts("sim_ivfpq_topk")
    ref_shuffles, ref_bx = counts("sim_ivfpq_refine_topk")
    assert ref_shuffles == base_shuffles + 1
    assert ref_bx == base_bx + 2


def test_triangle_estimate_reuses_cached_closure(spark, sf_dir):
    """The estimate entry's exact side must read the session-cached
    per-node closure (InMemoryTableScan), never re-run the exact wedge
    join: with the cache warm, the only join-shaped closure in the plan
    is the SPARSIFIED one (VERDICT r16 "Next round #2")."""
    QUERIES["graph_triangle_coeffs"](spark, sf_dir).count()  # warm the cache
    plan = _plan(spark, "graph_triangle_estimate", sf_dir)
    head = plan.split("\n\n")[0]
    assert "InMemoryTableScan" in head
    assert "CartesianProduct" not in head


def test_opq_topk_rotation_is_codegen_no_extra_shuffle(spark, sf_dir):
    """OPQ promises (VERDICT r16 #4): the rotation rides as literal
    doubles inside codegen — no extra UDF stage and no extra exchange
    over plain PQ.  Same contract as sim_pq_topk: LUT queries broadcast
    (BNLJ), corpus never shuffled before the per-query rank, Arrow
    encode is the only Python stage."""
    plan = _plan(spark, "sim_opq_topk", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles <= 2  # the query_id rank exchange (tree + detail line)
    assert "WindowGroupLimit" in plan
    assert "ArrowEvalPython" in plan
    # exactly ONE Python stage per side: the PQ encode; the rotation
    # must NOT appear as BatchEvalPython (row-at-a-time) anywhere
    assert "BatchEvalPython" not in plan


def test_store_decode_spread_below_python_stage(spark, sf_dir):
    """Optimization r17: every media-store decode rides an explicit
    REPARTITION_BY_NUM exchange BELOW the Arrow decode pass
    (payload_view spreads to the session shuffle width), so the
    CPU-bound Python stage runs at cluster width, not at the store's
    scan-split count (serial at fixture scale before the fix)."""
    for entry in ("multimodal_png_decode", "multimodal_gif_anim_decode"):
        head = _plan(spark, entry, sf_dir).split("\n\n")[0]
        assert "REPARTITION_BY_NUM" not in head  # tag lives in details
        plan = _plan(spark, entry, sf_dir)
        assert "REPARTITION_BY_NUM" in plan, entry
        tree = plan.split("\n\n")[0].splitlines()
        decode_idx = min(
            i for i, ln in enumerate(tree) if "MapInPandas" in ln
        )
        exch_idx = [i for i, ln in enumerate(tree) if "Exchange" in ln]
        # at least one exchange strictly below (deeper than) the decode
        assert any(i > decode_idx for i in exch_idx), entry


def test_synth_decode_shuffles_ids_not_payloads(spark, sf_dir):
    """Optimization r17 (guide §2.3/§8): the 4:2:0 / 4:2:2 entries
    synthesize payloads in Python — the spread exchange must sit below
    BOTH Python stages and carry only the 8-byte ids; the synthesized
    payloads never shuffle."""
    for entry in ("multimodal_jpeg420_decode", "multimodal_jpeg422_decode"):
        plan = _plan(spark, entry, sf_dir)
        tree = plan.split("\n\n")[0].splitlines()
        py_idx = [i for i, ln in enumerate(tree) if "MapInPandas" in ln]
        exch_idx = [i for i, ln in enumerate(tree) if "Exchange" in ln]
        assert len(py_idx) == 2, entry  # synth + decode, fused stage
        assert all(i > max(py_idx) for i in exch_idx), entry
        # the exchange input is the bare id column
        for seg in plan.split("\n\n"):
            if seg.startswith("(") and "Exchange" in seg.splitlines()[0]:
                assert "payload" not in seg, entry


def test_group_walks_pinned_single_exchange(spark, sf_dir):
    """Optimization r17: the applyInPandas group walks (CUSUM, debounce)
    pre-spread to the session shuffle width and the groupBy REUSES that
    partitioning — exactly one shuffle exchange, pinned REPARTITION_BY_NUM
    so AQE cannot coalesce the CPU-bound walk near-serial (measured:
    debounce 4.26 s on 2 coalesced partitions vs 1.21 s at width)."""
    # cusum carries one extra SinglePartition exchange for the one-row
    # k/h stats aggregate; the WALK itself must ride exactly one pinned
    # exchange in both entries
    for entry, max_shuffles in (
        ("events_cusum_alarms", 2),
        ("events_debounce", 1),
    ):
        plan = _plan(spark, entry, sf_dir)
        head = plan.split("\n\n")[0]
        shuffles = head.count("Exchange") - head.count("BroadcastExchange")
        assert shuffles <= max_shuffles, entry
        assert plan.count("REPARTITION_BY_NUM") == 1, entry
        assert "FlatMapGroupsInPandas" in head, entry


def test_scrub_span_hash_is_direct_no_span_string(spark, sf_dir):
    """Optimization r17: the three span scrubs hash the n-gram lead
    columns directly (xxhash64) instead of materializing the joined
    span string and md5-ing it — the hash is engine-internal (equality
    only), so no md5/concat chain may reappear in these plans, while
    the winnowing path (whose md5 fingerprint VALUES are part of the
    declared output and the oracle contract) must keep md5."""
    for entry in (
        "text_crossdoc_scrub",
        "text_boilerplate_scrub",
        "text_intradoc_scrub",
    ):
        plan = _plan(spark, entry, sf_dir)
        assert "xxhash64" in plan, entry
        assert "md5" not in plan, entry
    assert "md5" in _plan(spark, "dedup_winnow_fingerprints", sf_dir)


def test_scrub_tokenizes_once_per_row(spark, sf_dir):
    """ADVICE r17: the span kernel stages the token array in its own
    projection (`__toks`) and relies on CollapseProject DECLINING to
    merge a multiply-referenced non-cheap alias — optimizer-version-
    dependent behavior.  If a future Spark collapses it, tokens() (a
    filter(split(...)) chain) re-runs once per get(), up to
    ngram × size per row.  Pin the assumption: each scrub plan must
    contain the tokenizer's split() only at its legitimate sites (the
    staged __toks projections, the rebuild's kept-token filter, the
    df-side pass, and the session stores' nested plan displays — 5-6
    today).  A collapse inlines __toks into EVERY get() of the hash
    lambda, multiplying split() by ngram at that site (+2 for
    intradoc's ngram=3, +3 for boilerplate's 4, +31 for crossdoc's
    32), so a ceiling just above today's count catches it."""
    for entry, max_splits in (
        ("text_crossdoc_scrub", 7),     # collapse → ≥ 37
        ("text_boilerplate_scrub", 7),  # collapse → ≥ 9
        ("text_intradoc_scrub", 6),     # collapse → ≥ 7
    ):
        plan = _plan(spark, entry, sf_dir)
        n_split = plan.count("split(")
        assert 0 < n_split <= max_splits, (
            f"{entry}: tokenizer split() appears {n_split}× — the "
            "staged __toks projection collapsed and tokens() re-runs "
            "per get()"
        )


def test_planning_scale_rounds_restores_aqe(spark):
    """The AQE-off scope of the iterative round loops must restore the
    session conf on both the clean and the raising path — a leaked
    'false' would silently change every later query of the session."""
    from spanner_jdbc_converter_spark.session import planning_scale_rounds

    key = "spark.sql.adaptive.enabled"
    before = spark.conf.get(key)
    with planning_scale_rounds(spark):
        assert spark.conf.get(key) == "false"
    assert spark.conf.get(key) == before
    try:
        with planning_scale_rounds(spark):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(key) == before


def test_minhash_sql_text_matches_column_form(spark):
    """The SQL-text rehash aggregates (optimization r17) must resolve
    to the same values as the Column-API construction they replaced."""
    from pyspark.sql import functions as F

    from spanner_jdbc_converter_spark.functions.hashing import (
        seeded_rehash,
        seeded_rehash_spark_sql,
    )

    df = spark.range(0, 50).select(
        (F.col("id") * 982451653 % (1 << 60)).alias("__h")
    )
    for seed in (0, 3, 15):
        got = df.select(
            seeded_rehash(F.col("__h"), seed).alias("a"),
            F.expr(seeded_rehash_spark_sql("__h", seed)).alias("b"),
        ).collect()
        assert all(r["a"] == r["b"] for r in got), seed
