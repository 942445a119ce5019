"""Unit + plan tests for incremental ETL (diff/merge) and training-data
selection (stratified sample, token budget, quantized top-k)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from spanner_jdbc_converter_spark import copy as cp
from spanner_jdbc_converter_spark.catalog import load_table
from spanner_jdbc_converter_spark.functions.vector import norm
from spanner_jdbc_converter_spark.operators import selection as sel
from spanner_jdbc_converter_spark.operators import similarity as sim
from spanner_jdbc_converter_spark.operators import text as tx
from spanner_jdbc_converter_spark.plans import QUERIES


def _plan(spark, name: str, sf_dir: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(jmode)


# -- incremental diff / merge ----------------------------------------------


def test_incremental_diff_classifies_and_handles_nulls(spark):
    src = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], ["k", "v"]
    )
    dst = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c"), (5, "e")], ["k", "v"]
    )
    out = {
        r["k"]: r["change_type"]
        for r in cp.incremental_diff(src, dst, ["k"], ["v"]).collect()
    }
    # 1 unchanged (absent), 2 value-changed, 3 NULL→value counts as change,
    # 4 missing in dst, 5 missing in src
    assert out == {2: "update", 3: "update", 4: "insert", 5: "delete"}


def test_merge_upsert_updates_win_and_inserts_append(spark):
    target = spark.createDataFrame([(1, "old"), (2, "keep"), (3, "old")], ["k", "v"])
    updates = spark.createDataFrame([(1, "new"), (4, "ins")], ["k", "v"])
    out = {r["k"]: r["v"] for r in cp.merge_upsert(target, updates, ["k"]).collect()}
    assert out == {1: "new", 2: "keep", 3: "old", 4: "ins"}


def test_incremental_diff_no_cartesian(spark, sf_dir):
    plan = _plan(spark, "copy_incremental_diff", sf_dir)
    assert "CartesianProduct" not in plan
    assert "FullOuter" in plan


# -- stratified sample ------------------------------------------------------


def test_stratified_sample_deterministic_subset(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    a = sel.stratified_sample(d, "lang", "doc_id", {"en": 60}, 25).select("doc_id")
    b = sel.stratified_sample(d, "lang", "doc_id", {"en": 60}, 25).select("doc_id")
    ids_a = {r[0] for r in a.collect()}
    ids_b = {r[0] for r in b.collect()}
    assert ids_a == ids_b  # hash-based: reproducible, unlike rand()
    assert ids_a < {r[0] for r in d.select("doc_id").collect()}


def test_stratified_sample_rate_zero_and_hundred(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n = d.count()
    assert sel.stratified_sample(d, "lang", "doc_id", {}, 100).count() == n
    assert sel.stratified_sample(d, "lang", "doc_id", {}, 0).count() == 0


# -- token-budget selection -------------------------------------------------


def test_token_budget_two_phase_equals_global_window(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        tx.token_count("text").alias("n_tokens"),
        tx.quality_score("text").alias("quality"),
    )
    budget = 5_000
    two_phase = sel.select_token_budget(d, "quality", "n_tokens", "doc_id", budget)
    # the naive single-task global window — semantic spec, not the plan
    w = Window.orderBy(F.desc("quality"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    naive = (
        d.withColumn("_cum", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("_cum") <= budget)
    )
    got = {(r["doc_id"], r["_cum"]) for r in two_phase.collect()}
    want = {(r["doc_id"], r["_cum"]) for r in naive.collect()}
    assert got == want and len(got) > 0


def test_token_budget_plan_windows_bands_not_globe(spark, sf_dir):
    plan = _plan(spark, "select_token_budget", sf_dir)
    # the data-path window must partition by band; the only
    # single-partition exchange allowed is the ≤51-row offsets frame
    assert "_band" in plan
    assert plan.count("Exchange SinglePartition") <= 1
    assert "BroadcastExchange" in plan  # offsets join back by broadcast


# -- quantized similarity ---------------------------------------------------


def test_quantized_topk_agrees_with_exact_topk(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").filter(norm(F.col("embedding")) > 0)
    queries = e.filter(F.col("vec_id") % 50 == 0)
    exact = sim.cosine_topk(queries, e, k=5)
    quant = sim.quantized_topk(queries, e, k=5)
    ex = {(r["query_id"], r["match_id"]) for r in exact.collect()}
    qu = {(r["query_id"], r["match_id"]) for r in quant.collect()}
    assert len(qu) == len(ex) > 0
    # int8 quantization on 64-dim vectors preserves most of the top-5
    overlap = len(ex & qu) / len(ex)
    assert overlap >= 0.6, f"quantized recall too low: {overlap}"


def test_pack_sequences_next_fit_semantics(spark):
    rows = [
        ("en", 1, 300), ("en", 2, 200), ("en", 3, 100),   # 300+200=500, +100 overflows
        ("en", 4, 900),                                   # oversized doc: own bin
        ("en", 5, 10),
        ("de", 1, 512), ("de", 2, 1),                     # exact fit closes nothing
    ]
    df = spark.createDataFrame(rows, ["lang", "doc_id", "n_tokens"])
    out = sel.pack_token_sequences(df, "lang", "n_tokens", "doc_id", 512)
    got = {(r["lang"], r["doc_id"]): (r["bin_idx"], r["bin_fill"]) for r in out.collect()}
    assert got[("en", 1)] == (0, 300)
    assert got[("en", 2)] == (0, 500)
    assert got[("en", 3)] == (1, 100)
    assert got[("en", 4)] == (2, 900)   # > capacity: still its own bin
    assert got[("en", 5)] == (3, 10)    # bin 2 was over capacity, next doc opens new
    assert got[("de", 1)] == (0, 512)   # exact capacity fits
    assert got[("de", 2)] == (1, 1)


def test_pack_sequences_composite_shard_bounds_groups(spark):
    """shards=N sub-shards each group by the portable md5 of the id:
    parallelism is groups × shards (not capped by group cardinality) and
    no pandas group ever holds a whole group.  Each composite shard must
    independently obey next-fit semantics with bin_idx restarting at 0."""
    from spanner_jdbc_converter_spark.functions.hashing import md5_long

    df = spark.createDataFrame(
        [("en", i, 100) for i in range(1, 101)], ["lang", "doc_id", "n_tokens"]
    )
    out = sel.pack_token_sequences(df, "lang", "n_tokens", "doc_id", 512, shards=8)
    rows = out.collect()
    assert len(rows) == 100
    shards = {r["shard"] for r in rows}
    assert len(shards) > 1  # one lang no longer means one pandas group

    # shard assignment is exactly the portable hash the oracle reproduces
    expect = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", (md5_long(F.col("doc_id").cast("string")) % 8).cast("int").alias("s")
        ).collect()
    }
    assert all(expect[r["doc_id"]] == r["shard"] for r in rows)

    # within every composite shard: id-ordered greedy next-fit from bin 0
    by_shard: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        by_shard.setdefault(r["shard"], []).append(r)
    for docs in by_shard.values():
        b, fill = 0, 0
        for i, r in enumerate(docs):
            if i == 0:
                b, fill = 0, 100
            elif fill + 100 > 512:
                b, fill = b + 1, 100
            else:
                fill += 100
            assert (r["bin_idx"], r["bin_fill"]) == (b, fill)


def test_quantized_topk_broadcasts_queries(spark, sf_dir):
    plan = _plan(spark, "sim_quantized_topk", sf_dir)
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


class TestPerGroupCap:
    def test_cap_binds_and_is_deterministic(self, spark, sf_dir):
        from spanner_jdbc_converter_spark.catalog import load_table
        from spanner_jdbc_converter_spark.operators import selection as sel

        d = load_table(spark, sf_dir, "documents")
        capped = sel.per_group_cap(d, "source", "doc_id", 5)
        per_src = {
            r.source: r.n
            for r in capped.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert per_src and all(n <= 5 for n in per_src.values())
        # sources with >5 docs were actually capped
        full = {
            r.source: r.n
            for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert any(full[s] > 5 and per_src[s] == 5 for s in per_src)
        # deterministic: identical kept set on a re-run with different partitioning
        again = set(
            r.doc_id
            for r in sel.per_group_cap(d.repartition(7), "source", "doc_id", 5).collect()
        )
        assert again == {r.doc_id for r in capped.collect()}

    def test_cap_larger_than_group_keeps_all(self, spark, sf_dir):
        from spanner_jdbc_converter_spark.catalog import load_table
        from spanner_jdbc_converter_spark.operators import selection as sel

        d = load_table(spark, sf_dir, "documents")
        assert sel.per_group_cap(d, "source", "doc_id", 10**6).count() == d.count()


class TestTemperatureMix:
    def test_kept_mix_follows_sqrt_weights(self, spark):
        """With two sources 3600 vs 400 (9:1), τ=0.5 targets a kept mix
        of √3600:√400 = 3:1 — the big source is DOWN-weighted relative
        to its natural 9:1 share.  Hash sampling is approximate, so
        assert the kept ratio lands near 3:1 and far from 9:1, plus the
        exact expected counts from the integer thresholds."""
        rows = [(i, "big") for i in range(3600)] + [(10_000 + i, "small") for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        kept = sel.temperature_mix_sample(df, "source", "doc_id", target_frac=0.4).toPandas()
        by = kept.groupby("source").size()
        # targets: T=1600 total; w_big=60/80, w_small=20/80 →
        # t_big=1200 (rate 1/3), t_small=400 (rate 1.0 → keeps all 400)
        assert by["small"] == 400            # rate capped at 1: all kept
        assert abs(by["big"] - 1200) < 150   # hash-sampled ≈ 1200
        # determinism: same input → identical kept set
        again = sel.temperature_mix_sample(df, "source", "doc_id", target_frac=0.4).toPandas()
        assert sorted(again["doc_id"]) == sorted(kept["doc_id"])

    def test_mix_plan_broadcasts_rates_no_extra_shuffle(self, spark, sf_dir):
        """The rate frame joins back by BROADCAST; the data-sized side
        never shuffles for the join."""
        plan = _plan(spark, "select_temperature_mix", sf_dir)
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_only_sqrt_temperature_supported(self, spark):
        import pytest

        df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
        with pytest.raises(NotImplementedError):
            sel.temperature_mix_sample(df, "source", "doc_id", tau=0.7)


def test_pack_next_fit_matches_reference_walk_property(spark):
    """Property check: for ANY token sequence and capacity, the Spark
    packer's (bin_idx, bin_fill) per doc equals a pure-Python next-fit
    walk in id order (shards=1 so the whole group is one sequence)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def reference_next_fit(tokens, capacity):
        out, b, fill = [], 0, 0
        for i, n in enumerate(tokens):
            if i == 0:
                b, fill = 0, n
            elif fill + n > capacity:
                b, fill = b + 1, n
            else:
                fill += n
            out.append((b, fill))
        return out

    @settings(max_examples=8, deadline=None)
    @given(
        tokens=st.lists(st.integers(min_value=1, max_value=700), min_size=1, max_size=40),
        capacity=st.integers(min_value=1, max_value=600),
    )
    def check(tokens, capacity):
        df = spark.createDataFrame(
            [("g", i, n) for i, n in enumerate(tokens)], ["grp", "doc_id", "n_tokens"]
        )
        got = {
            r["doc_id"]: (r["bin_idx"], r["bin_fill"])
            for r in sel.pack_token_sequences(df, "grp", "n_tokens", "doc_id", capacity).collect()
        }
        want = dict(enumerate(reference_next_fit(tokens, capacity)))
        assert got == want

    check()


def test_mixture_waterfill_invariants_random_skews(spark):
    """Property (hypothesis): for random per-source token counts and
    budgets, the water-filling allocation satisfies its defining
    invariants — Σalloc = min(budget, Σcap) to rounding, no source
    exceeds its cap, saturated sources sit exactly AT their cap, and
    unsaturated allocations are weight-proportional (equal alloc/weight
    ratios within rounding)."""
    from hypothesis import given, settings, strategies as st

    from spanner_jdbc_converter_spark.operators import selection as sel

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=500_000),
            min_size=1,
            max_size=8,
        ),
        st.integers(min_value=1, max_value=2_000_000),
    )
    def run(ns, budget):
        counts = spark.createDataFrame(
            [(f"s{i}", n) for i, n in enumerate(ns)],
            "source string, n_tokens long",
        )
        rows = sel.mixture_waterfill(counts, budget_tokens=budget).collect()
        caps = {r.source: r.cap_tokens for r in rows}
        total_cap = sum(caps.values())
        total_alloc = sum(r.alloc_tokens for r in rows)
        assert abs(total_alloc - min(budget, total_cap)) < 1e-3 * max(
            1, len(rows)
        )
        ratios = []
        for r in rows:
            assert r.alloc_tokens <= r.cap_tokens + 1e-6
            if r.saturated:
                assert r.alloc_tokens == float(r.cap_tokens)
            elif r.weight_micro > 0:
                ratios.append(r.alloc_tokens / r.weight_micro)
            else:
                assert r.alloc_tokens == 0.0
        if len(ratios) > 1:
            assert max(ratios) - min(ratios) < 1e-6

    run()
