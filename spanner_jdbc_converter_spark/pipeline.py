"""End-to-end training-data curation pipeline: the operator corpus
composed into the workflow the engine exists for.

``curate_documents`` chains the production stages over a documents
frame — profile → quality filter → exact (fingerprint) dedup → LSH
near-dedup with connected-component grouping → benchmark
decontamination → token-budget selection → deterministic train/val/test
split → greedy sequence packing — and returns the packed frame plus a
per-stage row-count report.

This is the LLM-pipeline analog of ``converter.convert_all`` (the
reference's migration orchestrator): a driver-side composition of
lazily-planned stages.  Every stage reuses an operator that is
independently oracle-verified in ``plans/``; the orchestrator's own
tests (tests/test_pipeline.py) assert the cross-stage invariants —
determinism run-to-run, monotone row counts, no surviving duplicate
fingerprints, budget respected, splits partitioning the selection, and
bin fills bounded by capacity.

Scale notes: stages communicate only through DataFrames (one logical
plan until the report forces counts); filters are narrow; both dedups
shuffle on hash keys; selection uses the banded prefix sum; packing
shards on the composite (lang, hash) key.  The stage counts in the
report each trigger a job — at 100 TB, pass ``with_counts=False`` to
skip them and keep the whole pipeline one lazy plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spanner_jdbc_converter_spark.functions.hashing import md5_long
from spanner_jdbc_converter_spark.operators import dedup as dd
from spanner_jdbc_converter_spark.operators import selection as sel
from spanner_jdbc_converter_spark.operators import text as tx


@dataclass
class PipelineReport:
    """Row counts after each stage (empty when ``with_counts=False``).

    Two counting modes:
    * eager (``with_counts=True``): ``record`` counts each stage as the
      pipeline builds — one Spark job per stage, counts available
      immediately.
    * lazy (``with_counts="lazy"``): ``observe`` attaches a COUNT
      metric to each stage frame instead; every count then rides the
      ONE action that materializes the pipeline (no extra jobs — the
      observed nodes are already in the executed plan).  Call
      ``resolve()`` after that action to populate ``stages``.
    ``persisted`` collects the stage frames cached by curate_documents
    so a caller that fully consumed the pipeline can release them.
    """

    stages: dict[str, int] = field(default_factory=dict)
    persisted: list[DataFrame] = field(default_factory=list)
    _pending: list = field(default_factory=list)

    def record(self, name: str, df: DataFrame, enabled: bool) -> None:
        if enabled:
            self.stages[name] = df.count()

    def observe(self, name: str, df: DataFrame) -> DataFrame:
        """Wrap ``df`` with a row-count observation; the RETURNED frame
        must be the one consumed downstream or the metric never fires."""
        from pyspark.sql import Observation

        obs = Observation()
        self._pending.append((name, obs))
        return df.observe(obs, F.count(F.lit(1)).alias("n"))

    def resolve(self) -> None:
        """Read all pending observations (blocks until the action that
        materialized the pipeline has completed them)."""
        for name, obs in self._pending:
            self.stages[name] = obs.get["n"]
        self._pending.clear()

    def release(self) -> None:
        """Unpersist every stage frame the pipeline cached."""
        for df in self.persisted:
            df.unpersist()
        self.persisted.clear()


def train_val_test(id_col: Column, val_pct: int = 10, test_pct: int = 10) -> Column:
    """Deterministic split assignment: portable md5 bucket of the id —
    stable across runs, partitionings, and engines (same construction as
    select_train_val_test_split)."""
    bucket = md5_long(F.concat(F.lit("split:"), id_col.cast("string"))) % 100
    return (
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )


def curate_documents(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    benchmark_pred: Column | None = None,
    quality_min: float = 0.3,
    overlap_max: float = 0.5,
    token_budget: int = 50_000,
    pack_capacity: int = 512,
    pack_shards: int = 16,
    with_counts: bool | str = True,
    persist_stages: bool = True,
) -> tuple[DataFrame, PipelineReport]:
    """Run the full curation pipeline; returns (packed frame, report).

    The packed frame has one row per selected document with its split
    assignment and packing coordinates: (lang, split, shard, doc_id,
    n_tokens, bin_idx, bin_fill).

    ``with_counts``: True = eager per-stage count jobs; ``"lazy"`` =
    every stage count rides the ONE action that materializes the
    pipeline as an observed metric (call ``report.resolve()`` after
    that action — see PipelineReport); False = no counts, fully lazy.

    ``persist_stages`` caches the multiply-consumed stage frames
    (``exact`` feeds both the LSH pair generation and the survivor
    join; ``near`` feeds the overlap probe, the decontamination filter,
    and selection) with MEMORY_AND_DISK — without it the lazy plan
    re-derives the tokenizer/fingerprint subtree once per consumer.
    Disk-backed, so safe at scale; disable to keep the pipeline one
    fully lazy plan with zero cached state.  In lazy-counts mode the
    observation wraps each frame BEFORE its persist, so the metric node
    lives inside the cached plan and fires exactly once (block-level
    cache locking computes each cached partition once even with
    concurrent consumers).
    """
    from pyspark import StorageLevel

    lazy_counts = with_counts == "lazy"
    if lazy_counts and not persist_stages:
        # The observed stage frames are consumed by MULTIPLE downstream
        # branches (near_dedup feeds the overlap probe, the decontamination
        # filter, AND selection); without the cache each CollectMetrics
        # subtree would be re-planned per consumer and the "fires exactly
        # once" guarantee below would not hold — counts could double or the
        # duplicated observation could fail analysis.
        raise ValueError(
            "with_counts='lazy' requires persist_stages=True: the lazy "
            "observation metrics rely on the stage cache to fire exactly once"
        )

    def staged(df: DataFrame) -> DataFrame:
        if not persist_stages:
            return df
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        report.persisted.append(out)
        return out

    def rec(name: str, df: DataFrame) -> DataFrame:
        """Count hook: returns the frame downstream MUST consume."""
        if lazy_counts:
            return report.observe(name, df)
        report.record(name, df, bool(with_counts))
        return df

    report = PipelineReport()
    docs = rec("input", docs)

    # 1. profile: token/quality/lang features from ONE staged tokenizer.
    profiled = tx.document_profile(docs, text_col)
    # The profile features (tokenizer, quality, fingerprint) feed every
    # later stage — persist once here so no stage re-tokenizes.
    flt = staged(rec("quality_filter", profiled.filter(F.col("quality") >= quality_min)))

    # 2. exact dedup on normalized-content fingerprint (min-id keeper).
    exact = staged(rec("exact_dedup", dd.fingerprint_dedup(flt, text_col, id_col)))

    # 3. near-dedup: LSH candidates → connected components → keep the
    #    min-id representative of every near-dup group.
    pairs = dd.lsh_candidate_pairs(exact, text_col, id_col)
    groups = dd.connected_groups(pairs)  # (doc_id, group_id)
    losers = groups.filter(F.col("doc_id") != F.col("group_id")).select(
        F.col("doc_id").alias(id_col)
    )
    near = staged(rec("near_dedup", exact.join(losers, id_col, "left_anti")))

    # 4. decontamination: drop documents overlapping the benchmark set.
    if benchmark_pred is not None:
        overlap = dd.benchmark_overlap(near, benchmark_pred, text_col, id_col)
        contaminated = overlap.filter(
            F.col("overlap_frac") > overlap_max
        ).select(id_col)
        near = staged(
            rec(
                "decontaminated",
                near.filter(~benchmark_pred).join(contaminated, id_col, "left_anti"),
            )
        )

    # 5. token-budget selection (quality DESC, id ASC — banded prefix sum).
    selected = rec(
        "token_budget",
        sel.select_token_budget(near, "quality", "n_tokens", id_col, token_budget),
    )

    # 6. deterministic split, then 7. per-(lang, split) sequence packing
    #    on the composite hash-sharded key.
    split_frame = selected.withColumn("split", train_val_test(F.col(id_col)))
    packed = sel.pack_token_sequences(
        split_frame.withColumn(
            "__grp", F.concat_ws("/", F.col(lang_col), F.col("split"))
        ),
        "__grp",
        "n_tokens",
        id_col,
        pack_capacity,
        shards=pack_shards,
    )
    out = packed.select(
        F.split_part(F.col("__grp"), F.lit("/"), F.lit(1)).alias(lang_col),
        F.split_part(F.col("__grp"), F.lit("/"), F.lit(2)).alias("split"),
        "shard",
        id_col,
        "n_tokens",
        "bin_idx",
        "bin_fill",
    )
    out = rec("packed", out)
    return out, report
