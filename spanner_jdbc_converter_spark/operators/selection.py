"""Training-data selection operators (extension family, SURVEY.md §2.11):
deterministic stratified sampling and token-budget corpus selection.

Both are the "choose what goes into the training mix" step of an LLM data
pipeline.  Determinism is load-bearing: selection must be reproducible
run-to-run and engine-to-engine, so sampling uses the portable md5 hash
(functions/hashing.py) instead of rand(), and budget selection uses a
two-phase prefix sum instead of a single-partition global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spanner_jdbc_converter_spark.functions.hashing import md5_long

#: Quality-band count for the distributed prefix sum (quality ∈ [0, 1]).
QUALITY_BANDS = 50

#: 2^60 — the md5_long value range, exact in a double (split thresholds).
U_DENOM = float(1 << 60)


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    train: float = 0.8,
    val: float = 0.1,
    tag: str = "split",
    groups: DataFrame | None = None,
) -> DataFrame:
    """Train/val/test split that assigns NEAR-DUPLICATE GROUPS atomically:
    hashing raw doc ids (select_train_val_test_split) leaks when two
    near-duplicates straddle train and test — the model "memorizes" the
    eval answer from its twin.  Here every doc's split key is its
    connected-component anchor over the near-dup pair graph (min
    reachable id, :func:`dedup.connected_groups`); docs with no near-dup
    anchor on their own id, so the assignment is IDENTICAL to the plain
    split for unique docs and group-atomic for duplicates — no group
    ever straddles a split boundary, by construction.

    Deterministic: portable md5 over 'tag:anchor' against exact
    2^-60-scaled thresholds, min-id anchors, no rand().

    Scale: the group frame is pair-node-sized (≪ corpus, only docs that
    appear in some near-dup pair); ONE id-keyed left join attaches it,
    and the split decision is a per-row expression — no extra shuffle
    beyond the components computation itself.

    Output: (id, lang-agnostic) one row per input doc —
    (id_col, anchor_id, split).

    Pass either ``pairs`` (the near-dup pair graph; components are
    computed here) or a precomputed ``groups`` frame (id_col, group_id)
    — e.g. a session-cached :func:`dedup.connected_groups` result shared
    with a components entry, so the expensive closure runs once.  A
    precomputed frame may key on either the caller's ``id_col`` or
    ``connected_groups``' literal ``doc_id`` output column (ADVICE r10:
    the hardcoded ``doc_id`` broke custom id_col + matching-keyed
    groups)."""
    if groups is None:
        if pairs is None:
            raise ValueError("leakage_safe_split needs either pairs or groups")
        from spanner_jdbc_converter_spark.operators.dedup import connected_groups

        groups = connected_groups(pairs, id_a, id_b)
    group_key = id_col if id_col in groups.columns else "doc_id"
    groups = groups.select(F.col(group_key).alias(id_col), "group_id")
    anchored = df.select(id_col).join(groups, on=id_col, how="left").select(
        F.col(id_col),
        F.coalesce(F.col("group_id"), F.col(id_col)).alias("anchor_id"),
    )
    u = md5_long(
        F.concat(F.lit(f"{tag}:"), F.col("anchor_id").cast("string"))
    ) / F.lit(U_DENOM)
    return anchored.select(
        id_col,
        "anchor_id",
        F.when(u < train, F.lit("train"))
        .when(u < train + val, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def sample_bucket(strata_col: Column, id_col: Column) -> Column:
    """Deterministic 0-99 bucket per row: portable md5 over 'stratum:id'.

    Hash-based sampling (vs ``df.sample``) keeps the selected set stable
    across runs, partitionings, and engines — at 100 TB, re-runs and
    backfills must pick the SAME rows or downstream dedup breaks.
    """
    return md5_long(F.concat(strata_col.cast("string"), F.lit(":"), id_col.cast("string"))) % 100


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: dict[str, int],
    default_pct: int,
) -> DataFrame:
    """Keep ``rates[stratum]`` percent of each stratum (``default_pct`` for
    unlisted strata) — pure narrow filter, no shuffle, no sort: the scan
    evaluates one hash per row and drops rows in place."""
    rate: Column | None = None
    for stratum, pct in sorted(rates.items()):
        cond = F.col(strata_col) == stratum
        rate = F.when(cond, pct) if rate is None else rate.when(cond, pct)
    rate_col = rate.otherwise(default_pct) if rate is not None else F.lit(default_pct)
    return df.filter(sample_bucket(F.col(strata_col), F.col(id_col)) < rate_col)


def select_token_budget(
    df: DataFrame,
    quality_col: str,
    tokens_col: str,
    id_col: str,
    budget: int,
) -> DataFrame:
    """Greedy corpus selection: take documents in (quality DESC, id ASC)
    order while the running token total stays ≤ ``budget``.

    Semantically a global running sum — but a bare
    ``Window.orderBy(...)`` with no partitionBy collapses every row into
    ONE task, which is exactly the plan that dies at 100 TB.  Instead a
    two-phase prefix sum:

    1. band rows by ``floor(quality × 50)`` (equal qualities always share
       a band, so band-descending order refines the global order);
    2. per-band token totals (tiny: ≤ 51 rows) → running offsets via a
       window over that metadata-scale frame, broadcast back;
    3. within-band running sum with ``partitionBy(band)`` — distributed —
       plus the band offset ≡ the global cumulative sum, value-for-value.

    Adds ``_cum`` (cumulative tokens incl. this row) to the output.
    """
    band = F.floor(F.col(quality_col) * QUALITY_BANDS).cast("int")
    t = df.withColumn("_band", band)

    totals = t.groupBy("_band").agg(F.sum(tokens_col).cast("long").alias("_band_tokens"))
    w_off = (
        Window.orderBy(F.desc("_band")).rowsBetween(Window.unboundedPreceding, -1)
    )  # ≤ QUALITY_BANDS+1 rows: single-partition window over metadata, not data
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_band_tokens").over(w_off), F.lit(0)).cast("long")
    ).select("_band", "_offset")

    w_in = (
        Window.partitionBy("_band")
        .orderBy(F.desc(quality_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        t.join(F.broadcast(offsets), "_band")
        .withColumn("_cum", (F.col("_offset") + F.sum(tokens_col).over(w_in)).cast("long"))
        .filter(F.col("_cum") <= budget)
        .drop("_band", "_offset")
    )


def pack_token_sequences(
    df: DataFrame,
    group_col: str,
    tokens_col: str,
    id_col: str,
    capacity: int,
    shards: int = 1,
) -> DataFrame:
    """Greedy next-fit sequence packing: within each packing shard, walk
    documents in id order and append to the current bin until it would
    overflow ``capacity``, then open the next bin.  A doc larger than
    capacity still gets its own bin (next-fit semantics).

    Packing is inherently sequential *within a shard* — that is true of
    every production packer, which is why they pack per-shard, never
    globally.  The shard key is COMPOSITE: ``(group, md5(id) % shards)``.
    A low-cardinality group key alone (e.g. a 5-value language column)
    caps parallelism at the number of groups and pulls each group's full
    document set into one in-memory pandas frame — a 20-TB Arrow group
    at corpus scale.  The hash sub-shard bounds every pandas group to
    ~1/shards of its group and scales parallelism to ``groups × shards``
    regardless of group cardinality.  Bins never need to be global:
    ``bin_idx`` is 0-based per composite shard, and ``(group, shard,
    bin_idx)`` identifies a bin.  The sub-shard hash is the portable md5
    (functions/hashing.py), so an oracle can reproduce the exact
    assignment.

    Output: group, ``shard`` (int), id, tokens, ``bin_idx`` and
    ``bin_fill`` (bin total AFTER placing the row).  ``shards=1`` keeps
    the historical one-shard-per-group behavior (shard ≡ 0).

    The output schema is derived from the INPUT schema (not hardcoded),
    so an int group key or a decimal token count round-trips with its
    own type instead of failing Arrow conversion.
    """
    from pyspark.sql import types as T

    in_fields = {f.name: f.dataType for f in df.schema.fields}
    schema = T.StructType(
        [
            T.StructField(group_col, in_fields[group_col]),
            T.StructField("shard", T.IntegerType()),
            T.StructField(id_col, in_fields[id_col]),
            T.StructField(tokens_col, in_fields[tokens_col]),
            T.StructField("bin_idx", T.LongType()),
            T.StructField("bin_fill", T.LongType()),
        ]
    )

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col)
        bins, fills = [], []
        b, fill = 0, 0
        first = True
        for n in pdf[tokens_col]:
            n = int(n)
            if first:
                b, fill, first = 0, n, False
            elif fill + n > capacity:
                b, fill = b + 1, n
            else:
                fill += n
            bins.append(b)
            fills.append(fill)
        return pd.DataFrame(
            {
                group_col: pdf[group_col].values,
                "shard": pdf["shard"].values,
                id_col: pdf[id_col].values,
                tokens_col: pdf[tokens_col].values,
                "bin_idx": bins,
                "bin_fill": fills,
            }
        )

    from spanner_jdbc_converter_spark.session import session_shuffle_width

    t = df.select(group_col, id_col, tokens_col).withColumn(
        "shard", (md5_long(F.col(id_col).cast("string")) % shards).cast("int")
    )
    # explicit-width spread before the CPU-bound packing walk (one
    # exchange — the groupBy reuses the pinned partitioning; opt r17)
    spread = t.repartition(
        session_shuffle_width(df.sparkSession), group_col, "shard"
    )
    return spread.groupBy(group_col, "shard").applyInPandas(_pack, schema)


def banded_rank(
    df: DataFrame,
    part_cols: list[str],
    hash_col: str,
    id_col: str,
    shift: int = 54,
) -> DataFrame:
    """Distributed per-partition rank by (hash, id) WITHOUT a
    single-partition window: band rows by the hash's top bits (band =
    hash >> shift — monotone in the sort key, so band-major order ≡ the
    global per-partition order), row_number within (partition, band),
    and add broadcast per-band offsets from a metadata-sized count
    frame.  60-bit md5 hashes with shift=54 give 64 uniform bands.

    Adds ``_rk`` (1-based rank within part_cols).  This is the shared
    scale primitive behind deterministic interleaving and length-
    bucketed batching.
    """
    t = df.withColumn("_band", F.shiftright(F.col(hash_col), shift))
    counts = t.groupBy(*part_cols, "_band").agg(F.count(F.lit(1)).alias("_n"))
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("_band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # partitions × 64 rows — metadata-scale window
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).cast("long")
    ).select(*part_cols, "_band", "_off")
    w_in = Window.partitionBy(*part_cols, "_band").orderBy(
        F.asc(hash_col), F.asc(id_col)
    )
    return (
        t.join(F.broadcast(offsets), [*part_cols, "_band"])
        .withColumn("_rk", F.col("_off") + F.row_number().over(w_in))
        .drop("_band", "_off")
    )


def per_group_cap(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    seed_tag: str = "cap",
) -> DataFrame:
    """Deterministic per-group downsampling: keep at most ``cap`` rows
    per group, chosen by portable md5 hash order (ties broken by id) —
    the "cap the over-represented source" curation stage.  Unlike
    ``ORDER BY rand() LIMIT`` it is reproducible across runs, engines,
    and partitionings.

    Scale: routed through :func:`banded_rank`, so a billion-row group
    never sorts in one task — ranks come from 64 hash bands with
    broadcast offsets; the only data exchange is the (group, band)
    window shuffle.  The kept set is a uniform hash sample of each
    group (the hash is uncorrelated with any attribute), so capping
    does not bias within-group distributions."""
    key = md5_long(
        F.concat(
            F.lit(f"{seed_tag}:"),
            F.col(group_col).cast("string"),
            F.lit(":"),
            F.col(id_col).cast("string"),
        )
    )
    t = df.withColumn("_ck", key)
    return (
        banded_rank(t, [group_col], "_ck", id_col)
        .filter(F.col("_rk") <= cap)
        .drop("_ck", "_rk")
    )


def temperature_mix_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    tau: float = 0.5,
    target_frac: float = 0.4,
) -> DataFrame:
    """Temperature-scaled source mixing: sample group *i* at a rate
    proportional to ``n_i^tau / n_i`` so the KEPT mix follows
    ``w_i ∝ n_i^tau`` — the standard multilingual/multi-source corpus
    reweighting (tau < 1 upweights tail sources, tau = 1 preserves the
    natural mix).  ``target_frac`` sets the kept fraction of the whole
    corpus; per-group rates cap at 1 (a tail group smaller than its
    target keeps everything — the mass is NOT redistributed, matching
    the common single-pass implementation).

    Determinism/parity: group sizes are exact ints; tau = 0.5 routes
    through sqrt (IEEE correctly-rounded, unlike pow), each per-group
    scalar is rounded to 6 digits before use, and the row filter
    compares integer hash buckets to an integer threshold — so every
    engine computes the identical kept set.

    Scale: one metadata-sized grouped count (map-side combine), the
    rate frame broadcast-joins back, and the keep decision is a narrow
    per-row hash filter in the scan — no data-sized shuffle, no sort.
    Only tau = 0.5 is supported (sqrt); other temperatures need a
    correctly-rounded pow to keep cross-engine parity."""
    if tau != 0.5:
        raise NotImplementedError("only tau=0.5 (sqrt) keeps cross-engine parity")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    # Σ n_j^tau in DECIMAL: per-group terms rounded to 6, summed exactly
    # (order-independent) so the normalizer is bit-identical everywhere.
    # ONE aggregation produces both the normalizer and the total, so the
    # grouped count appears once in the plan (not once per crossJoin).
    term = F.round(F.sqrt(F.col("__n").cast("double")), 6).cast("decimal(28,6)")
    totals = counts.agg(F.sum(term).alias("__d"), F.sum("__n").alias("__t"))
    rates = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            group_col,
            F.floor(
                F.round(
                    F.least(
                        F.lit(1.0),
                        F.round(
                            F.lit(target_frac)
                            * F.col("__t").cast("double")
                            * (term.cast("double") / F.col("__d").cast("double"))
                            / F.col("__n").cast("double"),
                            6,
                        ),
                    ),
                    6,
                )
                * 1_000_000
            )
            .cast("long")
            .alias("__thresh"),
        )
    )
    bucket = md5_long(
        F.concat(F.lit("mix:"), F.col(group_col), F.lit(":"), F.col(id_col).cast("string"))
    ) % 1_000_000
    return (
        df.join(F.broadcast(rates), on=group_col)
        .filter(bucket < F.col("__thresh"))
        .drop("__thresh")
    )


def mixture_waterfill(
    counts: DataFrame,
    group_col: str = "source",
    n_col: str = "n_tokens",
    budget_tokens: int | None = None,
    cap_epochs_micro: int = 1_200_000,
) -> DataFrame:
    """Capped-proportional mixture allocation (water-filling): given
    per-source token counts, target weights w_s ∝ √n_s (the τ = 0.5
    temperature reweighting), a total token ``budget_tokens`` (default:
    23/20 of the corpus — 1.15 epochs' worth), and a per-source repeat
    cap of ``cap_epochs_micro`` micro-epochs (default 1.2), allocate
    a_s = min(cap_s, w_s·λ) with λ chosen so Σ a_s equals the budget —
    the "hit my target mixture without over-epoching small sources"
    problem every training-mix design solves.  If the budget exceeds
    Σ cap_s, every source saturates and the total allocation clamps to
    Σ cap_s (the standard clamp; visible in the output, no hidden
    renormalization).

    The closed form: sort sources by saturation point λ_s = cap_s/w_s
    ascending; source j saturates iff cap_j·(W − cumw_j) < w_j·(B −
    cumcap_j) with EXCLUSIVE prefix sums over that order — a pure
    window predicate, no iteration.  Unsaturated sources share the
    leftover in weight proportion.

    Determinism/parity: weights are micro-unit BIGINTs
    (round(√n·10⁶)), caps are exact integer div, and the saturation
    predicate cross-multiplies in DECIMAL(38,0) — no division until the
    final allocation ratio, one IEEE double op rounded at 6 on both
    engines.  At true 100 TB scale the DECIMAL(38,0) products hold to
    ~10¹⁹-token corpora per source; beyond that, widen to HUGEINT-class
    arithmetic.

    Scale: the counts frame is per-SOURCE (metadata-sized) — the
    ordering window and one-row totals broadcast are planning-scale by
    construction; nothing here touches row-level data."""
    c = counts.select(
        F.col(group_col).alias("source"),
        F.col(n_col).cast("long").alias("n_tokens"),
        F.round(F.sqrt(F.col(n_col).cast("double")) * 1e6, 0)
        .cast("long")
        .alias("weight_micro"),
        F.expr(f"CAST(({n_col} * {cap_epochs_micro}) DIV 1000000 AS BIGINT)").alias(
            "cap_tokens"
        ),
    )
    # A ZERO-token source (everything filtered upstream) has weight 0
    # and cap 0 — it can never receive allocation, and its λ = cap/weight
    # is 0/0, which ANSI mode raises on.  Rather than a second lineage
    # (a union branch measured a second parquet scan), zero-weight rows
    # stay in the ONE frame with a guarded λ literal (−1: they sort
    # first, deterministically, and contribute nothing to any sum), an
    # unsaturated flag by the 0<0 predicate, alloc 0 by the ratio, and a
    # guarded 0.0 epochs.
    # Everything downstream of the grouped count is PER-SOURCE metadata,
    # so the totals, the exclusive prefix sums, and the saturated-set
    # sums are all GLOBAL WINDOWS over the same tiny frame — one lineage,
    # one data scan, zero joins (a self-referencing aggregate would
    # recompute the whole scan per branch: four parquet passes measured).
    # The single-partition window is by construction metadata-sized.
    lam = F.when(
        F.col("weight_micro") > 0,
        F.col("cap_tokens").cast("double")
        / F.col("weight_micro").cast("double"),
    ).otherwise(F.lit(-1.0))
    w_prev = Window.orderBy(lam, "source").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy(lam, "source").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    zero = F.lit(0).cast("long")
    budget = (
        F.expr("CAST((sum(n_tokens) OVER () * 23) DIV 20 AS BIGINT)")
        if budget_tokens is None
        else F.lit(int(budget_tokens)).cast("long")
    )
    staged = (
        c.withColumn("__w", F.sum("weight_micro").over(w_all))
        .withColumn("__b", budget)
        .withColumn(
            "__cumcap", F.coalesce(F.sum("cap_tokens").over(w_prev), zero)
        )
        .withColumn(
            "__cumw", F.coalesce(F.sum("weight_micro").over(w_prev), zero)
        )
        .withColumn(
            "saturated",
            F.col("cap_tokens").cast("decimal(38,0)")
            * (F.col("__w") - F.col("__cumw")).cast("decimal(38,0)")
            < F.col("weight_micro").cast("decimal(38,0)")
            * (F.col("__b") - F.col("__cumcap")).cast("decimal(38,0)"),
        )
        .withColumn(
            "__satcap",
            F.coalesce(
                F.sum(F.when(F.col("saturated"), F.col("cap_tokens"))).over(
                    w_all
                ),
                zero,
            ),
        )
        .withColumn(
            "__satw",
            F.coalesce(
                F.sum(F.when(F.col("saturated"), F.col("weight_micro"))).over(
                    w_all
                ),
                zero,
            ),
        )
    )
    alloc = F.when(F.col("saturated"), F.col("cap_tokens").cast("double")).otherwise(
        F.when(
            F.col("__w") == F.col("__satw"), F.col("cap_tokens").cast("double")
        ).otherwise(
            F.round(
                F.col("weight_micro").cast("double")
                * (F.col("__b") - F.col("__satcap")).cast("double")
                / (F.col("__w") - F.col("__satw")).cast("double"),
                6,
            )
        )
    )
    return (
        staged.withColumn("alloc_tokens", alloc)
        .withColumn(
            "epochs",
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.col("alloc_tokens") / F.col("n_tokens").cast("double"),
                    6,
                ),
            ).otherwise(F.lit(0.0)),
        )
        .select(
            "source",
            "n_tokens",
            "weight_micro",
            "cap_tokens",
            "saturated",
            "alloc_tokens",
            "epochs",
        )
    )


#: 2^60 — the md5_long value range; exact in a double.
_ES_U_DENOM = float(1 << 60)


def weighted_reservoir(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    seed_tag: str = "wres",
) -> DataFrame:
    """Per-group weighted sampling WITHOUT replacement, K items per
    group, inclusion probability ∝ weight — the Efraimidis–Spirakis
    A-ES scheme: each item draws a deterministic uniform u ∈ (0, 1]
    (md5 of the tagged id, so reproducible across runs, engines, and
    partitionings) and the K items with the largest u^(1/w) win —
    equivalently, here, the K SMALLEST keys −ln(u)/w.  This is THE
    one-pass distributed answer to "give me a K-doc weighted sample
    per source over 100 TB": no sequential reservoir state, no
    rejection loop, no global sort — a per-row key expression and one
    per-group top-K.

    Parity: the key is rounded to 6 digits BEFORE ranking (ln is libm
    on both engines; the round absorbs ulp drift — the bigram-surprisal
    convention) with the id as the total-order tiebreak, so both
    engines rank identically.  Items with weight ≤ 0 are excluded (the
    ES domain).

    Scale: zero joins; ONE shuffle on the group key, and the
    rank-≤-K filter compiles to WindowGroupLimit (running top-K before
    the window sort) so no group is ever fully sorted or materialized.

    Output: (group, id, weight, es_key, rank), rank 1..K per group."""
    w = F.col(weight_col).cast("double")
    u = (
        md5_long(F.concat(F.lit(f"{seed_tag}:"), F.col(id_col).cast("string")))
        + F.lit(1)
    ) / F.lit(_ES_U_DENOM)
    key = F.round(-F.log(u) / w, 6)
    win = Window.partitionBy(group_col).orderBy(
        F.col("es_key").asc(), F.col(id_col).asc()
    )
    return (
        df.filter(w > 0)
        .select(
            F.col(group_col),
            F.col(id_col),
            w.alias("weight"),
            key.alias("es_key"),
        )
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(
            group_col,
            id_col,
            "weight",
            "es_key",
            F.col("rank").cast("long").alias("rank"),
        )
    )
