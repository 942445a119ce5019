"""Event-behavior operators (extension family, SURVEY.md §2.11):
gap-based sessionization, event-transition (Markov) statistics, and
bounded dense-grid resampling with forward fill.

These are the event-stream half of the training-data toolbox: user
behavior logs arrive as flat event streams and must be sessionized /
transition-profiled / regularized onto a dense time grid before they can
feed feature stores or sequence models.  The reference engine has no
session operator — its event surface stops at keyed scans — so these are
Spark-first designs, not ports.

Scale notes (100 TB):

* Sessionization is ONE shuffle on ``user_id`` (the window partition
  key); the gap flag and running session index are computed inside the
  sorted partition stream with no second exchange.  Session-level stats
  reuse the same partitioning (groupBy on ``user_id, session_idx`` is a
  prefix of the window key, so AQE coalesces without a re-shuffle).
* Transition counts are the same single window pass followed by a
  map-side-combined groupBy on the (src, dst) pair — the result frame is
  |event_type|² rows, metadata-sized.
* The resample grid is bounded per entity (hours in a FIXED window), so
  the generated frame is |entities| × |buckets| — it scales linearly in
  entities, never in raw event volume, and the grid join is a keyed
  shuffle on the entity id.  Forward fill is a per-entity
  ``last(ignorenulls)`` running window over the already-sorted grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Default session gap: 30 minutes, in microseconds.
SESSION_GAP_US = 30 * 60 * 1_000_000


def with_session_index(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_us: int = SESSION_GAP_US,
) -> DataFrame:
    """Add ``session_idx`` (1-based per user): a new session starts when
    the gap to the previous event is ``>= gap_us`` (strict events-within-
    ``gap_us`` merge — the same open-interval semantics as Spark's
    ``session_window``, whose window end is ``last_ts + gap`` exclusive).

    Order inside a user is (ts, tiebreak) so equal timestamps are
    deterministic.  One shuffle on ``user_col``; lag + running sum both
    ride the same sorted partition stream.
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(us.asc(), F.col(tiebreak_col).asc())
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap >= F.lit(gap_us)), 1).otherwise(0)
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("session_idx", F.sum(new_sess).over(w_run).cast("long"))


def session_stats(
    df_with_idx: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Collapse indexed events to one row per session: bounds, duration
    (exact microseconds), event count, and value total (DECIMAL-routed
    sum for order-independent float parity).
    """
    us = F.unix_micros(F.col(ts_col))
    return df_with_idx.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(us) - F.min(us)).alias("duration_us"),
        F.round(F.sum(F.col(value_col).cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total_value"),
    )


def transition_counts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition statistics over per-user event
    sequences: for each (src_type, dst_type) adjacent pair, the count and
    the conditional probability P(dst | src).

    The probability is one exact-integer division rendered once
    (``n/total`` in IEEE double, rounded to 6), so every engine computes
    the identical value.
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(us.asc(), F.col(tiebreak_col).asc())
    pairs = (
        df.withColumn("dst_type", F.lead(type_col).over(w))
        .filter(F.col("dst_type").isNotNull())
        .groupBy(F.col(type_col).alias("src_type"), "dst_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    # |event_type| rows — metadata-scale; broadcast back for the divide.
    totals = pairs.groupBy("src_type").agg(
        F.sum("n_transitions").cast("long").alias("_total")
    )
    return (
        pairs.join(F.broadcast(totals), "src_type")
        .withColumn(
            "p_transition",
            F.round(F.col("n_transitions").cast("double") / F.col("_total"), 6),
        )
        .drop("_total")
    )


def resample_ffill(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    start: str,
    end_exclusive: str,
    step: str = "1 hour",
) -> DataFrame:
    """Dense per-entity time grid over [start, end_exclusive) with
    bucket aggregates and forward fill.

    Output: one row per (entity, bucket) with ``n_events`` (0 on empty
    buckets), ``bucket_sum`` (NULL on empty buckets), and ``filled_sum``
    — the most recent non-null ``bucket_sum`` at or before this bucket
    (classic forward fill; NULL until the entity's first active bucket).

    The grid is |entities| × |buckets in the fixed window| — bounded by
    design, independent of raw event volume.  Events outside the window
    are pruned at the scan (range filter on ``ts_col``), the grid join
    shuffles on (entity, bucket) only, and the fill is a running
    ``last(ignorenulls)`` inside the per-entity sorted grid.
    """
    lo, hi = F.lit(start).cast("timestamp"), F.lit(end_exclusive).cast("timestamp")
    bucket = F.date_trunc("hour", F.col(ts_col))
    agg = (
        df.filter((F.col(ts_col) >= lo) & (F.col(ts_col) < hi))
        .groupBy(F.col(entity_col), bucket.alias("bucket_ts"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.round(F.sum(F.col(value_col).cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("bucket_sum"),
        )
    )
    # sequence() end is inclusive — step back one step for half-open.
    grid = (
        df.select(entity_col)
        .distinct()
        .select(
            entity_col,
            F.explode(
                F.sequence(lo, hi - F.expr(f"INTERVAL {step}"), F.expr(f"INTERVAL {step}"))
            ).alias("bucket_ts"),
        )
    )
    w_fill = (
        Window.partitionBy(entity_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(agg, [entity_col, "bucket_ts"], "left")
        .select(
            entity_col,
            "bucket_ts",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
            "bucket_sum",
            F.last("bucket_sum", ignorenulls=True).over(w_fill).alias("filled_sum"),
        )
    )


def cusum_alarms(
    events: DataFrame,
    k_col: str = "_k",
    h_col: str = "_h",
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """One-sided upper CUSUM change detection per entity: walking each
    entity's events in (ts, id) order, s_i = max(0, s_{i-1} + v_i − k);
    an alarm fires while s exceeds h — the sequential change-point test
    that catches a sustained mean SHIFT long before any single point
    trips a z-score/MAD outlier rule.  ``k`` (slack) and ``h``
    (decision interval) arrive as columns (broadcast one-row stats
    frames upstream), so the recurrence itself is stats-free.

    Scale: the recurrence is inherently sequential PER ENTITY — one
    Arrow-batched applyInPandas group per entity, parallel across the
    millions of entities a real stream has (the packer's argument,
    operators/selection.py::pack_token_sequences).  Each step is plain
    IEEE double arithmetic evaluated in the same order as the oracle's
    recursive CTE, so values are bit-reproducible.

    Output: (id, event, cusum RAW — callers round at 6 JVM-side for
    cross-engine hashing — and alarm, decided on the raw value)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(event_col, T.LongType()),
            T.StructField("cusum", T.DoubleType()),
            T.StructField("alarm", T.BooleanType()),
        ]
    )

    def _walk(pdf):
        import pandas as pd

        pdf = pdf.sort_values([ts_col, event_col])
        k = float(pdf[k_col].iloc[0])
        h = float(pdf[h_col].iloc[0])
        s = 0.0
        out, alarms = [], []
        for v in pdf[value_col]:
            s = max(0.0, s + float(v) - k)
            # raw value out — rounding happens JVM-side (F.round is
            # HALF_UP like the oracle's ROUND; python round() is
            # banker's and would diverge at exact .5 boundaries)
            out.append(s)
            alarms.append(s > h)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                event_col: pdf[event_col].values,
                "cusum": out,
                "alarm": alarms,
            }
        )

    from spanner_jdbc_converter_spark.session import session_shuffle_width

    cols = [id_col, event_col, ts_col, value_col, k_col, h_col]
    # Explicit-width spread before the group walk: the groupBy's own
    # exchange is AQE-coalesced by BYTES (near-serial on a few-MB
    # input) while the walk is CPU-bound Python — pin the exchange to
    # the session shuffle width instead; the groupBy reuses the
    # partitioning, so the plan still carries exactly ONE exchange
    # (guide §2.4/§2.6; optimization r17).
    spread = events.select(*cols).repartition(
        session_shuffle_width(events.sparkSession), id_col
    )
    return spread.groupBy(id_col).applyInPandas(_walk, schema)


def scd2_intervals(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    state_col: str = "event_type",
) -> DataFrame:
    """Slowly-changing-dimension type-2 compaction of a change stream:
    per entity, collapse consecutive repeats of ``state_col`` and emit
    one VALIDITY INTERVAL per state run — (valid_from = the run's first
    event, valid_to = the next run's start, NULL while current).  The
    standard warehouse build for "what was this entity's state at time
    t" queries, and the interval side of an as-of join.

    Plan shape: both windows — the lag that finds run starts and the
    lead that closes each interval — ride the SAME (id) partitioning
    ordered by (ts, seq), so the whole build is ONE exchange + two
    partition-local window passes over it; nothing else shuffles.
    Determinism: run boundaries compare exact values on a total
    (ts, seq) order — no floats.

    Output: (id_col, state_col, valid_from, valid_to, is_current)."""
    w = Window.partitionBy(id_col).orderBy(ts_col, seq_col)
    runs = (
        events.select(id_col, ts_col, seq_col, state_col)
        .withColumn("__prev", F.lag(state_col).over(w))
        .filter(
            F.col("__prev").isNull() | (F.col(state_col) != F.col("__prev"))
        )
    )
    return (
        runs.withColumn("__to", F.lead(ts_col).over(w))
        .select(
            F.col(id_col),
            F.col(state_col),
            F.col(ts_col).alias("valid_from"),
            F.col("__to").alias("valid_to"),
            F.col("__to").isNull().alias("is_current"),
        )
    )


#: Default debounce gap: 30 minutes, µs.
DEBOUNCE_GAP_US = 30 * 60 * 1_000_000


def debounce_events(
    events: DataFrame,
    gap_us: int = DEBOUNCE_GAP_US,
    id_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> DataFrame:
    """Telemetry debounce: within each (entity, event type) stream, an
    event is KEPT iff it is the first or at least ``gap_us`` after the
    last KEPT event — the retry/double-fire/chatter cleanup run before
    events feed counts or funnels.  A lag-based filter cannot express
    this: the decision depends on the last SURVIVOR, not the previous
    event (three events 20 min apart under a 30-min gap keep the 1st
    and 3rd; lag-filtering would drop both followers).

    Scale: the recurrence is inherently sequential per (entity, type),
    but Arrow groups are cut on the ENTITY alone — (entity, type)
    groups average a dozen rows, and per-group Arrow overhead dominated
    (measured 14.1 s vs 3.8 s for the same-shaped CUSUM at 5× fewer
    groups); the per-type state resets inside one sorted pass over the
    entity's events instead.  State is one integer µs per live type.
    Exact integer arithmetic end-to-end, so the oracle's recursive CTE
    replays it bit-for-bit.

    Output: one row per input event — (id, type, seq, kept)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(type_col, T.StringType()),
            T.StructField(seq_col, T.LongType()),
            T.StructField("kept", T.BooleanType()),
        ]
    )

    def _walk(pdf):
        import pandas as pd

        pdf = pdf.sort_values([type_col, "__us", seq_col])
        kept = []
        last: dict = {}
        for et, us in zip(pdf[type_col], pdf["__us"]):
            prev = last.get(et)
            ok = prev is None or int(us) - prev >= gap_us
            kept.append(bool(ok))
            if ok:
                last[et] = int(us)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                type_col: pdf[type_col].values,
                seq_col: pdf[seq_col].values,
                "kept": kept,
            }
        )

    from spanner_jdbc_converter_spark.session import session_shuffle_width

    prepped = events.select(
        id_col, type_col, seq_col, F.unix_micros(F.col(ts_col)).alias("__us")
    )
    # Explicit-width spread before the CPU-bound group walk — same
    # single-exchange contract as cusum_alarms (measured r17: 4.26 s on
    # 2 AQE-coalesced partitions vs 1.21 s on the session width).
    spread = prepped.repartition(
        session_shuffle_width(events.sparkSession), id_col
    )
    return spread.groupBy(id_col).applyInPandas(_walk, schema)
