"""Batch-equivalent corpus entries for the streaming operators
(SURVEY.md §2.10).

Structured Streaming's contract is that a streaming query equals the
batch query on the same input — so the oracle-checkable surface of each
streaming operator is its batch twin, registered here.  The *streaming*
execution of the same function bodies (watermarks, memory sinks,
availableNow triggers, stateful ops) is exercised in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spanner_jdbc_converter_spark.catalog import load_table
from spanner_jdbc_converter_spark.plans.registry import register
from spanner_jdbc_converter_spark.streaming import ops


@register(
    "events_tumbling_hourly",
    oracle="""
    SELECT time_bucket(INTERVAL 1 hour, ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type — F.window ≡ time_bucket
    (both align to the epoch-hour grid)."""
    return ops.tumbling_counts(load_table(spark, sf_dir, "events"))


@register(
    "events_sliding_windows",
    oracle="""
    WITH b AS (SELECT time_bucket(INTERVAL 30 minute, ts) AS tb FROM events),
         w AS (SELECT unnest([tb, tb - INTERVAL 30 minute]) AS window_start FROM b)
    SELECT window_start, COUNT(*) AS n_events
    FROM w
    GROUP BY 1
    """,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: every event lands in
    exactly two windows (the oracle unnests the two window starts)."""
    return ops.sliding_counts(load_table(spark, sf_dir, "events"))


@register(
    "events_session_windows",
    oracle="""
    WITH o AS (SELECT user_id, ts,
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
               FROM events),
         m AS (SELECT user_id, ts,
                      CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 2 hour
                           THEN 1 ELSE 0 END AS new_s
               FROM o),
         i AS (SELECT user_id, ts,
                      SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS island
               FROM m)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 2 hour AS session_end,
           COUNT(*) AS n_events
    FROM i
    GROUP BY user_id, island
    """,
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 2-hour gap.  F.session_window's
    semantics (end = last event + gap; an event exactly gap after the
    previous one starts a NEW session) are reproduced by the oracle's
    gaps-and-islands form with ``>= INTERVAL``."""
    return ops.session_counts(load_table(spark, sf_dir, "events"), gap="2 hours")


@register(
    "events_interval_join",
    oracle="""
    SELECT a.event_id AS l_event_id,
           a.user_id AS user_id,
           a.ts AS l_ts,
           b.event_id AS r_event_id,
           b.ts AS r_ts,
           epoch_us(a.ts) - epoch_us(b.ts) AS lag_us
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'purchase' AND b.event_type = 'click'
     AND b.ts >= a.ts - INTERVAL 2 hour
     AND b.ts <= a.ts
    """,
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join (ops.interval_join):
    purchases matched to the same user's clicks within the preceding two
    hours, with the exact microsecond lag.  Streaming execution with
    watermarked state on both sides is exercised in
    tests/test_streaming.py."""
    return ops.interval_join(load_table(spark, sf_dir, "events"))


@register(
    "events_user_totals",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY user_id
    """,
)
def events_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the custom stateful streaming operator
    (ops.running_user_counts / applyInPandasWithState): final per-user
    event count + value sum.  The streaming execution — state updates
    per micro-batch, O(users) state — is exercised in
    tests/test_streaming.py; this entry pins the end-of-stream answer
    (value routed through DECIMAL for order-independent summation)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("value_sum"),
    )


@register(
    "events_asof_join",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, 0 AS side, event_id FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, 1 AS side, event_id FROM events WHERE event_type = 'purchase'
    ), w AS (
      SELECT user_id, ts, side, event_id,
             last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, side, event_id
                     ROWS UNBOUNDED PRECEDING) AS click_id,
             last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, side, event_id
                     ROWS UNBOUNDED PRECEDING) AS click_ts
      FROM u
    )
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, click_id,
           epoch_us(ts) - epoch_us(click_ts) AS staleness_us
    FROM w WHERE side = 1
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): every purchase matched to the
    same user's most recent click at-or-before it, with exact-µs
    staleness; purchases with no prior click keep NULLs (left-outer
    as-of).  Both engines run the identical union + last_value(ignore
    nulls) window program — one key shuffle, no range explosion."""
    from spanner_jdbc_converter_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click")
    out = asof_join(purchases, clicks, on="user_id")
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("match_event_id").alias("click_id"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("match_ts"))).alias(
            "staleness_us"
        ),
    )


@register(
    "events_rolling_window_1h",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_1h,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER w, 2) AS DOUBLE)
             AS value_sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def events_rolling_window_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1-hour activity features (count + value sum
    over the preceding hour, per user) — the time-range window frame
    (RANGE BETWEEN on event time) that powers session features and rate
    limits.  Distributed per user; the value-range frame makes the
    result independent of tie order, and the decimal-routed sum keeps
    it independent of accumulation order.  At 100 TB the partition key
    (user) bounds every frame — no global sort anywhere."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")).over(w), 2)
        .cast("double")
        .alias("value_sum_1h"),
    )
