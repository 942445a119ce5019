"""Window-function and advanced-aggregation parity corpus.

Completes the §2.4/§2.5 capability surface beyond the basic top-k and
lag entries in queries.py: lead(), the rank family, running/sliding
window frames, exact statistical moments, interpolated percentiles,
pivot, and explicit GROUPING SETS.

Float parity: rank-family ratios (percent_rank, cume_dist) are single
divisions of exact integers — bit-stable.  Moments are derived from
decimal sums with the identical double expression tree on both engines
(no engine-native variance, whose fold order is nondeterministic under
partitioned execution).  Casting a double to DECIMAL rounds to nearest
on both engines and exact ties are unrepresentable in binary, so the
decimal routing of products is portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spanner_jdbc_converter_spark.catalog import load_table
from spanner_jdbc_converter_spark.plans.queries import _dec, _money
from spanner_jdbc_converter_spark.plans.registry import register


@register(
    "window_lead_next_event",
    oracle="""
    SELECT event_id, user_id, event_type,
           lead(event_type) OVER w AS next_type,
           epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lead_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead() over the event stream: each event annotated with the next
    event's type and the forward gap in exact integer microseconds —
    the complement of the lag() entry (window_event_interarrival).

    Scale: one hash(user_id) exchange + per-partition sort; lead is
    computed in a single pass with no extra shuffle."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))).alias("gap_us"),
    )


@register(
    "window_rank_surface",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full rank family in one pass: rank, dense_rank, percent_rank,
    cume_dist, ntile — all over a deterministic (totalprice DESC,
    orderkey) order within priority.  percent_rank and cume_dist are
    ratios of exact integers, so one double division each — bit-stable.

    Scale: all five functions share a single window spec → one
    hash(o_orderpriority) exchange + one sort, no matter how many rank
    columns are added."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "window_running_frames",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                AS DOUBLE) AS running_spend,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
                AS DOUBLE) AS last3_spend,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
                AS last3_cnt,
           FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey)
                AS first_orderkey
    FROM orders
    """,
)
def window_running_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames: cumulative sum (UNBOUNDED PRECEDING..CURRENT), a
    3-row sliding sum/count, and first_value — the running-total shapes
    a copy-pipeline progress tracker needs (A2 counters, SURVEY §2.4,
    made windowed).  Frame sums route through decimal so intra-frame
    fold order can't drift.

    Scale: every frame shares one (custkey) partitioning + one
    (orderdate, orderkey) sort; frames are computed streaming over the
    sorted run — no per-frame rescans."""
    o = load_table(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last3 = base.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        _money(F.sum(_dec(F.col("o_totalprice"))).over(cum), "running_spend"),
        _money(F.sum(_dec(F.col("o_totalprice"))).over(last3), "last3_spend"),
        F.count(F.lit(1)).over(last3).cast("long").alias("last3_cnt"),
        F.first("o_orderkey").over(base).alias("first_orderkey"),
    )


@register(
    "agg_stats_moments",
    oracle="""
    WITH m AS (
      SELECT c_mktsegment,
             COUNT(*) AS n,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(24,6))) AS DOUBLE) AS s2,
             MIN(c_acctbal) AS min_bal,
             MAX(c_acctbal) AS max_bal
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, n, min_bal, max_bal,
           ROUND(s1 / n, 4) AS avg_bal,
           ROUND((n * s2 - s1 * s1) / (n * (n - 1)), 4) AS var_bal,
           ROUND(SQRT((n * s2 - s1 * s1) / (n * (n - 1))), 4) AS stddev_bal
    FROM m
    ORDER BY c_mktsegment
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moments per segment: avg, sample variance, sample
    stddev from exact decimal power sums — NOT the engine-native
    var_samp/stddev, whose streaming (Welford) accumulation order is
    partition-dependent and would never hash-match across engines.
    The identity (nΣx² − (Σx)²)/(n(n−1)) over exact sums gives both
    engines the same double operands in the same order.

    Scale: one map-side-partial groupBy; the power sums are one extra
    column each — variance at 100 TB costs the same shuffle as count."""
    c = load_table(spark, sf_dir, "customer")
    m = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("s1"),
        F.sum((F.col("c_acctbal") * F.col("c_acctbal")).cast("decimal(24,6)"))
        .cast("double")
        .alias("s2"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    var = (n * s2 - s1 * s1) / (n * (n - 1))
    return m.select(
        "c_mktsegment",
        "n",
        "min_bal",
        "max_bal",
        F.round(s1 / n, 4).alias("avg_bal"),
        F.round(var, 4).alias("var_bal"),
        F.round(F.sqrt(var), 4).alias("stddev_bal"),
    ).orderBy("c_mktsegment")


@register(
    "agg_median_percentiles",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_median_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (quartiles of order value per
    priority).  Spark's `percentile` and DuckDB's `quantile_cont` share
    the same definition — lower + (upper − lower)·frac at rank
    (n−1)·p — so results agree to the rounding digit.

    Scale: exact percentile requires collecting each group's values
    (O(n log n) sort per group); for 100 TB dashboards swap in
    approx_percentile (t-digest, mergeable map-side) — kept exact here
    because the oracle gate demands bit-comparable output."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
            F.round(F.percentile("o_totalprice", F.lit(0.50)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority × status, statuses as columns.
    Explicit pivot values keep the schema static (no extra distinct-
    values job) — mandatory at scale, where an unbounded pivot column
    set is a plan-explosion hazard.  Missing combinations coalesce to 0
    to match the CASE-WHEN oracle."""
    o = load_table(spark, sf_dir, "orders")
    pv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).cast("long").alias(s) for s in ["F", "O", "P"]],
    ).orderBy("o_orderpriority")


@register(
    "grouping_sets_priority_status",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    ORDER BY gid, o_orderpriority, o_orderstatus
    """,
)
def grouping_sets_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither a rollup nor a cube: the two
    one-dimension marginals plus the grand total, without the pair
    cell).  grouping() flags disambiguate real NULLs from subtotal
    rows.  Spark expands the sets map-side (Expand) into one shuffle —
    same execution shape as the rollup/cube entries."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gsets")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS BIGINT) AS gid,
               COUNT(*) AS n_orders
        FROM orders_gsets
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY gid, o_orderpriority, o_orderstatus
        """
    )


@register(
    "events_banded_range_join",
    oracle="""
    SELECT band_id, COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS value_sum
    FROM events
    JOIN (VALUES (0, 0.0, 10.0), (1, 10.0, 50.0), (2, 50.0, 150.0),
                 (3, 150.0, 500.0)) AS bands(band_id, lo, hi)
      ON value >= lo AND value < hi
    GROUP BY band_id
    ORDER BY band_id
    """,
)
def events_banded_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: events matched to [lo, hi) value bands through the
    bucket-expansion equi-join (operators/ranges.py) — a hash join plus
    residual filter instead of the O(|fact|×|bands|) nested loop the
    plain theta predicate would plan.  The oracle states the naive
    range join; results are identical by construction."""
    from spanner_jdbc_converter_spark.operators.ranges import banded_range_join

    e = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, 10.0, 50.0), (2, 50.0, 150.0), (3, 150.0, 500.0)],
        "band_id long, lo double, hi double",
    )
    return (
        banded_range_join(e, bands, "value", step=10.0)
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _money(F.sum(_dec(F.col("value"))), "value_sum"),
        )
        .orderBy("band_id")
    )


@register(
    "events_hypertable_rollup",
    oracle="""
    WITH b AS (SELECT date_trunc('day', ts) AS day_b,
                      date_trunc('hour', ts) AS hour_b,
                      value
               FROM events)
    SELECT day_b, hour_b,
           CAST(GROUPING(day_b) * 2 + GROUPING(hour_b) AS BIGINT) AS gid,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS value_sum
    FROM b
    GROUP BY GROUPING SETS ((day_b, hour_b), (day_b), ())
    ORDER BY gid, day_b, hour_b
    """,
)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: hourly, daily, and
    grand-total aggregates of the event stream in ONE pass — grouping
    sets over derived time buckets (the TimescaleDB/Druid rollup shape).
    Spark expands the three granularities map-side into a single
    shuffle; at 100 TB this replaces three separate scans with one."""
    e = load_table(spark, sf_dir, "events")
    e.select(
        F.date_trunc("day", F.col("ts")).alias("day_b"),
        F.date_trunc("hour", F.col("ts")).alias("hour_b"),
        "value",
    ).createOrReplaceTempView("events_rollup_base")
    return spark.sql(
        """
        SELECT day_b, hour_b,
               CAST(grouping(day_b) * 2 + grouping(hour_b) AS BIGINT) AS gid,
               COUNT(*) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS value_sum
        FROM events_rollup_base
        GROUP BY GROUPING SETS ((day_b, hour_b), (day_b), ())
        ORDER BY gid, day_b, hour_b
        """
    )


@register(
    "skew_salted_aggregation",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def skew_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation under the correctness gate: revenue
    by returnflag (3 keys — a worst-case skew shape: a plain groupBy
    sends ~1/3 of a 100 TB table to each of three reducers).  Phase 1
    aggregates on (key, salt) with a deterministic 16-way salt from the
    PK — 48 balanced partial groups; phase 2 re-aggregates per key.
    Decimal partials re-sum exactly, so the oracle is the PLAIN group
    by — the rewrite is provably semantics-preserving.  (The join-side
    analog lives in operators/skew.py::salted_join.)"""
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn("__salt", F.pmod(F.col("l_orderkey"), F.lit(16)))
    partial = salted.groupBy("l_returnflag", "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("__rev"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("__n").cast("long").alias("n_lines"),
            _money(F.sum("__rev"), "revenue"),
        )
        .orderBy("l_returnflag")
    )


_QS_KEY_SQL = (
    "CAST('0x' || substring(md5(concat('qs:', CAST(l_orderkey AS VARCHAR), ':',"
    " CAST(l_linenumber AS VARCHAR))), 1, 15) AS BIGINT)"
)


@register(
    "agg_sampled_quantiles",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v
      FROM lineitem WHERE {_QS_KEY_SQL} % 16 = 0)
    SELECT l_returnflag,
           COUNT(*) AS n_sampled,
           ROUND(quantile_cont(v, 0.50), 4) AS p50,
           ROUND(quantile_cont(v, 0.90), 4) AS p90,
           ROUND(quantile_cont(v, 0.99), 4) AS p99
    FROM s GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from a deterministic 1/16 hash sample — the mergeable,
    scale-safe alternative to exact percentiles when the full sort is
    too expensive: the portable md5 row key makes the sample identical
    on every engine (unlike TABLESAMPLE/rand()), so even the
    approximation is value-hash-checkable.  At 100 TB the same plan
    shape holds — the sample is a narrow pushed-down filter, and the
    per-group exact quantile then runs on 1/16 of the data.

    Exact-percentile parity: Spark `percentile` and DuckDB
    `quantile_cont` share the lower+(upper−lower)·frac definition."""
    from spanner_jdbc_converter_spark.functions.hashing import md5_long

    li = load_table(spark, sf_dir, "lineitem")
    key = md5_long(
        F.concat(
            F.lit("qs:"),
            F.col("l_orderkey").cast("string"),
            F.lit(":"),
            F.col("l_linenumber").cast("string"),
        )
    )
    return (
        li.filter(key % 16 == 0)
        .select("l_returnflag", F.col("l_extendedprice").cast("double").alias("v"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.percentile("v", F.lit(0.50)), 4).alias("p50"),
            F.round(F.percentile("v", F.lit(0.90)), 4).alias("p90"),
            F.round(F.percentile("v", F.lit(0.99)), 4).alias("p99"),
        )
        .orderBy("l_returnflag")
    )
