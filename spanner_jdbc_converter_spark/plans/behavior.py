"""Event-behavior corpus: first-principles gap sessionization with
session-level stats, Markov transition statistics, MAD-based robust
outliers, and dense-grid resampling with forward fill.

(The engine-native ``F.session_window`` path is a separate entry,
``events_session_windows`` in plans/streaming_queries.py; the
lag/cumsum entry here carries value totals and exact µs durations and
validates the same gaps-and-islands semantics from first principles.)

The reference's event surface stops at keyed scans and time-bucketed
aggregates; these entries are the behavioral layer a training-data
pipeline builds on top of raw event logs — sessions for sequence models,
transition matrices for behavioral features, MAD outliers for robust
data-quality triage (z-scores break under the heavy tails they are meant
to catch), and dense resampling for feature stores that require a value
at every tick.

Float parity follows the corpus conventions: value sums route through
DECIMAL(18,4), exact-integer divisions are rendered once in IEEE double
and rounded to 6, and exact interpolated percentiles (Spark
``percentile`` ≡ DuckDB ``quantile_cont``) are rounded to 4 before any
further arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spanner_jdbc_converter_spark.catalog import load_table
from spanner_jdbc_converter_spark.operators import sessions as ss
from spanner_jdbc_converter_spark.plans.registry import register

@register(
    "events_sessionization",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_id, ts, value,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    s AS (
      SELECT *, SUM(CASE WHEN gap_us IS NULL OR gap_us >= {ss.SESSION_GAP_US}
                         THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM o
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_value
    FROM s GROUP BY user_id, session_idx
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization from first principles: a new session
    starts when the inter-event gap is >= 30 minutes; sessions collapse
    to (bounds, exact µs duration, count, value total).

    Scale: ONE shuffle on user_id — the lag, the running session index,
    and the session-level groupBy all ride the same partitioning (the
    groupBy key extends the window key, so AQE reuses the exchange).
    Duration stays in exact integer microseconds; the value total routes
    through DECIMAL so the sum is order-independent.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    return ss.session_stats(ss.with_session_index(ev))


@register(
    "events_markov_transitions",
    oracle="""
    WITH p AS (
      SELECT event_type AS src_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) AS dst_type
      FROM events
    ),
    c AS (
      SELECT src_type, dst_type, COUNT(*) AS n_transitions
      FROM p WHERE dst_type IS NOT NULL GROUP BY src_type, dst_type
    ),
    t AS (SELECT src_type, SUM(n_transitions) AS total FROM c GROUP BY src_type)
    SELECT src_type, dst_type, n_transitions,
           ROUND(CAST(n_transitions AS DOUBLE) / total, 6) AS p_transition
    FROM c JOIN t USING (src_type)
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current event type).

    Scale: one window shuffle on user_id, then a map-side-combined
    groupBy to a |types|²-row frame; the per-source totals are
    metadata-sized and broadcast for the divide.  The probability is one
    exact-int IEEE division, rounded to 6 — engine-identical.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    return ss.transition_counts(ev)


@register(
    "events_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, ROUND(quantile_cont(value, 0.5), 4) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             ROUND(ABS(e.value - m.med), 4) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, ROUND(quantile_cont(adev, 0.5), 4) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value,
           ROUND(ABS(d.value - d.med) / m.mad, 6) AS mad_score
    FROM dev d JOIN mad m USING (event_type)
    WHERE m.mad > 0 AND ABS(d.value - d.med) / m.mad > 3.5
    """,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outliers by median absolute deviation: |value − median| >
    3.5 × MAD per event type.  MAD survives the heavy tails that inflate
    a z-score's σ and mask the very outliers being hunted — the robust
    twin of ``events_zscore_outliers``.

    Parity: both medians are exact interpolated percentiles (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``), each rounded to 4 at its
    narrowest point (|event_type| values) before re-use; the score is
    then pure IEEE arithmetic rounded to 6.  Scale: two grouped exact
    percentiles over |event_type| groups with metadata-sized results
    broadcast back; the data is scanned, never windowed.  (Exact
    percentile collects each group's values — the documented trade
    against approx_percentile, as in agg_median_percentiles.)
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.round(F.abs(F.col("value") - F.col("med")), 4)
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.percentile("adev", F.lit(0.5)), 4).alias("mad")
    )
    score = F.abs(F.col("value") - F.col("med")) / F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (score > 3.5))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(score, 6).alias("mad_score"),
        )
    )


_RS_START, _RS_END = "2024-01-01 00:00:00", "2024-01-08 00:00:00"


@register(
    "events_hourly_resample_ffill",
    oracle=f"""
    WITH agg AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
             COUNT(*) AS n,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS bucket_sum
      FROM events
      WHERE ts >= TIMESTAMP '{_RS_START}' AND ts < TIMESTAMP '{_RS_END}'
      GROUP BY 1, 2
    ),
    grid AS (
      SELECT u.user_id, g.bucket_ts
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN (
        SELECT unnest(generate_series(TIMESTAMP '{_RS_START}',
                                      TIMESTAMP '{_RS_END}' - INTERVAL 1 HOUR,
                                      INTERVAL 1 HOUR)) AS bucket_ts
      ) g
    )
    SELECT g.user_id, g.bucket_ts,
           COALESCE(a.n, 0) AS n_events,
           a.bucket_sum,
           LAST_VALUE(a.bucket_sum IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket_ts
             ROWS UNBOUNDED PRECEDING) AS filled_sum
    FROM grid g LEFT JOIN agg a USING (user_id, bucket_ts)
    """,
)
def events_hourly_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly resample of the first week of events per user, with
    forward-filled bucket sums — the regularization a feature store or
    sequence model needs (a value at EVERY tick, not just active ones).

    Scale: the grid is |users| × 168 rows — linear in entities, never in
    event volume; the window filter prunes the scan, the grid join
    shuffles on (user, bucket) only, and the fill is a running
    last(ignorenulls) inside each user's sorted grid.  The fixed window
    makes the output size a planning-time constant per entity.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return ss.resample_ffill(
        ev, "user_id", "ts", "value", _RS_START, _RS_END, "1 hour"
    )


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation — burstiness/regularity feature per user.
# ---------------------------------------------------------------------------


@register(
    "events_lag1_autocorr",
    oracle="""
    WITH p AS (
      SELECT user_id,
             CAST(value AS DECIMAL(18,4)) AS x,
             CAST(LEAD(value) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id)
                  AS DECIMAL(18,4)) AS y
      FROM events
    ),
    s AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM p WHERE y IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n AS n_pairs,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS autocorr
    FROM s
    WHERE n >= 3
      AND (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
      AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
    """,
)
def events_lag1_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag-1 autocorrelation of event values (Pearson r over
    consecutive pairs) — the burstiness/regularity feature of a user's
    value series.

    Parity: all five moment sums route through DECIMAL (x, y and their
    products are ≤4-decimal exact values, so SUMs are exact and
    order-independent); the Pearson assembly is then a FIXED chain of
    IEEE double ops (casts rendered in the same order both sides) with
    one sqrt, rounded to 6.  Scale: one window shuffle on user_id for
    the lead, then a map-side-combined groupBy on the same key.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us.asc(), F.col("event_id").asc())
    p = ev.select(
        "user_id",
        F.col("value").cast("decimal(18,4)").alias("x"),
        F.lead(F.col("value")).over(w).cast("decimal(18,4)").alias("y"),
    ).filter(F.col("y").isNotNull())
    s = p.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    varx = nd * sxx - sx * sx
    vary = nd * syy - sy * sy
    return (
        s.filter((F.col("n") >= 3) & (varx > 0) & (vary > 0))
        .select(
            "user_id",
            F.col("n").alias("n_pairs"),
            F.round((nd * sxy - sx * sy) / F.sqrt(varx * vary), 6).alias(
                "autocorr"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Level-shift (changepoint) detector — two-sided rolling-mean break.
# ---------------------------------------------------------------------------

# The fixture's events are ~0.1/user/hour (constant across SF — users scale,
# per-user density doesn't), so the break windows are sized in DAYS: 72 h a
# side gives ~7 events of support.  Threshold 60.0 sits at the ~p99 of the
# observed |shift| distribution at every fixture SF (probed sf0.001/0.01/0.1:
# max 78/106/149), so the detector emits a real, non-vacuous candidate set.
_LS_WINDOW_US = 259_200_000_000  # 72 hours each side
_LS_MIN_N = 5                    # require support on both sides
_LS_THRESHOLD = 60.0             # |right mean - left mean| break size


@register(
    "events_level_shift_detect",
    oracle=f"""
    WITH f AS (
      SELECT event_id, user_id, ts, value,
             COUNT(*) OVER wl AS nl,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER wl AS DOUBLE) AS suml,
             COUNT(*) OVER wr AS nr,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER wr AS DOUBLE) AS sumr
      FROM events
      WINDOW
        wl AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN {_LS_WINDOW_US} PRECEDING AND 1 PRECEDING),
        wr AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN CURRENT ROW AND {_LS_WINDOW_US} FOLLOWING)
    )
    SELECT event_id, user_id, ts,
           ROUND(sumr / nr - suml / nl, 6) AS shift
    FROM f
    WHERE nl >= {_LS_MIN_N} AND nr >= {_LS_MIN_N}
      AND ABS(sumr / nr - suml / nl) > {_LS_THRESHOLD!r}
    """,
)
def events_level_shift_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint candidates per user: events where the mean value of
    the NEXT hour differs from the mean of the PREVIOUS hour by more
    than a threshold (with minimum support on both sides) — the
    windowed level-shift detector that, unlike CUSUM, has no sequential
    recurrence and therefore scales as plain window frames.

    Parity: both side-sums route through DECIMAL (exact, tie-order-
    independent — events with equal timestamps land in the same RANGE
    frame on both engines); each mean is ONE double division and the
    shift one subtraction, rounded to 6.  Scale: one shuffle on
    user_id; both RANGE frames ride the same sorted partition stream.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    us = F.unix_micros(F.col("ts"))
    wl = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-_LS_WINDOW_US, -1)
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(Window.currentRow, _LS_WINDOW_US)
    )
    dec = F.col("value").cast("decimal(18,4)")
    f = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(wl).alias("nl"),
        F.sum(dec).over(wl).cast("double").alias("suml"),
        F.count(F.lit(1)).over(wr).alias("nr"),
        F.sum(dec).over(wr).cast("double").alias("sumr"),
    )
    shift = F.col("sumr") / F.col("nr") - F.col("suml") / F.col("nl")
    return (
        f.filter(
            (F.col("nl") >= _LS_MIN_N)
            & (F.col("nr") >= _LS_MIN_N)
            & (F.abs(shift) > _LS_THRESHOLD)
        )
        .select("event_id", "user_id", "ts", F.round(shift, 6).alias("shift"))
    )


# ---------------------------------------------------------------------------
# Session-relative features — the per-event sequence-model shape.
# ---------------------------------------------------------------------------


@register(
    "events_session_features",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_id, ts, event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    s AS (
      SELECT *, SUM(CASE WHEN gap_us IS NULL OR gap_us >= {ss.SESSION_GAP_US}
                         THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM o
    )
    SELECT user_id, event_id, event_type,
           CAST(session_idx AS BIGINT) AS session_idx,
           CAST(ROW_NUMBER() OVER ws AS BIGINT) AS seq_in_session,
           epoch_us(ts) - MIN(epoch_us(ts)) OVER ws_all AS us_since_start
    FROM s
    WINDOW
      ws AS (PARTITION BY user_id, session_idx
             ORDER BY epoch_us(ts), event_id),
      ws_all AS (PARTITION BY user_id, session_idx)
    """,
)
def events_session_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EVENT session-relative features: the session index, the
    event's 1-based position inside its session, and exact µs since the
    session started — the flattened sequence-model input (position
    embeddings, recency features) that session-level aggregates can't
    provide.

    Scale: the session index rides the one user_id shuffle
    (operators/sessions.py); the within-session rank and start-time
    windows partition on (user_id, session_idx) — an extension of the
    same key, so the sorted stream is reused without a second exchange.
    All features are exact integers.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    idx = ss.with_session_index(ev)
    us = F.unix_micros(F.col("ts"))
    ws = Window.partitionBy("user_id", "session_idx").orderBy(
        us.asc(), F.col("event_id").asc()
    )
    ws_all = Window.partitionBy("user_id", "session_idx")
    return idx.select(
        "user_id",
        "event_id",
        "event_type",
        "session_idx",
        F.row_number().over(ws).cast("long").alias("seq_in_session"),
        (us - F.min(us).over(ws_all)).alias("us_since_start"),
    )


# ---------------------------------------------------------------------------
# Seasonal (hour-of-day) baseline deviation — rhythm-aware anomaly score.
# ---------------------------------------------------------------------------


@register(
    "events_seasonal_deviation",
    oracle="""
    WITH b AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS hod, COUNT(*) AS cnt,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sumv
      FROM events GROUP BY 1, 2
    ),
    base AS (
      SELECT event_type, hod, cnt, ROUND(sumv / cnt, 6) AS hod_mean
      FROM b
    )
    SELECT e.event_id, e.event_type,
           CAST(EXTRACT(hour FROM e.ts) AS BIGINT) AS hod,
           e.value, m.hod_mean,
           ROUND(e.value - m.hod_mean, 6) AS seasonal_dev
    FROM events e
    JOIN base m ON m.event_type = e.event_type
                AND m.hod = EXTRACT(hour FROM e.ts)
    WHERE ABS(e.value - m.hod_mean) > 200.0
    """,
)
def events_seasonal_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rhythm-aware anomaly triage: each event scored against the mean
    for ITS OWN (event_type, hour-of-day) cell, flagging |deviation| >
    200 — the seasonal baseline that keeps a nightly batch spike from
    looking anomalous at 3am and masks nothing at noon (the global
    baselines are events_zscore_outliers / events_mad_outliers).

    Parity: cell means route through DECIMAL sums and ONE rounded
    division; hour extraction is exact integer on µs-truncated
    timestamps (UTC-pinned session ≡ DuckDB's naive timestamps).
    Scale: the baseline is a |types|×24-cell map-side-combined
    aggregate, broadcast back onto the scan; no window over the data.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    hod = F.hour("ts").cast("long")
    base = (
        ev.groupBy("event_type", hod.alias("hod"))
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("hod_mean")
        )
    )
    dev = F.col("value") - F.col("hod_mean")
    return (
        ev.withColumn("hod", hod)
        .join(F.broadcast(base), ["event_type", "hod"])
        .filter(F.abs(dev) > 200.0)
        .select(
            "event_id",
            "event_type",
            "hod",
            "value",
            "hod_mean",
            F.round(dev, 6).alias("seasonal_dev"),
        )
    )


# ---------------------------------------------------------------------------
# EWMA smoothing — the exponential recurrence recast as a bounded window.
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.5
_EWMA_K = 20  # 0.5^20 ≈ 1e-6: tail truncation is below the rounding digit


def _ewma_terms_sql() -> tuple[str, str]:
    nums, dens = [], []
    for j in range(_EWMA_K + 1):
        w = repr((1 - _EWMA_ALPHA) ** j)
        x = "CAST(value AS DOUBLE)" if j == 0 else f"LAG(CAST(value AS DOUBLE), {j}) OVER w"
        nums.append(f"COALESCE({x} * {w}, 0.0)")
        dens.append(f"CASE WHEN {x} IS NOT NULL THEN {w} ELSE 0.0 END")
    return " + ".join(nums), " + ".join(dens)


@register(
    "events_ewma_smoothing",
    oracle=f"""
    SELECT event_id, user_id, ts,
           ROUND(({_ewma_terms_sql()[0]}) / ({_ewma_terms_sql()[1]}), 6) AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """,
)
def events_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user (α = 0.5,
    normalized over available history — pandas ``adjust=True``
    semantics).  The textbook EWMA is a SEQUENTIAL recurrence
    (s_t = αx_t + (1−α)s_{t−1}) — unusable as a distributed plan; here
    it is recast as a BOUNDED lag window: weights (1−α)^j decay below
    the 6-digit rounding within K = 20 lags, so the truncated form is
    value-identical to the recurrence at the reported precision and
    runs as plain codegen window expressions.

    Parity: weights are exact binary doubles (0.5^j), both engines fold
    the K+1 terms in the same literal order, one division, rounded to
    6.  Scale: one user_id shuffle; K lags ride a single sorted window
    pass — no recurrence, no iteration."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us.asc(), F.col("event_id").asc())
    return ev.withColumn(
        "ewma", ewma_bounded_col(F.col("value"), w, _EWMA_ALPHA, _EWMA_K)
    ).select("event_id", "user_id", "ts", "ewma")


def ewma_bounded_col(value, window_spec, alpha: float = _EWMA_ALPHA, k: int = _EWMA_K):
    """The bounded-K-lag EWMA as a single window Column (adjust=True
    normalization): weights (1−α)^j truncate at ``k`` lags, which is
    value-identical to the sequential recurrence at 6-digit precision
    when (1−α)^k is below the rounding digit.  Factored out so scale
    smokes and callers can apply it to any ordered window."""
    x0 = value.cast("double")
    num, den = None, None
    for j in range(k + 1):
        wj = F.lit((1 - alpha) ** j)
        xj = x0 if j == 0 else F.lag(x0, j).over(window_spec)
        term = F.coalesce(xj * wj, F.lit(0.0))
        dterm = F.when(xj.isNotNull(), wj).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = dterm if den is None else den + dterm
    return F.round(num / den, 6)


@register(
    "events_user_trend",
    oracle="""
    WITH b AS (
      SELECT user_id, epoch_us(ts) AS us, CAST(value AS DECIMAL(18,4)) AS y
      FROM events
    ),
    m AS (SELECT user_id, MIN(us) AS us0 FROM b GROUP BY user_id),
    c AS (SELECT b.user_id, b.us - m.us0 AS t, b.y
          FROM b JOIN m ON b.user_id = m.user_id),
    s AS (
      SELECT user_id,
             COUNT(*) AS n,
             CAST(SUM(t) AS DOUBLE) AS st,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(t AS DECIMAL(38,4)) * y) AS DOUBLE) AS sty,
             CAST(SUM(CAST(t AS DECIMAL(38,0)) * t) AS DOUBLE) AS stt
      FROM c GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           ROUND((n * sty - st * sy) / (n * stt - st * st) * 3600000000.0, 6)
             AS slope_per_hour
    FROM s
    WHERE n >= 2 AND n * stt - st * st > 0
    """,
)
def events_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend: the least-squares slope of value against
    event time (per hour) — the "is this user's metric drifting"
    feature every behavioral model wants, computed in closed form from
    five sums (no iteration, no model state).

    Parity: t is the exact integer µs offset from the user's first
    event (min-join, so both engines center identically); Σt, Σy, Σty,
    Σt² accumulate in DECIMAL (order-independent, no float
    accumulation), and only the FINAL slope expression runs in IEEE
    double with an identical operation tree on both engines, rounded to
    6.  Scale: two aggregations on the same user_id key (AQE reuses the
    exchange) plus a broadcastable per-user min frame — the data is
    never windowed or sorted."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    b = ev.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
        F.col("value").cast("decimal(18,4)").alias("y"),
    )
    m = b.groupBy("user_id").agg(F.min("us").alias("us0"))
    c = b.join(m, on="user_id").select(
        "user_id", (F.col("us") - F.col("us0")).alias("t"), "y"
    )
    s = c.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").cast("double").alias("st"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("t").cast("decimal(38,4)") * F.col("y")).cast("double").alias("sty"),
        F.sum(F.col("t").cast("decimal(38,0)") * F.col("t")).cast("double").alias("stt"),
    )
    n = F.col("n").cast("double")
    denom = n * F.col("stt") - F.col("st") * F.col("st")
    slope = (n * F.col("sty") - F.col("st") * F.col("sy")) / denom * 3600000000.0
    return (
        s.filter((F.col("n") >= 2) & (denom > 0))
        .select(
            "user_id",
            F.col("n").alias("n_events"),
            F.round(slope, 6).alias("slope_per_hour"),
        )
    )


# ---------------------------------------------------------------------------
# CUSUM change-point alarms — sequential mean-shift detection per user.
# ---------------------------------------------------------------------------


@register(
    "events_cusum_alarms",
    oracle="""
    WITH RECURSIVE
    st AS (SELECT CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE)
                    / COUNT(*) AS mean,
                  CAST(SUM(CAST(value * value AS DECIMAL(28,12))) AS DOUBLE)
                    / COUNT(*) AS m2
           FROM events),
    kh AS (SELECT ROUND(mean + 0.5 * sqrt(m2 - mean * mean), 6) AS k,
                  ROUND(4 * sqrt(m2 - mean * mean), 6) AS h
           FROM st),
    r AS (SELECT user_id, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events),
    p(user_id, event_id, rn, s) AS (
      SELECT r.user_id, r.event_id, r.rn,
             GREATEST(0.0, 0.0 + r.value - kh.k)
      FROM r CROSS JOIN kh WHERE r.rn = 1
      UNION ALL
      SELECT r.user_id, r.event_id, r.rn,
             GREATEST(0.0, p.s + r.value - kh.k)
      FROM p JOIN r ON r.user_id = p.user_id AND r.rn = p.rn + 1
      CROSS JOIN kh)
    SELECT p.user_id, p.event_id, ROUND(p.s, 6) AS cusum,
           p.s > kh.h AS alarm
    FROM p CROSS JOIN kh
    """,
)
def events_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided upper CUSUM per user (k = μ + σ/2 slack, h = 4σ
    decision interval from corpus moments): the sequential change-point
    test that flags a SUSTAINED mean shift in an entity's value stream
    — a drift no single point trips the z-score/MAD outlier rules on.

    Parity: moments ride the DECIMAL(28,12) power-sum ladder (the
    zscore convention), k/h round at 6, and the recurrence itself is
    plain IEEE double arithmetic evaluated in the exact order the
    oracle's recursive CTE replays — pandas float64 and DuckDB DOUBLE
    are the same machine ops, so values match bit-for-bit before the
    output round.  Scale: one stats agg broadcast back; the inherently
    sequential walk runs as one Arrow group per user, parallel across
    entities (the packer's argument).  See
    operators/sessions.py::cusum_alarms."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    dec = "decimal(28,12)"
    st = ev.agg(
        (
            F.sum(F.col("value").cast(dec)).cast("double")
            / F.count(F.lit(1))
        ).alias("mean"),
        (
            F.sum((F.col("value") * F.col("value")).cast(dec)).cast("double")
            / F.count(F.lit(1))
        ).alias("m2"),
    )
    std = F.sqrt(F.col("m2") - F.col("mean") * F.col("mean"))
    kh = st.select(
        F.round(F.col("mean") + F.lit(0.5) * std, 6).alias("_k"),
        F.round(F.lit(4) * std, 6).alias("_h"),
    )
    t = ev.crossJoin(F.broadcast(kh))
    out = ss.cusum_alarms(t)
    return out.select(
        "user_id",
        "event_id",
        F.round("cusum", 6).alias("cusum"),
        "alarm",
    )


# ---------------------------------------------------------------------------
# SCD2 validity intervals — change-stream compaction into state history.
# ---------------------------------------------------------------------------


@register(
    "events_scd2_intervals",
    oracle="""
    WITH r AS (
      SELECT user_id, event_id, ts, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS prev
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type, ts, event_id
      FROM r WHERE prev IS NULL OR event_type <> prev
    )
    SELECT user_id, event_type, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id
                          ORDER BY epoch_us(ts), event_id) AS valid_to,
           LEAD(ts) OVER (PARTITION BY user_id
                          ORDER BY epoch_us(ts), event_id) IS NULL AS is_current
    FROM runs
    """,
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from the event stream:
    per user, consecutive repeats of event_type collapse into one
    validity interval (valid_from, valid_to, is_current) — the
    warehouse compaction that answers "what was this entity's state at
    time t" and feeds the interval side of time joins.  Complements
    events_latest_per_user (current state only) with the full state
    HISTORY.

    Scale: one hash(user_id) exchange; the run-start lag, the
    interval-closing lead, and the filter between them are
    partition-local passes on that ordering — nothing else shuffles.
    Parity: boundaries compare exact (µs, event_id) totals; no floats.
    See operators/sessions.py::scd2_intervals."""
    ev = load_table(spark, sf_dir, "events")
    return ss.scd2_intervals(ev)


# ---------------------------------------------------------------------------
# First-touch attribution — conversions credited to the earliest touch
# inside a lookback window.
# ---------------------------------------------------------------------------

#: Attribution lookback, µs (24 h).
ATTRIBUTION_WINDOW_US = 86_400_000_000


@register(
    "events_first_touch_attribution",
    oracle=f"""
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
               FROM events),
    a AS (
      SELECT user_id, event_id, us, event_type,
             MIN(CASE WHEN event_type IN ('click', 'view')
                      THEN printf('%020d:%012d:%s', us, event_id, event_type)
                 END) OVER (PARTITION BY user_id ORDER BY us
                            RANGE BETWEEN {ATTRIBUTION_WINDOW_US} PRECEDING
                                      AND 1 PRECEDING) AS k
      FROM e
    )
    SELECT user_id, event_id AS purchase_event_id,
           CAST(string_split(k, ':')[2] AS BIGINT) AS touch_event_id,
           string_split(k, ':')[3] AS touch_type,
           us - CAST(string_split(k, ':')[1] AS BIGINT) AS lag_us
    FROM a
    WHERE event_type = 'purchase' AND k IS NOT NULL
    """,
)
def events_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each purchase is credited to the user's
    EARLIEST click/view in the preceding 24 h (strictly before the
    purchase instant) — the marketing-attribution join that naive
    formulations write as a per-user range self-join.

    Plan shape: ONE hash(user_id) exchange; the lookback is a
    RANGE-frame window over exact epoch-µs, and the "earliest touch"
    is a MIN over a zero-padded (µs, event_id, type) string key — a
    total lexicographic order both engines compare byte-identically,
    so ties at the same microsecond break on event_id.  No self-join,
    no row explosion; purchases without a touch in range drop out.

    Output: (user_id, purchase_event_id, touch_event_id, touch_type,
    lag_us — exact integer µs)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("us"),
        "event_type",
    )
    key = F.format_string("%020d:%012d:%s", F.col("us"), F.col("event_id"), F.col("event_type"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-ATTRIBUTION_WINDOW_US, -1)
    )
    touch = F.min(
        F.when(F.col("event_type").isin("click", "view"), key)
    ).over(w)
    a = ev.withColumn("k", touch).filter(
        (F.col("event_type") == "purchase") & F.col("k").isNotNull()
    )
    parts = F.split(F.col("k"), ":")
    return a.select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        parts.getItem(1).cast("long").alias("touch_event_id"),
        parts.getItem(2).alias("touch_type"),
        (F.col("us") - parts.getItem(0).cast("long")).alias("lag_us"),
    )


# ---------------------------------------------------------------------------
# Debounce — retry/chatter cleanup with last-SURVIVOR semantics.
# ---------------------------------------------------------------------------


@register(
    "events_debounce",
    oracle=f"""
    WITH RECURSIVE
    r AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY epoch_us(ts), event_id) AS rn
          FROM events),
    p(user_id, event_type, event_id, rn, kept, last_kept) AS (
      SELECT user_id, event_type, event_id, rn, TRUE, us
      FROM r WHERE rn = 1
      UNION ALL
      SELECT r.user_id, r.event_type, r.event_id, r.rn,
             r.us - p.last_kept >= {ss.DEBOUNCE_GAP_US},
             CASE WHEN r.us - p.last_kept >= {ss.DEBOUNCE_GAP_US}
                  THEN r.us ELSE p.last_kept END
      FROM p JOIN r ON r.user_id = p.user_id
                   AND r.event_type = p.event_type
                   AND r.rn = p.rn + 1)
    SELECT user_id, event_type, event_id, kept FROM p
    """,
)
def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debounce per (user, event type): an event is kept iff
    it is ≥30 min after the last KEPT event — retry/double-fire
    cleanup.  A lag filter cannot express this (the decision depends on
    the last survivor, not the previous event: three events 20 min
    apart keep the 1st and 3rd; lag-filtering drops both followers).

    Scale: inherently sequential per (user, type) — one Arrow group
    each, parallel across the 7.5k fixture groups (millions at corpus
    scale); state is one integer µs, and the walk is exact integer
    arithmetic, so the recursive-CTE oracle replays it bit-for-bit
    (the CUSUM discipline).  See
    operators/sessions.py::debounce_events."""
    ev = load_table(spark, sf_dir, "events")
    return ss.debounce_events(ev)


# ---------------------------------------------------------------------------
# CEP pattern match: A -> B within T with no C between.
# ---------------------------------------------------------------------------

#: click -> purchase lookback (1 h in exact integer microseconds).
PATTERN_WINDOW_US = 3_600_000_000


@register(
    "events_pattern_match",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             MAX(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
               OVER w AS last_click,
             MAX(CASE WHEN event_type = 'error' THEN epoch_us(ts) END)
               OVER w AS last_error
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id AS purchase_event_id,
           last_click AS trigger_us, us - last_click AS gap_us
    FROM o
    WHERE event_type = 'purchase'
      AND last_click IS NOT NULL
      AND us - last_click <= {PATTERN_WINDOW_US}
      AND (last_error IS NULL OR last_error < last_click)
    """,
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-pattern detection — ``click → purchase within 1 h
    with NO error between``: the negative-condition sequence rule
    (match_recognize territory) that funnels and first-touch
    attribution cannot express, and the naive formulation of which is a
    THREE-WAY range self-join.

    Here it is two conditional running-MAX columns over ONE user_id
    window (strictly-before ROWS frame on the (µs, event_id) total
    order): the most recent click and the most recent error; a purchase
    matches iff the click is within the lookback and the error — if
    any — precedes that click.  One exchange, zero joins, zero row
    explosion; every value is an exact integer µs, so the oracle is
    arithmetic-identical with nothing to round.

    Output: (user_id, purchase_event_id, trigger_us, gap_us)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us.asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = ev.select(
        "user_id",
        "event_id",
        "event_type",
        us.alias("us"),
        F.max(F.when(F.col("event_type") == "click", us)).over(w).alias(
            "last_click"
        ),
        F.max(F.when(F.col("event_type") == "error", us)).over(w).alias(
            "last_error"
        ),
    )
    return t.filter(
        (F.col("event_type") == "purchase")
        & F.col("last_click").isNotNull()
        & (F.col("us") - F.col("last_click") <= PATTERN_WINDOW_US)
        & (F.col("last_error").isNull() | (F.col("last_error") < F.col("last_click")))
    ).select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.col("last_click").alias("trigger_us"),
        (F.col("us") - F.col("last_click")).alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation.
# ---------------------------------------------------------------------------

#: Quintile probabilities for the three RFM scores.
_RFM_QS = (0.2, 0.4, 0.6, 0.8)
_RFM_QS_SQL = "[" + ", ".join(str(q) for q in _RFM_QS) + "]"


@register(
    "events_rfm_segments",
    oracle=f"""
    WITH p AS (
      SELECT user_id, epoch_us(ts) AS us, value
      FROM events WHERE event_type = 'purchase'
    ),
    anchor AS (SELECT MAX(epoch_us(ts)) AS a FROM events),
    u AS (
      SELECT user_id,
             (SELECT a FROM anchor) - MAX(us) AS r_us,
             COUNT(*) AS f,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS m
      FROM p GROUP BY user_id
    ),
    b AS (
      SELECT
        list_transform(quantile_cont(r_us, {_RFM_QS_SQL}), x -> ROUND(x, 4)) AS rb,
        list_transform(quantile_cont(f, {_RFM_QS_SQL}), x -> ROUND(x, 4)) AS fb,
        list_transform(quantile_cont(m, {_RFM_QS_SQL}), x -> ROUND(x, 4)) AS mb
      FROM u
    )
    SELECT user_id, r_us, f, m,
           CAST(6 - (1 + len(list_filter(b.rb, x -> r_us > x))) AS BIGINT)
             AS r_score,
           CAST(1 + len(list_filter(b.fb, x -> f > x)) AS BIGINT) AS f_score,
           CAST(1 + len(list_filter(b.mb, x -> m > x)) AS BIGINT) AS m_score,
           CAST((6 - (1 + len(list_filter(b.rb, x -> r_us > x)))) * 100
                + (1 + len(list_filter(b.fb, x -> f > x))) * 10
                + (1 + len(list_filter(b.mb, x -> m > x))) AS BIGINT) AS segment
    FROM u CROSS JOIN b
    """,
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency (µs since last purchase,
    against the corpus max-timestamp anchor), frequency (purchase
    count), monetary (DECIMAL-routed value sum) — each quintile-scored
    1–5 (recency inverted: most recent = 5) and composed into the
    classic 3-digit RFM segment.

    Parity: the agg_decile_binning discipline — exact interpolated
    quintile boundaries (percentile ≡ quantile_cont) rounded to 4 at
    the 4-value narrowest point, then pure comparison counting against
    the same doubles; recency/frequency are exact integers, monetary is
    the DECIMAL-rounded money convention.  Scale: one grouped aggregate
    to the per-user frame, ONE boundary aggregate broadcast back, and a
    zero-shuffle per-row score projection — the documented exact-
    percentile trade; the anchor is a one-row broadcast."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value"
    )
    us = F.unix_micros(F.col("ts"))
    anchor = ev.agg(F.max(us).alias("__a"))
    u = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(us).alias("__last"),
            F.count(F.lit(1)).alias("f"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("m"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            (F.col("__a") - F.col("__last")).alias("r_us"),
            "f",
            "m",
        )
    )
    qs = F.array(*[F.lit(q) for q in _RFM_QS])
    bounds = u.agg(
        F.transform(F.percentile("r_us", qs), lambda x: F.round(x, 4)).alias("rb"),
        F.transform(F.percentile("f", qs), lambda x: F.round(x, 4)).alias("fb"),
        F.transform(F.percentile("m", qs), lambda x: F.round(x, 4)).alias("mb"),
    )

    def nbin(col, bcol):
        return (
            F.lit(1) + F.size(F.filter(bcol, lambda x: col > x))
        ).cast("long")

    t = u.join(F.broadcast(bounds))
    r_score = (F.lit(6) - nbin(F.col("r_us"), F.col("rb"))).cast("long")
    f_score = nbin(F.col("f"), F.col("fb"))
    m_score = nbin(F.col("m"), F.col("mb"))
    return t.select(
        "user_id",
        "r_us",
        "f",
        "m",
        r_score.alias("r_score"),
        f_score.alias("f_score"),
        m_score.alias("m_score"),
        (r_score * 100 + f_score * 10 + m_score).cast("long").alias("segment"),
    )


@register(
    "events_top_paths",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type AS e1,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e2,
             LEAD(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e3
      FROM events),
    p AS (SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS c
          FROM s WHERE e1 IS NOT NULL AND e2 IS NOT NULL
                   AND e3 IS NOT NULL GROUP BY 1),
    r AS (SELECT path, c,
                 ROW_NUMBER() OVER (ORDER BY c DESC, path) AS rk
          FROM p)
    SELECT path, CAST(c AS BIGINT) AS n_occurrences,
           CAST(rk AS BIGINT) AS rank
    FROM r WHERE rk <= 10
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the 10 most common 3-event sequences across all
    user timelines (consecutive by exact (µs, event_id) order) — the
    "what do users actually do" view funnels presuppose: funnels test a
    HYPOTHESIZED sequence, this surfaces the dominant ones to
    hypothesize about.

    Scale: one user_id window (the sessionization exchange) builds the
    sliding trigrams; the path groupBy is event-type-trigram-keyed
    (vocabulary-bounded, map-side combinable); the top-10 window runs
    over the path-vocabulary aggregate, never the data."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(us.asc(), F.col("event_id").asc())
    s = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(
        # ADVICE r14: require ALL THREE legs non-null, not just e3 —
        # concat_ws SKIPS nulls while the oracle's || propagates them, so
        # a NULL event_type (none in the current fixture, but nothing
        # forbids one) would silently diverge the engines.  With the full
        # filter both engines agree regardless of fixture content.
        F.col("e1").isNotNull() & F.col("e2").isNotNull() & F.col("e3").isNotNull()
    )
    p = s.groupBy(
        F.concat_ws(">", "e1", "e2", "e3").alias("path")
    ).agg(F.count(F.lit(1)).alias("c"))
    wr = Window.orderBy(F.desc("c"), F.asc("path"))
    return (
        p.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 10)
        .select(
            "path",
            F.col("c").cast("long").alias("n_occurrences"),
            F.col("rk").cast("long").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Out-of-order / late-data audit for the stateful streaming twins
# (VERDICT r14 "What's missing #2").  The streaming CEP/CUSUM operators are
# bitwise-checked against their batch twins under IN-ORDER delivery; this
# entry measures what DISORDER does to them.  The disordered processing
# order is fully deterministic — micro-batch assignment event_id % NB,
# batches consumed in index order, rows folded (ts, event_id) within each
# batch — which is exactly the order a FileStreamSource run over NB
# round-robin part-files replays (tests/test_streaming.py pins that the
# real stream equals this model).  Determinism makes the whole divergence
# report SQL-expressible, so even this audit is value-hash oracle-checked.
# ---------------------------------------------------------------------------

#: Micro-batch count for the deterministic disorder model.  event_id % 8
#: round-robins the timeline across batches, so almost every row of batch
#: b>0 arrives "late" relative to the watermark high-water-mark batch b-1
#: left behind — the worst-case shuffle a production stream can see.
DISORDER_NB = 8


def cep_matches_over_order(base: DataFrame, order_cols) -> DataFrame:
    """CEP click→purchase matches when the state walk folds rows in
    ``order_cols`` order — LAST-processed click/error semantics (what a
    stateful stream's assignment does; equal to the in-order batch
    entry's running MAX only when the order is event-time).  ``base``
    needs (user_id, event_id, event_type, us).  Module-level so
    tests/test_streaming.py can pin a REAL shuffled-file stream run to
    this model row-for-row."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = base.select(
        "user_id",
        "event_id",
        "event_type",
        "us",
        F.last(
            F.when(F.col("event_type") == "click", F.col("us")),
            ignorenulls=True,
        ).over(w).alias("lc"),
        F.last(
            F.when(F.col("event_type") == "error", F.col("us")),
            ignorenulls=True,
        ).over(w).alias("le"),
    )
    return t.filter(
        (F.col("event_type") == "purchase")
        & F.col("lc").isNotNull()
        & (F.col("us") - F.col("lc") <= PATTERN_WINDOW_US)
        & (F.col("le").isNull() | (F.col("le") < F.col("lc")))
    ).select("user_id", "event_id", "lc")


def _dual_cusum_walk(pdf):
    """Per-user dual CUSUM fold for validate_stream_disorder: the
    in-order ((us, event_id)) and disordered ((__b, us, event_id)) walks
    over ONE Arrow group, returning (user_id, event_id, alarm_t,
    alarm_d) in disordered order.  Module-level so tests can exercise it
    directly (the duplicate-event_id guard below).

    The two sequential CUSUM folds are inherently per-row Python (the
    recurrence's IEEE rounding order IS the contract — a prefix-sum
    closed form rounds differently and breaks oracle parity), but
    everything AROUND them is vectorized (opt r17, guide §4.2): loop
    over raw numpy doubles, preallocate the alarm arrays, remap the
    in-order alarms onto the permuted order positionally, and assemble
    the output from columns, not a list of row tuples.  float(v) on a
    numpy float64 is the identical double, and the fold ops run in the
    identical order, so alarms are unchanged (oracle-checked)."""
    import numpy as np
    import pandas as pd

    k = float(pdf["_k"].iloc[0])
    h = float(pdf["_h"].iloc[0])
    uid = int(pdf["user_id"].iloc[0])
    pdf = pdf.reset_index(drop=True)  # positions 0..n-1 for the remap below
    t = pdf.sort_values(["us", "event_id"])
    vals_t = t["value"].to_numpy(dtype="float64")
    alarm_t = np.empty(len(vals_t), dtype=bool)
    sacc = 0.0
    for i in range(len(vals_t)):
        sacc = max(0.0, sacc + float(vals_t[i]) - k)
        alarm_t[i] = sacc > h
    d = pdf.sort_values(["__b", "us", "event_id"])
    vals_d = d["value"].to_numpy(dtype="float64")
    alarm_d = np.empty(len(vals_d), dtype=bool)
    sacc = 0.0
    for i in range(len(vals_d)):
        sacc = max(0.0, sacc + float(vals_d[i]) - k)
        alarm_d[i] = sacc > h
    eid_d = d["event_id"].to_numpy()
    # POSITIONAL remap of the in-order alarms onto the permuted order
    # (ADVICE r17): both sorts keep pdf's RangeIndex, so pdf position p's
    # in-order alarm sits where t.index == p — a label-based reindex on
    # event_id would raise on a duplicated id at scale, and each row
    # owning ITS OWN walk value is the correct semantics regardless of
    # id collisions.
    alarm_t_at_pos = np.empty(len(alarm_t), dtype=bool)
    alarm_t_at_pos[t.index.to_numpy()] = alarm_t
    alarm_t_for_d = alarm_t_at_pos[d.index.to_numpy()]
    return pd.DataFrame(
        {
            "user_id": np.full(len(eid_d), uid, dtype="int64"),
            "event_id": eid_d,
            "alarm_t": alarm_t_for_d,
            "alarm_d": alarm_d,
        }
    )


@register(
    "validate_stream_disorder",
    oracle=f"""
    WITH RECURSIVE
    ev AS (SELECT user_id, event_id, event_type, value,
                  epoch_us(ts) AS us, event_id % {DISORDER_NB} AS b
           FROM events),
    -- CEP click->purchase (no error between), true event-time order
    cepw_t AS (
      SELECT user_id, event_id, event_type, us,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lc,
             LAST_VALUE(CASE WHEN event_type = 'error' THEN us END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS le
      FROM ev),
    cep_t AS (SELECT user_id, event_id, lc FROM cepw_t
              WHERE event_type = 'purchase' AND lc IS NOT NULL
                AND us - lc <= {PATTERN_WINDOW_US}
                AND (le IS NULL OR le < lc)),
    -- CEP, disordered processing order (batch, us, event_id)
    cepw_d AS (
      SELECT user_id, event_id, event_type, us,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY b, us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lc,
             LAST_VALUE(CASE WHEN event_type = 'error' THEN us END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY b, us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS le
      FROM ev),
    cep_d AS (SELECT user_id, event_id, lc FROM cepw_d
              WHERE event_type = 'purchase' AND lc IS NOT NULL
                AND us - lc <= {PATTERN_WINDOW_US}
                AND (le IS NULL OR le < lc)),
    cep_common AS (SELECT COUNT(*) AS n FROM cep_t t
                   JOIN cep_d d ON t.user_id = d.user_id
                    AND t.event_id = d.event_id AND t.lc = d.lc),
    -- CUSUM k/h from corpus moments (the events_cusum_alarms ladder)
    st AS (SELECT CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE)
                    / COUNT(*) AS mean,
                  CAST(SUM(CAST(value * value AS DECIMAL(28,12))) AS DOUBLE)
                    / COUNT(*) AS m2
           FROM events),
    kh AS (SELECT ROUND(mean + 0.5 * sqrt(m2 - mean * mean), 6) AS k,
                  ROUND(4 * sqrt(m2 - mean * mean), 6) AS h
           FROM st),
    r_t AS (SELECT user_id, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY us, event_id) AS rn
            FROM ev),
    p_t(user_id, event_id, rn, s) AS (
      SELECT r_t.user_id, r_t.event_id, r_t.rn,
             GREATEST(0.0, 0.0 + r_t.value - kh.k)
      FROM r_t CROSS JOIN kh WHERE r_t.rn = 1
      UNION ALL
      SELECT r_t.user_id, r_t.event_id, r_t.rn,
             GREATEST(0.0, p_t.s + r_t.value - kh.k)
      FROM p_t JOIN r_t ON r_t.user_id = p_t.user_id AND r_t.rn = p_t.rn + 1
      CROSS JOIN kh),
    al_t AS (SELECT p_t.user_id, p_t.event_id FROM p_t CROSS JOIN kh
             WHERE p_t.s > kh.h),
    r_d AS (SELECT user_id, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY b, us, event_id) AS rn
            FROM ev),
    p_d(user_id, event_id, rn, s) AS (
      SELECT r_d.user_id, r_d.event_id, r_d.rn,
             GREATEST(0.0, 0.0 + r_d.value - kh.k)
      FROM r_d CROSS JOIN kh WHERE r_d.rn = 1
      UNION ALL
      SELECT r_d.user_id, r_d.event_id, r_d.rn,
             GREATEST(0.0, p_d.s + r_d.value - kh.k)
      FROM p_d JOIN r_d ON r_d.user_id = p_d.user_id AND r_d.rn = p_d.rn + 1
      CROSS JOIN kh),
    al_d AS (SELECT p_d.user_id, p_d.event_id FROM p_d CROSS JOIN kh
             WHERE p_d.s > kh.h),
    al_common AS (SELECT COUNT(*) AS n FROM al_t t
                  JOIN al_d d ON t.user_id = d.user_id
                   AND t.event_id = d.event_id),
    -- late arrivals vs a zero-delay watermark (per-batch running max)
    bmax AS (SELECT b, MAX(us) AS mx FROM ev GROUP BY b),
    bprev AS (SELECT b, MAX(mx) OVER (ORDER BY b
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmx
              FROM bmax),
    late AS (SELECT COUNT(*) AS n FROM ev JOIN bprev USING (b)
             WHERE bprev.pmx IS NOT NULL AND ev.us < bprev.pmx)
    SELECT * FROM (
      SELECT 'cep_pattern' AS check_name,
             (SELECT COUNT(*) FROM cep_t) AS n_reference,
             (SELECT COUNT(*) FROM cep_d) AS n_observed,
             (SELECT n FROM cep_common) AS n_common,
             (SELECT COUNT(*) FROM cep_t) - (SELECT n FROM cep_common) AS n_lost,
             (SELECT COUNT(*) FROM cep_d) - (SELECT n FROM cep_common) AS n_phantom
      UNION ALL
      SELECT 'cusum_alarms',
             (SELECT COUNT(*) FROM al_t),
             (SELECT COUNT(*) FROM al_d),
             (SELECT n FROM al_common),
             (SELECT COUNT(*) FROM al_t) - (SELECT n FROM al_common),
             (SELECT COUNT(*) FROM al_d) - (SELECT n FROM al_common)
      UNION ALL
      SELECT 'late_arrivals',
             (SELECT COUNT(*) FROM ev),
             (SELECT COUNT(*) FROM ev) - (SELECT n FROM late),
             (SELECT COUNT(*) FROM ev) - (SELECT n FROM late),
             (SELECT n FROM late),
             0
    )
    """,
)
def validate_stream_disorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order delivery audit for the stateful streaming twins: how
    far do CEP pattern matches and CUSUM alarms drift when micro-batches
    arrive SHUFFLED (event_id % 8 round-robin — each batch spans the
    whole timeline, so batch b>0 is almost entirely "late" behind the
    watermark batch b−1 advanced)?  Reports, per check, the in-order
    reference count, the disordered count, and the common/lost/phantom
    split; late_arrivals counts the rows a zero-delay watermark would
    drop outright.

    The disordered run is the DETERMINISTIC model of a real replay —
    batches in index order, (ts, event_id) fold within each batch (what
    applyInPandasWithState does per micro-batch) — so the report is
    exact and oracle-checked, not a flaky observation.  The CEP
    disorder walk uses LAST-processed click/error (assignment
    semantics, which under permutation is NOT the running MAX the
    in-order batch form can use); the CUSUM walk refolds the identical
    recurrence in the permuted order.  tests/test_streaming.py pins
    that a REAL FileStreamSource run over round-robin part-files emits
    exactly this model's matches.

    Scale: both CEP variants ride the one user_id exchange (two window
    passes); both CUSUM folds are one Arrow group per user; the
    watermark audit is a |batches|-row broadcast — nothing quadratic,
    no collect."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts", "value"
    )
    us = F.unix_micros(F.col("ts"))
    b = (F.col("event_id") % DISORDER_NB).alias("__b")
    base = ev.select("user_id", "event_id", "event_type", "value", us.alias("us"), b)

    cep_t = cep_matches_over_order(
        base, [F.col("us").asc(), F.col("event_id").asc()]
    )
    cep_d = cep_matches_over_order(
        base, [F.col("__b").asc(), F.col("us").asc(), F.col("event_id").asc()]
    )

    # CUSUM k/h from the corpus moments (events_cusum_alarms ladder)
    dec = "decimal(28,12)"
    st = ev.agg(
        (F.sum(F.col("value").cast(dec)).cast("double") / F.count(F.lit(1))).alias(
            "mean"
        ),
        (
            F.sum((F.col("value") * F.col("value")).cast(dec)).cast("double")
            / F.count(F.lit(1))
        ).alias("m2"),
    )
    std = F.sqrt(F.col("m2") - F.col("mean") * F.col("mean"))
    kh = st.select(
        F.round(F.col("mean") + F.lit(0.5) * std, 6).alias("_k"),
        F.round(F.lit(4) * std, 6).alias("_h"),
    )
    khb = F.broadcast(kh)

    # BOTH folds in ONE Arrow group pass (the recurrence is the cost —
    # operators/sessions.py::cusum_alarms docstring — so running the
    # in-order and permuted walks over the same grouped batch halves
    # the entry instead of paying two exchanges + two group passes).
    # Same sequential IEEE ops as cusum_alarms, so values match the
    # oracle's recursive CTEs bit-for-bit; alarms decided on raw s.
    from pyspark.sql import types as T

    dual_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("alarm_t", T.BooleanType()),
            T.StructField("alarm_d", T.BooleanType()),
        ]
    )

    from spanner_jdbc_converter_spark.operators.dedup import _stage_checkpoint

    from spanner_jdbc_converter_spark.session import session_shuffle_width

    dual = _stage_checkpoint(
        # project to the walk's columns BEFORE the exchange (guide
        # §2.3/§4.1): the opaque applyInPandas defeats column pruning,
        # so without the explicit select the unused event_type strings
        # — the widest column — would ride the shuffle AND the Arrow
        # boundary
        base.select("user_id", "event_id", "value", "us", "__b")
        .crossJoin(khb)
        # explicit-width spread before the CPU-bound dual walk: the
        # groupBy reuses the pinned partitioning (one exchange), and
        # AQE can no longer coalesce the walk near-serial (opt r17 —
        # the sessions.py::cusum_alarms measurement)
        .repartition(session_shuffle_width(spark), "user_id")
        .groupBy("user_id")
        .applyInPandas(_dual_cusum_walk, dual_schema)
        .filter(F.col("alarm_t") | F.col("alarm_d"))
    )
    al_t = dual.filter(F.col("alarm_t")).select("user_id", "event_id")
    al_d = dual.filter(F.col("alarm_d")).select("user_id", "event_id")

    # late rows vs a zero-delay watermark: per-batch running max of us
    bmax = base.groupBy("__b").agg(F.max("us").alias("mx"))
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    bprev = bmax.select("__b", F.max("mx").over(wb).alias("pmx"))
    n_late_df = (
        base.join(F.broadcast(bprev), on="__b")
        .filter(F.col("pmx").isNotNull() & (F.col("us") < F.col("pmx")))
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def counts(name: str, ref: DataFrame, obs: DataFrame, keys: list) -> DataFrame:
        common = ref.join(obs, on=keys, how="inner").agg(
            F.count(F.lit(1)).alias("n_common")
        )
        return (
            ref.agg(F.count(F.lit(1)).alias("n_reference"))
            .crossJoin(obs.agg(F.count(F.lit(1)).alias("n_observed")))
            .crossJoin(common)
            .select(
                F.lit(name).alias("check_name"),
                F.col("n_reference").cast("long"),
                F.col("n_observed").cast("long"),
                F.col("n_common").cast("long"),
                (F.col("n_reference") - F.col("n_common")).cast("long").alias("n_lost"),
                (F.col("n_observed") - F.col("n_common"))
                .cast("long")
                .alias("n_phantom"),
            )
        )

    cep_row = counts("cep_pattern", cep_t, cep_d, ["user_id", "event_id", "lc"])
    al_row = counts("cusum_alarms", al_t, al_d, ["user_id", "event_id"])
    total = base.agg(F.count(F.lit(1)).alias("n_total"))
    late_row = total.crossJoin(n_late_df).select(
        F.lit("late_arrivals").alias("check_name"),
        F.col("n_total").cast("long").alias("n_reference"),
        (F.col("n_total") - F.col("n")).cast("long").alias("n_observed"),
        (F.col("n_total") - F.col("n")).cast("long").alias("n_common"),
        F.col("n").cast("long").alias("n_lost"),
        F.lit(0).cast("long").alias("n_phantom"),
    )
    return cep_row.unionByName(al_row).unionByName(late_row)
