"""Mergeable cardinality sketches — a portable, oracle-exact HyperLogLog.

The reference's only cardinality tool is an exact ``SELECT COUNT(*)``
probe (REF/util/ConverterUtils.java:193-216); at 100 TB, COUNT(DISTINCT)
is a full shuffle of every distinct key.  A HyperLogLog sketch reduces
that to a fixed 64-row state that merges map-side — the canonical
mergeable-aggregate shape (partial per partition, one tiny combine).

Spark ships ``approx_count_distinct`` (HLL++), but its hash and bias
tables are engine-private — DuckDB cannot reproduce the estimate, so it
can only get a rows-only check.  This implementation instead derives
every step from the corpus's portable md5 hash (functions/hashing.py),
making the WHOLE sketch — bucket assignment, rank, bias correction —
bit-reproducible in DuckDB SQL:

* ``h``      : 60-bit md5 of the value (md5_long);
* bucket     : low ``B`` bits (``h % m``);
* ``w``      : remaining ``60 - B`` bits (``h // m``);
* rank ρ     : leading zeros of ``w`` in that width + 1, via an exact
  integer-threshold CASE ladder (no float log — ``floor(ln(w)/ln 2)``
  is wrong exactly at powers of two);
* register   : ``max(ρ)`` per bucket — the mergeable state;
* estimate   : ``α·m²/Σ 2^{-ρ_j}`` with the Σ computed as an INTEGER
  (``Σ 2^{W+1-ρ_j}`` ≤ 64·2^54 fits a BIGINT exactly), so the only
  float step is one final division — no summation-order drift;
* small-range correction: linear counting ``m·ln(m/V)`` when the
  raw estimate ≤ 2.5·m and empty buckets exist (standard HLL).

Citations: Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm" (AofA 2007) — α constant §4, linear
counting switch §4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spanner_jdbc_converter_spark.functions.hashing import (
    HASH_BITS,
    md5_long,
    md5_long_sql,
)

#: Bucket-index bits and bucket count (m = 2^B).
HLL_B = 6
HLL_M = 1 << HLL_B

#: Width of the rank field w = h >> B.
_W_BITS = HASH_BITS - HLL_B  # 54

#: α_m = 0.7213 / (1 + 1.079/m) — Flajolet et al. §4, m ≥ 64.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _rank_ladder_spark(w: Column) -> Column:
    """ρ(w): leading zeros of w in a ``_W_BITS``-wide field, plus one.

    Exact integer thresholds: w ≥ 2^(_W_BITS-1) → 1, …, w = 0 → _W_BITS+1.
    """
    expr = F.lit(_W_BITS + 1)
    for rho in range(_W_BITS, 0, -1):
        expr = F.when(w >= (1 << (_W_BITS - rho)), F.lit(rho)).otherwise(expr)
    return expr


def _rank_ladder_sql(w_expr: str) -> str:
    whens = " ".join(
        f"WHEN {w_expr} >= {1 << (_W_BITS - rho)} THEN {rho}"
        for rho in range(1, _W_BITS + 1)
    )
    return f"CASE {whens} ELSE {_W_BITS + 1} END"


def hll_estimate(df: DataFrame, group_cols: list[str], value: Column) -> DataFrame:
    """Per-group HyperLogLog distinct estimate of ``value``.

    Output: group columns + ``approx_distinct`` (double, rounded to 4).
    Two tiny aggregates: (group, bucket) → max ρ  — combines map-side to
    ≤ m rows per group — then group → estimate.  The Σ2^{-ρ} runs in
    integer arithmetic (see module docstring) so the estimate is
    bit-identical on any engine and any partitioning."""
    h = md5_long(value.cast("string"))
    # h DIV m, NOT floor(h/m): 60-bit values exceed double's 53-bit
    # mantissa, so a float path would corrupt the rank field.
    buckets = (
        df.select(*group_cols, h.alias("__h"))
        .select(
            *group_cols,
            (F.col("__h") % HLL_M).alias("__bucket"),
            _rank_ladder_spark(F.expr(f"__h DIV {HLL_M}")).alias("__rho"),
        )
        .groupBy(*group_cols, "__bucket")
        .agg(F.max("__rho").alias("__rho_max"))
    )
    # Σ 2^{_W_BITS+1-ρ} over occupied buckets, plus 2^{_W_BITS+1} per
    # EMPTY bucket (ρ=0 ⇒ 2^{-0}=1): both exact BIGINTs.
    unit = F.lit(1 << (_W_BITS + 1)).cast("long")
    per_group = buckets.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_W_BITS + 1} - __rho_max)"))
        .alias("__z_occ"),
        F.count(F.lit(1)).alias("__n_occ"),
    )
    z_int = F.col("__z_occ") + (F.lit(HLL_M) - F.col("__n_occ")) * unit
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M * float(1 << (_W_BITS + 1))) / z_int
    v_empty = F.lit(HLL_M) - F.col("__n_occ")
    linear = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_empty)
    est = F.when((raw <= 2.5 * HLL_M) & (v_empty > 0), linear).otherwise(raw)
    return per_group.select(*group_cols, F.round(est, 4).alias("approx_distinct"))


def hll_estimate_sql(table_sql: str, group_cols: list[str], value_expr: str) -> str:
    """DuckDB rendering of :func:`hll_estimate` (same constants)."""
    g = ", ".join(group_cols)
    h = md5_long_sql(f"CAST({value_expr} AS VARCHAR)")
    unit = 1 << (_W_BITS + 1)
    alpha_num = HLL_ALPHA * HLL_M * HLL_M * float(unit)
    return f"""
    WITH hb AS (
      SELECT {g}, ({h}) % {HLL_M} AS bucket,
             {_rank_ladder_sql(f"(({h}) // {HLL_M})")} AS rho
      FROM {table_sql}
    ),
    reg AS (
      SELECT {g}, bucket, MAX(rho) AS rho_max FROM hb GROUP BY {g}, bucket
    ),
    agg AS (
      SELECT {g},
             SUM((CAST(1 AS BIGINT) << ({_W_BITS + 1} - rho_max))) AS z_occ,
             COUNT(*) AS n_occ
      FROM reg GROUP BY {g}
    )
    SELECT {g},
           ROUND(CASE WHEN ({alpha_num!r} / (z_occ + ({HLL_M} - n_occ) * {unit}))
                           <= {2.5 * HLL_M}
                       AND ({HLL_M} - n_occ) > 0
                      THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / ({HLL_M} - n_occ))
                      ELSE {alpha_num!r} / (z_occ + ({HLL_M} - n_occ) * {unit})
                 END, 4) AS approx_distinct
    FROM agg
    """


# ---------------------------------------------------------------------------
# Count-min sketch — portable, oracle-exact frequency estimation.
#
# The frequency-estimation twin of the HLL above: a DEPTH × WIDTH grid
# of exact integer counters.  Every counter cell is a plain SUM, so the
# sketch is mergeable map-side and — unlike space-saving/Misra-Gries,
# whose state depends on arrival order — fully deterministic under any
# partitioning: estimate(k) = min over DEPTH cells ≥ true count, with
# the standard (ε = e/WIDTH, δ = e^-DEPTH) overestimate guarantee.
# Cell indexes come from the portable seeded rehash family
# (functions/hashing.py), so DuckDB reproduces the whole grid exactly.
#
# Citation: Cormode & Muthukrishnan, "An improved data stream summary:
# the count-min sketch and its applications" (J. Algorithms 2005), §3.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_cells(df: DataFrame, key: Column) -> DataFrame:
    """The populated sketch grid: (seed, cell, n) — at most
    DEPTH × WIDTH rows after the map-side-combined groupBy, regardless
    of input size."""
    from spanner_jdbc_converter_spark.functions.hashing import seeded_rehash

    h = md5_long(key.cast("string"))
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        (seeded_rehash(h, s) % CMS_WIDTH).alias("cell"),
                    )
                    for s in range(CMS_DEPTH)
                ]
            )
        ).alias("sc")
    )
    return rows.groupBy("sc.seed", "sc.cell").agg(F.count(F.lit(1)).alias("n"))


def cms_estimates(df: DataFrame, key_col: str) -> DataFrame:
    """Per-distinct-key count-min estimate: min over the key's DEPTH
    cells.  The grid (≤ DEPTH × WIDTH rows) is broadcast; the per-key
    side is one DISTINCT on the key.  Output: (key_col, cms_n)."""
    from spanner_jdbc_converter_spark.functions.hashing import seeded_rehash

    cells = cms_cells(df, F.col(key_col))
    h = md5_long(F.col(key_col).cast("string"))
    keys = (
        df.select(key_col)
        .distinct()
        .select(
            key_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("seed"),
                            (seeded_rehash(h, s) % CMS_WIDTH).alias("cell"),
                        )
                        for s in range(CMS_DEPTH)
                    ]
                )
            ).alias("sc"),
        )
        .select(key_col, "sc.seed", "sc.cell")
    )
    return (
        keys.join(F.broadcast(cells), ["seed", "cell"])
        .groupBy(key_col)
        .agg(F.min("n").alias("cms_n"))
    )


def cms_estimates_sql(table_sql: str, key_expr: str) -> str:
    """DuckDB rendering of :func:`cms_estimates` (same hash family,
    same grid)."""
    from spanner_jdbc_converter_spark.functions.hashing import seeded_rehash_sql

    hx = md5_long_sql(f"CAST({key_expr} AS VARCHAR)")
    cell_rows = " UNION ALL ".join(
        f"SELECT {key_expr} AS k, {s} AS seed, "
        f"({seeded_rehash_sql('h', s)}) % {CMS_WIDTH} AS cell "
        f"FROM (SELECT {key_expr}, {hx} AS h FROM {table_sql})"
        for s in range(CMS_DEPTH)
    )
    return f"""
    WITH cr AS ({cell_rows}),
    cells AS (SELECT seed, cell, COUNT(*) AS n FROM cr GROUP BY seed, cell),
    kc AS (SELECT DISTINCT k, seed, cell FROM cr)
    SELECT k, MIN(n) AS cms_n
    FROM kc JOIN cells USING (seed, cell)
    GROUP BY k
    """


# ---------------------------------------------------------------------------
# Log-bucket quantile sketch — HDR-histogram-style, integer-exact.
# ---------------------------------------------------------------------------

#: Sub-bucket bits per octave: 2^QSK_SUBBITS log-linear cells between
#: consecutive powers of two, so the bucket lower bound underestimates
#: the true value by a relative error < 2^-QSK_SUBBITS (6.25%).
QSK_SUBBITS = 4

#: Default report quantiles.
QSK_PROBS = (0.25, 0.5, 0.75, 0.9, 0.99)


#: (exp, sub) of a positive BIGINT column named __u: exp = bit length
#: (exact via the binary-string rendering — no libm log anywhere), sub =
#: the QSK_SUBBITS bits after the leading bit (the value itself when it
#: has fewer bits).  SQL-expression form: the shift amount is itself a
#: column, which the F.shiftright/F.shiftleft python wrappers reject.
_QSK_EXP = "length(bin(__u))"
_QSK_SUB = (
    f"shiftright(__u, greatest({_QSK_EXP} - 1 - {QSK_SUBBITS}, 0))"
)
#: Bucket lower bound from (exp, sub) columns — exact integers.
_QSK_LB = (
    f"shiftleft(cast(sub AS bigint), greatest(exp - 1 - {QSK_SUBBITS}, 0))"
)


def logbucket_cells(df: DataFrame, units: Column) -> DataFrame:
    """The sketch state alone: (exp, sub, cnt) over positive BIGINT
    ``units`` — ONE map-side-combinable groupBy onto ≤ 64·2^QSK_SUBBITS
    cells, mergeable by adding counts, and exactly the aggregation a
    STREAMING twin maintains statefully (streaming/ops.py::
    running_quantile_cells — state bounded by the grid, like the CMS
    twin)."""
    u = units.cast("long").alias("__u")
    return (
        df.select(u)
        .filter(F.col("__u") > 0)
        .select(F.expr(_QSK_EXP).alias("exp"), F.expr(_QSK_SUB).alias("sub"))
        .groupBy("exp", "sub")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def logbucket_quantiles(
    df: DataFrame,
    units: Column,
    probs: tuple = QSK_PROBS,
) -> DataFrame:
    """Quantiles from a fixed-size LOG-BUCKET histogram sketch, graded
    beside the exact quantile in one report row per probability — the
    sketch-beside-exact discipline (HLL distincts, CMS frequencies,
    DOULION triangles) applied to rank statistics, the HdrHistogram /
    DDSketch idea with integer-exact bucketing both engines replay:
    ``units`` must be a positive BIGINT (pre-scaled money/latency);
    bucket = (bit length, next QSK_SUBBITS bits), i.e. log-linear cells
    with relative width 2^-QSK_SUBBITS, and the estimate is the lower
    bound of the first bucket whose cumulative count reaches the target
    rank floor(q·(n−1)) + 1.

    Scale: the sketch is ONE map-side-combinable groupBy onto ≤
    64·2^QSK_SUBBITS cells — mergeable across partitions, days, and
    tables by adding counts; the cumulative walk and rank probe happen
    on the cell frame (driver-scale).  The EXACT side is the audit: a
    full sort via one ROW_NUMBER window — the cost a production
    pipeline pays only when grading the sketch, exactly like the
    triangle estimate's exact twin.

    Output: (q, n, est_units, exact_units, rel_error) — rel_error =
    round((exact − est) / exact, 6), guaranteed ∈ [0, 2^-QSK_SUBBITS).
    """
    from pyspark.sql import Window

    u = units.cast("long").alias("__u")
    vals = df.select(u).filter(F.col("__u") > 0)
    cells = logbucket_cells(df, units)
    w = Window.orderBy("exp", "sub").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "exp",
        "sub",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    spark = df.sparkSession
    qf = spark.createDataFrame([(float(q),) for q in probs], "q double")
    rank = (F.floor(F.col("q") * (F.col("n") - 1)) + 1).alias("rank")
    est = (
        cum.crossJoin(F.broadcast(qf))
        .select("q", "n", F.expr(_QSK_LB).alias("lb"), F.col("cum"), rank)
        .filter(F.col("cum") >= F.col("rank"))
        .groupBy("q", "n")
        .agg(F.min("lb").alias("est_units"))
    )
    wr = Window.orderBy("__u")
    ranked = vals.select("__u", F.row_number().over(wr).alias("__r"))
    exact = (
        ranked.crossJoin(F.broadcast(qf.join(est.select("q", "n"), "q")))
        .filter(F.col("__r") == F.floor(F.col("q") * (F.col("n") - 1)) + 1)
        .select("q", F.col("__u").alias("exact_units"))
    )
    return (
        est.join(exact, "q")
        .select(
            "q",
            "n",
            "est_units",
            "exact_units",
            F.round(
                (F.col("exact_units") - F.col("est_units"))
                / F.col("exact_units").cast("double"),
                6,
            ).alias("rel_error"),
        )
        .orderBy("q")
    )


def logbucket_quantiles_sql(
    table_sql: str, units_expr: str, probs: tuple = QSK_PROBS
) -> str:
    """DuckDB rendering of :func:`logbucket_quantiles` — identical
    bit-length bucketing (length(bin(u))), cumulative walk, rank
    convention, and rounding."""
    probs_rows = ", ".join(f"({float(q)!r})" for q in probs)
    return f"""
    WITH vals AS (
      SELECT CAST({units_expr} AS BIGINT) AS u FROM {table_sql}
      WHERE CAST({units_expr} AS BIGINT) > 0
    ),
    parts AS (
      SELECT u, LENGTH(BIN(u)) AS exp,
             u >> GREATEST(LENGTH(BIN(u)) - 1 - {QSK_SUBBITS}, 0) AS sub
      FROM vals
    ),
    cells AS (SELECT exp, sub, COUNT(*) AS cnt FROM parts GROUP BY exp, sub),
    cum AS (
      SELECT exp, sub,
             CAST(SUM(cnt) OVER (ORDER BY exp, sub
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n
      FROM cells
    ),
    qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES {probs_rows}) AS t(q)),
    est AS (
      SELECT q, n, MIN(CAST(sub AS BIGINT)
                       << GREATEST(exp - 1 - {QSK_SUBBITS}, 0)) AS est_units
      FROM cum CROSS JOIN qs
      WHERE cum >= FLOOR(q * (n - 1)) + 1
      GROUP BY q, n
    ),
    ranked AS (SELECT u, ROW_NUMBER() OVER (ORDER BY u) AS r FROM vals),
    exact AS (
      SELECT e.q, v.u AS exact_units
      FROM est e JOIN ranked v ON v.r = FLOOR(e.q * (e.n - 1)) + 1
    )
    SELECT e.q, e.n, e.est_units, x.exact_units,
           ROUND((x.exact_units - e.est_units)
                 / CAST(x.exact_units AS DOUBLE), 6) AS rel_error
    FROM est e JOIN exact x ON e.q = x.q
    ORDER BY e.q
    """
