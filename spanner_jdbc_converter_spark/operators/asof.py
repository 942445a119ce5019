"""As-of join — match each left row to the most recent right row at or
before its timestamp (per key).

Spark has no native AS-OF join (DuckDB/Pandas do); the naive form is a
range join that explodes to one row per (left, every-earlier-right)
pair before picking the max.  This implementation uses the scalable
union + last_value(ignorenulls) pattern instead:

1. tag both sides and union them (right side sorts BEFORE a left row
   at the same timestamp, so ties are visible to it);
2. one window pass per key, ordered by (ts, side, id): running
   last-non-null of the right-side payload IS the as-of match;
3. keep left rows.

Cost: ONE hash(key) shuffle + per-key sort over |L|+|R| rows — no
range explosion, no skew amplification; at 100 TB this is the same
shape as any windowed aggregation.  (The reference has no join surface
at all — SURVEY.md §2.3; this is a driver-mandated extension shape.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: tuple[str, ...] = ("event_id",),
    id_col: str = "event_id",
) -> DataFrame:
    """For every left row: the latest right row with ``right_ts <=
    left_ts`` on the same ``on`` key (ties among right rows broken by
    the largest ``id_col`` — deterministic).  Left rows with no earlier
    right row keep NULL matches (left-outer as-of semantics).

    Output: all left columns + ``match_<payload>`` columns +
    ``match_ts``."""
    l_tag = left.select(
        F.col(on), F.col(left_ts).alias("__ts"), F.lit(1).alias("__side"),
        F.col(id_col).alias("__ord"),
        F.struct(*left.columns).alias("__left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_payload],
        F.lit(None).cast("timestamp").alias("__r_ts"),
    )
    r_tag = right.select(
        F.col(on), F.col(right_ts).alias("__ts"), F.lit(0).alias("__side"),
        F.col(id_col).alias("__ord"),
        F.lit(None).cast(l_tag.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
        F.col(right_ts).alias("__r_ts"),
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side", "__ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.select(
        "__side",
        "__left",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"match_{c}")
            for c in right_payload
        ],
        F.last("__r_ts", ignorenulls=True).over(w).alias("match_ts"),
    )
    out_cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    return matched.filter(F.col("__side") == 1).select(
        *out_cols,
        *[F.col(f"match_{c}") for c in right_payload],
        "match_ts",
    )
