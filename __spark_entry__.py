"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``spanner_jdbc_converter_spark/``; this module is
just the registry surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue by nation: scan→filter→join×3→agg→sort→limit)
    on /root/testdata/sf0.001; driver checks rows>0."""
    from spanner_jdbc_converter_spark.plans import QUERIES

    return QUERIES["flagship_revenue_by_nation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from spanner_jdbc_converter_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per queries() key (omitted ⇒ rows-only check)."""
    from spanner_jdbc_converter_spark.plans import ORACLE

    return dict(ORACLE)
