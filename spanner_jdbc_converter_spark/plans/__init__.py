"""Query corpus: every operator from SURVEY.md §2 as a (PySpark fn, oracle SQL) pair.

Importing this package loads every corpus module into the shared registry.
"""

from spanner_jdbc_converter_spark.plans.registry import ORACLE, QUERIES, register  # noqa: F401
from spanner_jdbc_converter_spark.plans import queries as _queries  # noqa: F401,E402
from spanner_jdbc_converter_spark.plans import tpch_suite as _tpch_suite  # noqa: F401,E402
from spanner_jdbc_converter_spark.plans import windows_aggs as _windows_aggs  # noqa: F401,E402
from spanner_jdbc_converter_spark.plans import scalars as _scalars  # noqa: F401,E402
from spanner_jdbc_converter_spark.plans import extensions as _extensions  # noqa: F401,E402
from spanner_jdbc_converter_spark.plans import etl as _etl  # noqa: F401,E402
from spanner_jdbc_converter_spark.plans import streaming_queries as _streaming  # noqa: F401,E402

__all__ = ["QUERIES", "ORACLE", "register"]
