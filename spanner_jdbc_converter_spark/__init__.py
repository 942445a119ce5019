"""spanner_jdbc_converter_spark — a PySpark-native analytics/ETL engine.

Re-expresses the capability surface of the reference JDBC↔Cloud Spanner
conversion tool (schema conversion, partitioned bulk copy, range-partitioned
delete, catalog/cardinality probes) as idiomatic Spark DataFrame programs,
and adds the query + large-scale-pipeline operators (joins, aggregations,
windows, dedup, similarity search, text analysis, streaming) that a modern
engine is expected to ship.

Design notes
------------
* Everything is declarative DataFrame / SQL — Catalyst handles column
  pruning, predicate pushdown, join strategy, and AQE handles runtime
  re-planning.  There are no custom Catalyst rules (SURVEY.md §4 shows the
  reference needs none).
* The reference's thread pools / OFFSET pagination / JDBC batching collapse
  into Spark's own partitioned execution; our code is the semantic layer:
  type mapping, convert modes, partition planning, and the query corpus.
"""

__version__ = "0.1.0"

from spanner_jdbc_converter_spark.session import get_spark  # noqa: F401
