"""Catalog & scan operators (SURVEY.md §2.1: S1-S8) over parquet fixtures
and Spark's own catalog.

The reference discovers everything at runtime from JDBC ``DatabaseMetaData``
(REF/ddl/TableConverter.java:151,205,223; REF/util/ConverterUtils.java:166-216).
Here the same operators are expressed against self-describing parquet and
``spark.catalog`` — schema inference is native, so S2/S3/S4 reduce to
``StructType`` inspection plus metadata we carry explicitly.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: All driver fixture tables (TESTDATA.md).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Primary keys carried as metadata — Spark has no PK enforcement
#: (reference reads these via getPrimaryKeys, REF/ddl/TableConverter.java:223-250).
PRIMARY_KEYS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey", "l_linenumber"),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: System schemas the reference filters out (REF/cfg/ConverterConfiguration.java:38-41,64-68).
_SYSTEM_SCHEMAS = ("INFORMATION_SCHEMA",)
_SYSTEM_SCHEMA_PREFIXES = ("PG_",)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Partitioned scan of one fixture table (S5/S6 analog).

    Every ``spark.read`` is already a partitioned scan — the reference's
    OFFSET pagination (REF/data/UploadWorker.java:50-72) and Spanner
    BatchReadOnly partitions (REF/data/CloudSpannerTableWorker.java:44-64)
    both collapse into file splits here.

    ``events.ts`` is TIMESTAMP(NANOS) in parquet, which Spark has no
    native type for.  The shape it arrives in depends on the Spark line:

    * Spark 3.x with ``spark.sql.legacy.parquet.nanosAsLong``: raw int64
      ns-epoch — convert with *integer* division (ns magnitudes ~1.7e18
      exceed double's 53-bit mantissa; a float path would corrupt µs).
    * Spark 4.x: ``nanosAsLong`` is inert and the column reads as
      TIMESTAMP_NTZ (ns truncated to µs) — cast to TIMESTAMP.  The
      session TZ is pinned UTC below, so NTZ→LTZ is value-identical to
      what the DuckDB oracle (naive timestamps) computes.

    Both paths land on the same µs-truncated TIMESTAMP values that every
    oracle hash was validated under (SURVEY.md §7.4).
    """
    # Runtime-settable; the driver hands us a bare session without our
    # session.py builder confs, so pin UTC here before every scan.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if spark.version.startswith("3."):
        # Inert (and misleading) on Spark 4 — only set where it works.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_event_time(df)
    return df


def _normalize_event_time(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to TimestampType whatever shape the
    parquet reader produced (see ``load_table`` docstring).  Downstream
    ``unix_micros``/``withWatermark`` require TIMESTAMP, not NTZ."""
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in FIXTURE_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def is_system_schema(schema: str) -> bool:
    """P6 predicate: case-insensitive equality + prefix match."""
    up = schema.upper()
    return up in _SYSTEM_SCHEMAS or any(up.startswith(p) for p in _SYSTEM_SCHEMA_PREFIXES)


def list_user_tables(spark: SparkSession, database: str | None = None) -> list[str]:
    """S1: enumerate user tables, filtering system schemas."""
    tables = spark.catalog.listTables(database) if database else spark.catalog.listTables()
    return [t.name for t in tables if not is_system_schema(t.database or "")]


def table_exists_in_source(source_tables: list[str], dest_tables: list[str]) -> list[str]:
    """S7 existence probe: keep destination tables that also exist in source.

    Semi-join on catalog metadata (REF/data/DataCopier.java:128-138) —
    driver-side set intersection preserving destination order.
    """
    src = {t.upper() for t in source_tables}
    return [t for t in dest_tables if t.upper() in src]


def record_count(df: DataFrame) -> int:
    """S8/A1 cardinality probe — COUNT(*) (REF/util/ConverterUtils.java:193-216)."""
    return df.count()


@dataclass
class ColumnsMeta:
    """S2/S3 column-metadata scan result — the reference's ``Columns``
    (REF/data/Columns.java:9-13): parallel names/types plus PK columns."""

    names: list[str] = field(default_factory=list)
    spark_types: list[str] = field(default_factory=list)
    primary_key: list[str] = field(default_factory=list)

    @property
    def column_list(self) -> str:
        return ", ".join(self.names)

    @property
    def pk_list(self) -> str:
        return ", ".join(self.primary_key)


def get_columns(df: DataFrame, table: str) -> ColumnsMeta:
    """S2+S3: column names/types from the DataFrame schema, PK from metadata."""
    return ColumnsMeta(
        names=[f.name for f in df.schema.fields],
        spark_types=[f.dataType.simpleString() for f in df.schema.fields],
        primary_key=list(PRIMARY_KEYS.get(table, ())),
    )
