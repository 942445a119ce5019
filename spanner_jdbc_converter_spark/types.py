"""JDBC ↔ Spark ↔ {Cloud Spanner, PostgreSQL} type mapping (SURVEY.md §1.4).

The reference's core data-model computation is a configurable JDBC→target
type mapping keyed by ``java.sql.Types`` codes with ``$1`` as a size
placeholder (REF/ddl/TableConverter.java:22,59-109,254-277).  This module
re-expresses it as plain data + functions, and adds the Spark ``DataType``
column the reference never needed.

Deliberate deviations from reference *bugs* (SURVEY.md §5.2), each behind
a flag:
* DECIMAL/NUMERIC → Spanner FLOAT64 is lossy by design
  (REF/ddl/TableConverter.java:72,82); we default to NUMERIC-preserving
  behavior unless ``lossy_decimal=True`` replicates the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# java.sql.Types constants (public JDBC API).
BIT = -7
TINYINT = -6
SMALLINT = 5
INTEGER = 4
BIGINT = -5
FLOAT = 6
REAL = 7
DOUBLE = 8
NUMERIC = 2
DECIMAL = 3
CHAR = 1
VARCHAR = 12
LONGVARCHAR = -1
NVARCHAR = -9
DATE = 91
TIME = 92
TIMESTAMP = 93
BINARY = -2
VARBINARY = -3
LONGVARBINARY = -4
BLOB = 2004
CLOB = 2005
BOOLEAN = 16
ARRAY = 2003

SPANNER = "cloudspanner"
POSTGRESQL = "postgresql"

#: Size-resolution constants (REF/ddl/TableConverter.java:34-40).
DEFAULT_SIZE_STRING = 4000
DEFAULT_SIZE_BYTES = 1_000_000
DEFAULT_SIZE_OTHER = 100
MAX_COLUMN_SIZE = 1_000_000

#: JDBC → Cloud Spanner DDL types (REF/ddl/TableConverter.java:59-83).
_SPANNER_MAP: dict[int, str] = {
    BOOLEAN: "BOOL",
    BIT: "BOOL",
    BIGINT: "INT64",
    SMALLINT: "INT64",
    TINYINT: "INT64",
    INTEGER: "INT64",
    CHAR: "STRING(1)",
    VARCHAR: "STRING($1)",
    NVARCHAR: "STRING($1)",
    FLOAT: "FLOAT64",
    REAL: "FLOAT64",
    DOUBLE: "FLOAT64",
    DECIMAL: "FLOAT64",  # lossy — reference behavior; see map_type(lossy_decimal)
    NUMERIC: "FLOAT64",
    DATE: "DATE",
    TIME: "TIMESTAMP",  # TIME widened (REF/ddl/TableConverter.java:74)
    TIMESTAMP: "TIMESTAMP",
    BINARY: "BYTES($1)",
    VARBINARY: "BYTES($1)",
    LONGVARBINARY: "BYTES($1)",
    BLOB: "BYTES($1)",
    LONGVARCHAR: "STRING($1)",
    CLOB: "STRING($1)",
}

#: JDBC → PostgreSQL DDL types (REF/ddl/TableConverter.java:85-109).
_PG_MAP: dict[int, str] = {
    BOOLEAN: "BOOLEAN",
    BIT: "BOOLEAN",
    BIGINT: "BIGINT",
    SMALLINT: "SMALLINT",
    TINYINT: "SMALLINT",
    INTEGER: "INTEGER",
    CHAR: "CHARACTER",
    VARCHAR: "VARCHAR($1)",
    NVARCHAR: "VARCHAR($1)",
    FLOAT: "REAL",
    REAL: "REAL",
    DOUBLE: "DOUBLE PRECISION",
    DECIMAL: "DECIMAL",
    NUMERIC: "NUMERIC",
    DATE: "DATE",
    TIME: "TIME",
    TIMESTAMP: "TIMESTAMP",
    BINARY: "BYTEA",
    VARBINARY: "BYTEA",
    LONGVARBINARY: "BYTEA",
    BLOB: "BYTEA",
    LONGVARCHAR: "TEXT",
    CLOB: "TEXT",
}

_DIALECT_MAPS = {SPANNER: _SPANNER_MAP, POSTGRESQL: _PG_MAP}

#: Spanner NUMERIC-preserving override used when lossy_decimal=False.
_SPANNER_EXACT_DECIMAL = "NUMERIC"

#: JDBC → Spark DataType (our engine's in-memory representation).
_SPARK_MAP: dict[int, T.DataType] = {
    BOOLEAN: T.BooleanType(),
    BIT: T.BooleanType(),
    BIGINT: T.LongType(),
    SMALLINT: T.ShortType(),
    TINYINT: T.ByteType(),
    INTEGER: T.IntegerType(),
    CHAR: T.StringType(),
    VARCHAR: T.StringType(),
    NVARCHAR: T.StringType(),
    FLOAT: T.FloatType(),
    REAL: T.FloatType(),
    DOUBLE: T.DoubleType(),
    DECIMAL: T.DecimalType(38, 9),
    NUMERIC: T.DecimalType(38, 9),
    DATE: T.DateType(),
    TIME: T.TimestampType(),
    TIMESTAMP: T.TimestampType(),
    BINARY: T.BinaryType(),
    VARBINARY: T.BinaryType(),
    LONGVARBINARY: T.BinaryType(),
    BLOB: T.BinaryType(),
    LONGVARCHAR: T.StringType(),
    CLOB: T.StringType(),
}

#: Spark DataType class → JDBC code, for DDL generation from DataFrame schemas.
_FROM_SPARK: dict[type, int] = {
    T.BooleanType: BOOLEAN,
    T.ByteType: TINYINT,
    T.ShortType: SMALLINT,
    T.IntegerType: INTEGER,
    T.LongType: BIGINT,
    T.FloatType: REAL,
    T.DoubleType: DOUBLE,
    T.DecimalType: NUMERIC,
    T.StringType: VARCHAR,
    T.DateType: DATE,
    T.TimestampType: TIMESTAMP,
    # Parquet TIMESTAMP(isAdjustedToUTC=false) reads as NTZ in Spark 4;
    # both map to the dialects' naive TIMESTAMP DDL type.
    T.TimestampNTZType: TIMESTAMP,
    T.BinaryType: VARBINARY,
}


class UnknownTypeError(ValueError):
    """Unknown JDBC type codes throw (REF/ddl/TableConverter.java:266-268)."""


def resolve_size(jdbc_type: int, column_size: int) -> int:
    """``$1`` size resolution: min(size, 1e6); 0 → per-family default
    (REF/ddl/TableConverter.java:269-277,287-295)."""
    if column_size and column_size > 0:
        return min(column_size, MAX_COLUMN_SIZE)
    if jdbc_type in (VARCHAR, NVARCHAR, LONGVARCHAR, CLOB, CHAR):
        return DEFAULT_SIZE_STRING
    if jdbc_type in (BINARY, VARBINARY, LONGVARBINARY, BLOB):
        return DEFAULT_SIZE_BYTES
    return DEFAULT_SIZE_OTHER


def map_type(
    jdbc_type: int,
    dialect: str,
    column_size: int = 0,
    *,
    table: str | None = None,
    column: str | None = None,
    overrides: dict[str, str] | None = None,
    lossy_decimal: bool = True,
) -> str:
    """JDBC type code → target DDL type string.

    Per-column overrides are keyed ``column`` or ``table.column``;
    the table-qualified form wins (REF/cfg/ConverterConfiguration.java:264-278,
    REF/ddl/TableConverter.java:254-262).
    """
    if overrides and column:
        qualified = f"{table}.{column}" if table else None
        if qualified and qualified in overrides:
            return overrides[qualified]
        if column in overrides:
            return overrides[column]

    dialect_map = _DIALECT_MAPS.get(dialect.lower())
    if dialect_map is None:
        raise UnknownTypeError(f"unknown dialect: {dialect}")
    ddl = dialect_map.get(jdbc_type)
    if ddl is None:
        raise UnknownTypeError(f"unknown JDBC type code {jdbc_type} for {dialect}")
    if (
        not lossy_decimal
        and dialect.lower() == SPANNER
        and jdbc_type in (DECIMAL, NUMERIC)
    ):
        ddl = _SPANNER_EXACT_DECIMAL
    if "$1" in ddl:
        ddl = ddl.replace("$1", str(resolve_size(jdbc_type, column_size)))
    return ddl


def to_spark_type(jdbc_type: int, precision: int = 0, scale: int = 0) -> T.DataType:
    """JDBC type code → Spark DataType."""
    if jdbc_type in (DECIMAL, NUMERIC) and precision:
        return T.DecimalType(precision, scale)
    dt = _SPARK_MAP.get(jdbc_type)
    if dt is None:
        raise UnknownTypeError(f"unknown JDBC type code {jdbc_type}")
    return dt


def from_spark_type(dt: T.DataType) -> int:
    """Spark DataType → JDBC type code (for DDL generation from schemas)."""
    code = _FROM_SPARK.get(type(dt))
    if code is None:
        raise UnknownTypeError(f"no JDBC mapping for Spark type {dt.simpleString()}")
    return code


@dataclass
class ColumnSpec:
    """One column as the DDL generator sees it."""

    name: str
    jdbc_type: int
    size: int = 0
    nullable: bool = True

    def ddl_type(self, dialect: str, table: str | None = None,
                 overrides: dict[str, str] | None = None,
                 lossy_decimal: bool = True) -> str:
        return map_type(
            self.jdbc_type, dialect, self.size,
            table=table, column=self.name, overrides=overrides,
            lossy_decimal=lossy_decimal,
        )


@dataclass
class TableSpec:
    """Table + columns + PK — the unit the DDL generator consumes."""

    name: str
    columns: list[ColumnSpec] = field(default_factory=list)
    primary_key: list[str] = field(default_factory=list)


def table_spec_from_schema(
    name: str, schema: T.StructType, primary_key: list[str] | None = None
) -> TableSpec:
    """Build a TableSpec from a Spark schema (our analog of the reference's
    getColumns metadata scan, REF/util/ConverterUtils.java:166-191)."""
    cols = [
        ColumnSpec(f.name, from_spark_type(f.dataType), nullable=f.nullable)
        for f in schema.fields
    ]
    return TableSpec(name=name, columns=cols, primary_key=list(primary_key or []))
