"""Dialect-aware DDL generation (SURVEY.md §2.8: W1-W3).

Reproduces the reference's CREATE TABLE / CREATE INDEX / DROP generation
(REF/ddl/TableConverter.java:147-301, REF/ddl/IndexConverter.java:81-186):

* Cloud Spanner: PRIMARY KEY clause *after* the closing paren.
* PostgreSQL: PRIMARY KEY (...) inline as the last element of the column
  list.
* NOT NULL emitted when the column is non-nullable
  (REF/ddl/TableConverter.java:279-285).
* Index DDL preserves column order and ASC/DESC, and skips indexes whose
  name matches a primary key (REF/ddl/IndexConverter.java:58-79,100-102).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from spanner_jdbc_converter_spark.types import SPANNER, TableSpec


def create_table_ddl(
    spec: TableSpec,
    dialect: str,
    *,
    overrides: dict[str, str] | None = None,
    lossy_decimal: bool = True,
) -> str:
    """W1: CREATE TABLE with dialect PK placement."""
    col_lines = []
    for col in spec.columns:
        ddl_type = col.ddl_type(
            dialect, table=spec.name, overrides=overrides, lossy_decimal=lossy_decimal
        )
        null_clause = "" if col.nullable else " NOT NULL"
        col_lines.append(f"{col.name} {ddl_type}{null_clause}")

    pk = ", ".join(spec.primary_key)
    if dialect.lower() == SPANNER:
        body = ", ".join(col_lines)
        return f"CREATE TABLE {spec.name} ({body}) PRIMARY KEY ({pk})"
    if pk:
        col_lines.append(f"PRIMARY KEY ({pk})")
    body = ", ".join(col_lines)
    return f"CREATE TABLE {spec.name} ({body})"


@dataclass
class IndexSpec:
    """Secondary index metadata (REF/ddl/IndexConverter.java:95-99,146-180)."""

    name: str
    table: str
    columns: list[str] = field(default_factory=list)
    descending: list[bool] = field(default_factory=list)
    unique: bool = False


def create_index_ddl(index: IndexSpec, pk_index_names: set[str] | None = None) -> str | None:
    """W2: CREATE INDEX; returns None for PK-backing indexes (skipped, like
    REF/ddl/IndexConverter.java:100-102)."""
    if pk_index_names and index.name in pk_index_names:
        return None
    desc = index.descending or [False] * len(index.columns)
    cols = ", ".join(
        f"{c} DESC" if d else c for c, d in zip(index.columns, desc)
    )
    unique = "UNIQUE " if index.unique else ""
    return f"CREATE {unique}INDEX {index.name} ON {index.table} ({cols})"


def drop_table_ddl(table: str) -> str:
    """W3 (REF/ddl/TableConverter.java:297-301)."""
    return f"DROP TABLE {table}"


def drop_index_ddl(index: str) -> str:
    """W3 (REF/ddl/IndexConverter.java:182-186)."""
    return f"DROP INDEX {index}"
