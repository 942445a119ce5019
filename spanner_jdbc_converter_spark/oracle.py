"""Local DuckDB-oracle comparison harness.

Mirrors the driver's correctness gate (row-count + column names + value
compare with columns sorted by name) so mismatches are caught at sf0.001
in pytest before the driver runs sf0.01.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from spanner_jdbc_converter_spark.catalog import FIXTURE_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register every fixture parquet as a view, like the driver does."""
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


@dataclass
class CompareResult:
    name: str
    ok: bool
    reasons: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK" if self.ok else "MISMATCH"
        detail = ("\n  " + "\n  ".join(self.reasons)) if self.reasons else ""
        return f"[{status}] {self.name}{detail}"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize row order over all columns."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 1:
        df = df.sort_values(by=list(df.columns), na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # The driver hashes exact values — mirror it bit-for-bit.  Any
        # float drift must be fixed by decimal routing, not tolerated.
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def _kind(dtype) -> str:
    """Collapse a pandas dtype to a hash-relevant kind: the driver's value
    hash distinguishes 2 (int) from 2.0 (float), so int-vs-float column
    dtype drift (e.g. DuckDB HUGEINT rendered as float64 by .df()) must
    fail here even though Python's 2 == 2.0."""
    k = getattr(dtype, "kind", "O")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    reasons: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        reasons.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        reasons.append(f"columns: spark={s_cols} oracle={o_cols}")
    if reasons:
        return CompareResult(name, False, reasons)

    s, o = _canon(spark_pdf), _canon(oracle_pdf)
    for col in s.columns:
        sk, ok_ = _kind(s[col].dtype), _kind(o[col].dtype)
        if sk != ok_ and not (len(s) == 0 and len(o) == 0):
            reasons.append(f"col {col}: dtype kind spark={sk}({s[col].dtype}) oracle={ok_}({o[col].dtype})")
    if reasons:
        return CompareResult(name, False, reasons)
    for col in s.columns:
        sv, ov = list(s[col]), list(o[col])
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(sv, ov)) if not _values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            reasons.append(f"col {col}: {len(bad)} diffs, first at row {i}: spark={x!r} oracle={y!r}")
    return CompareResult(name, not reasons, reasons)


def check_query(spark, con: duckdb.DuckDBPyConnection, sf_dir: str, name: str) -> CompareResult:
    """Run one corpus entry on both engines and compare."""
    from spanner_jdbc_converter_spark.plans import ORACLE, QUERIES

    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLE:
        ok = len(spark_pdf) >= 0
        return CompareResult(name, ok, ["rows-only check (no oracle SQL)"])
    oracle_pdf = con.sql(ORACLE[name]).df()
    return compare_frames(name, spark_pdf, oracle_pdf)
