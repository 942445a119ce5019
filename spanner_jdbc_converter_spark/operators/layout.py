"""Z-order (Morton-code) data layout — multi-column clustering for scan
pruning.

The reference's only layout tool is the secondary index it re-creates on
the destination (REF/ddl/IndexConverter.java:95-180); a data lake has no
indexes, so the equivalent lever is FILE LAYOUT: parquet scans skip row
groups whose min/max footer stats exclude the predicate, and min/max
stats are only selective when the data is clustered on the filtered
columns.  A single-column sort clusters one column perfectly and the
second not at all; interleaving the bits of both (the Z-order /
Morton curve) keeps *both* columns' value ranges tight within every
file — the standard trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Everything here is exact integer bit arithmetic (shift / mask /
interleave), generated from one loop for both Spark Columns and DuckDB
SQL — the codes are oracle-reproducible, and the re-layout itself is
``repartitionByRange(zcode) + sortWithinPartitions(zcode)``: a single
range shuffle, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits interleaved per dimension (16-bit Morton codes).
Z_BITS = 8


def morton_interleave(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton code of two ``bits``-wide non-negative ints: bit i of ``a``
    lands at position 2i, bit i of ``b`` at 2i+1.  Pure shift/mask —
    whole-stage-codegen friendly, no UDF."""
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = code + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        code = code + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return code


def morton_interleave_sql(a_expr: str, b_expr: str, bits: int = Z_BITS) -> str:
    """DuckDB rendering of :func:`morton_interleave` (same bit layout)."""
    # every term fully parenthesized: SQL gives '+' higher precedence
    # than '<<' (C-style), so a bare `t1 + bit << n` shifts the SUM
    terms = []
    for i in range(bits):
        terms.append(f"(((({a_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_by(df: DataFrame, zcode: Column, num_partitions: int) -> DataFrame:
    """Cluster rows along the Z-curve: range-partition on the Morton code
    (contiguous curve segments per output file) and sort within each
    partition, so every file's min/max stats are tight on BOTH
    interleaved columns.  One range shuffle; the sort is local."""
    return df.repartitionByRange(num_partitions, zcode.alias("__z")).sortWithinPartitions(
        zcode.alias("__z")
    )
