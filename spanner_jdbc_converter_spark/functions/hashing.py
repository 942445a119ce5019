"""Portable deterministic hashing — identical values in Spark and DuckDB.

The engine's dedup/LSH operators need hash functions the DuckDB oracle
can reproduce exactly.  ``xxhash64``/``hash`` differ between engines, but
md5 is md5 everywhere:

* Spark : conv(substring(md5(cast(x AS BINARY)), 1, 15), 16, 10)::long
* DuckDB: CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)

15 hex digits = 60 bits — always non-negative in a signed 64-bit long.
Seeded variants prefix the input with "<seed>:" so K independent hash
functions come from one md5 core (standard MinHash construction).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Bits of the md5 prefix used (15 hex digits).
HASH_BITS = 60


def md5_long(col: Column) -> Column:
    """60-bit integer hash of a string column, oracle-reproducible."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def md5_long_seeded(col: Column, seed: int) -> Column:
    """k-th independent hash: md5 over '<seed>:<value>'."""
    return md5_long(F.concat(F.lit(f"{seed}:"), col))


def md5_long_sql(expr: str) -> str:
    """DuckDB-side rendering of :func:`md5_long` for oracle queries."""
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


def md5_long_seeded_sql(expr: str, seed: int) -> str:
    return md5_long_sql(f"concat('{seed}:', {expr})")
