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


# ---------------------------------------------------------------------------
# Cheap seeded rehash — K independent hash functions from ONE md5.
#
# MinHash needs K hashes per shingle.  K md5 calls per shingle is the
# naive construction and dominates runtime (md5 is ~100× the cost of
# integer arithmetic, and Spark evaluates array lambdas interpreted).
# The standard fix is universal hashing over a single base hash:
#
#     h_k(x) = (a_k * fold(x) + b_k) mod p,   p = 2^31 - 1 (Mersenne)
#     fold(x) = (x >> 30) XOR (x & (2^30 - 1))   — 60-bit md5 → 30 bits
#
# fold < 2^30 and a_k < 2^30 keep a_k*fold < 2^60: no 64-bit overflow on
# either engine (DuckDB *raises* on BIGINT overflow, so this bound is
# load-bearing).  (a_k, b_k) derive from md5 of the seed index at import
# time — deterministic constants shared by Spark exprs and oracle SQL.
# ---------------------------------------------------------------------------

MIX_PRIME = (1 << 31) - 1
MIX_MASK = (1 << 30) - 1


def _mix_constants(n: int) -> list[tuple[int, int]]:
    import hashlib

    out = []
    for i in range(n):
        d = hashlib.md5(f"mix:{i}".encode()).hexdigest()
        a = (int(d[:8], 16) % MIX_MASK) | 1  # odd, 1 <= a < 2^30
        b = int(d[8:16], 16) % MIX_PRIME
        out.append((a, b))
    return out


#: Frozen (a_k, b_k) pairs for seeds 0..63.
MIX_CONSTANTS: list[tuple[int, int]] = _mix_constants(64)


def seeded_rehash(col: Column, seed: int) -> Column:
    """k-th universal rehash of a 60-bit base hash (see module note)."""
    a, b = MIX_CONSTANTS[seed]
    folded = F.shiftright(col, 30).bitwiseXOR(col.bitwiseAND(F.lit(MIX_MASK)))
    return (F.lit(a) * folded + F.lit(b)) % F.lit(MIX_PRIME)


def seeded_rehash_sql(expr: str, seed: int) -> str:
    """DuckDB rendering of :func:`seeded_rehash` (same constants)."""
    a, b = MIX_CONSTANTS[seed]
    return f"({a} * xor({expr} >> 30, {expr} & {MIX_MASK}) + {b}) % {MIX_PRIME}"


def seeded_rehash_spark_sql(expr: str, seed: int) -> str:
    """Spark-SQL text of :func:`seeded_rehash` — the identical
    fold/multiply/mod tree composed as one string (optimization r17,
    guide §7.3: the Column form costs ~10 py4j round trips per seed and
    MinHash builds K of them per signature chain)."""
    a, b = MIX_CONSTANTS[seed]
    return (
        f"(({a} * (shiftright({expr}, 30) ^ ({expr} & {MIX_MASK})) + {b})"
        f" % {MIX_PRIME})"
    )
