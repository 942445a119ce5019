"""Vector math over ArrayType(FloatType) columns — pure Catalyst
expressions (SURVEY.md §2.11: similarity search support).

Elements are cast to double *before* multiplication so Spark and the
DuckDB oracle accumulate identically (float×float in float then widening
would diverge in the last bits).

At scale: these run inside WholeStageCodegen over the array values —
no UDF, no Arrow crossing, no Python.  A 64-dim dot product is 64 fused
multiply-adds per row on the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# -- SQL-text builders (optimization r17, guide §1.2 "per-task work" on
# the DRIVER): every Column-API call is one or more py4j round trips,
# and literal-heavy expression trees (a codebook dot is ~90 round trips
# via zip_with/aggregate lambda construction) made QUERY BUILD time the
# dominant cost of the whole similarity family (profiled: 41k round
# trips ≈ 13 s building sim_ann_recall_report alone).  Composing the
# identical expression as ONE SQL string parsed by a single F.expr call
# produces the same resolved Catalyst tree — bit-identical results,
# verified value-for-value on fixture embeddings — at ~2 round trips
# per column.  repr(float) round-trips exactly through the SQL double
# literal ('<repr>D'), so literals are bit-exact too.


def dlit(v: float) -> str:
    """Exact SQL double literal: repr round-trips float64 exactly."""
    return repr(float(v)) + "D"


def vec_sql(vals) -> str:
    """SQL array<double> literal for a Python float sequence."""
    return "array(" + ",".join(dlit(v) for v in vals) + ")"


def dot_sql(a: str, b: str) -> str:
    """SQL text of :func:`dot` over two array-SQL snippets — the same
    left-to-right zip_with/aggregate fold, term for term."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) *"
        f" CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    )


def norm_sql(a: str) -> str:
    """SQL text of :func:`norm` over an array-SQL snippet."""
    return (
        f"sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) *"
        f" CAST(x AS DOUBLE)), 0.0D, (acc, x) -> acc + x))"
    )


def _ident(name: str) -> str:
    return f"`{name}`"


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-to-right dot-product fold.  String args are column NAMES and
    take the one-round-trip SQL-text path; Column args keep the
    Column-API construction (identical resolved expression)."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(dot_sql(_ident(a), _ident(b)))
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    """Euclidean norm fold; string args take the SQL-text path (see
    :func:`dot`)."""
    if isinstance(a, str):
        return F.expr(norm_sql(_ident(a)))
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# Implementation note: alternatives measured at sf0.1 on the 2M-pair
# near-dup join — dimension-unrolled element_at chains (2× slower: falls
# out of codegen at 64 terms) and aggregate-over-index-sequence (1.4×
# slower: per-element element_at beats zip_with's one-shot array walk).
# zip_with+aggregate is the fastest expression-only form; values are a
# left-to-right fold, bit-reproducible in DuckDB's list_sum order.
# For O(N²) pair scoring the Arrow-batched form below wins another ~2×.


def dot_seq_pandas():
    """Arrow-batched dot product with the SAME left-to-right summation
    order as :func:`dot` (and DuckDB's list_sum) — the accumulator loop
    runs over vector positions, vectorized numpy across the batch, so
    each row's adds happen in index order and results are BIT-IDENTICAL
    to the expression form (verified value-for-value at sf0.1).

    Array lambdas are evaluated interpreted on the JVM; for pair joins
    that score millions of rows the Arrow crossing + 64 vectorized ops
    is ~2× faster.  Returned as a factory so importing this module
    doesn't require an active SparkSession."""
    import numpy as np
    import pandas as pd  # noqa: F401 (resolves the stringified hints)
    from pyspark.sql.functions import pandas_udf

    # NB: hints must be real types, not strings — this module has
    # `from __future__ import annotations`, so build the signature
    # explicitly instead of relying on annotation resolution.
    def _dot_impl(a, b):
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        acc = np.zeros(len(A))
        for k in range(A.shape[1]):
            acc = acc + A[:, k] * B[:, k]
        return pd.Series(acc)

    _dot_impl.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf(_dot_impl, "double")


def cosine_rounded(a: Column | str, b: Column | str, digits: int = 6) -> Column:
    """Cosine rounded for cross-engine stability: double accumulation over
    identical inputs agrees to ~1e-15; rounding to 6 digits removes any
    residual last-bit ambiguity before ranking/comparing."""
    return F.round(cosine(a, b), digits)


# ---------------------------------------------------------------------------
# int8 scalar quantization — the vector-compression path for ANN at scale.
# float32×64 = 256 B/vector; int8×64 + scale = 72 B/vector, so a 100 TB
# embedding store shrinks ~3.5× and candidate scoring becomes exact
# integer arithmetic (SIMD-friendly on a real cluster, and bit-trivially
# reproducible in the oracle — no float accumulation at all).
# ---------------------------------------------------------------------------

#: Symmetric int8 range: values quantize to [-127, 127].
INT8_LEVELS = 127


def quantize_scale_sql(a: str) -> str:
    """SQL text of :func:`quantize_scale` over an array-SQL snippet."""
    return (
        f"array_max(transform({a}, x -> abs(CAST(x AS DOUBLE))))"
        f" / {dlit(float(INT8_LEVELS))}"
    )


def quantize_scale(a: Column | str) -> Column:
    """Per-vector symmetric scale max|x| / 127 (0.0 for all-zero vectors).
    String args take the SQL-text path (see :func:`dot`)."""
    if isinstance(a, str):
        return F.expr(quantize_scale_sql(_ident(a)))
    return F.array_max(F.transform(a, lambda x: F.abs(x.cast("double")))) / F.lit(
        float(INT8_LEVELS)
    )


def quantize_int8_sql(a: str, scale_sql: str) -> str:
    """SQL text of :func:`quantize_int8`; ``scale_sql`` is a SQL snippet
    (re-evaluated per element exactly like the captured Column was)."""
    return (
        f"transform({a}, x -> CAST(floor(CAST(x AS DOUBLE) / ({scale_sql})"
        f" + 0.5D) AS BIGINT))"
    )


def quantize_int8(a: Column | str, scale: Column) -> Column:
    """Quantized codes via ``floor(x/s + 0.5)`` — round-half-up spelled in
    floor so both engines agree exactly (their native round() tie rules
    differ).  Caller must exclude all-zero vectors (scale 0)."""
    a = F.col(a) if isinstance(a, str) else a
    return F.transform(a, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("long"))


def int_dot_sql(qa: str, qb: str) -> str:
    """SQL text of :func:`int_dot` over two code-array snippets."""
    return (
        f"aggregate(zip_with({qa}, {qb}, (x, y) -> x * y),"
        f" CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def int_dot(qa: Column | str, qb: Column | str) -> Column:
    """Exact integer dot product of two code arrays (≤ 64·127² ≈ 1.03e6
    for 64-dim int8 — no overflow anywhere near bigint).  String args
    take the SQL-text path (see :func:`dot`)."""
    if isinstance(qa, str) and isinstance(qb, str):
        return F.expr(int_dot_sql(_ident(qa), _ident(qb)))
    prods = F.zip_with(qa, qb, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)
