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


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
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


def quantize_scale(a: Column | str) -> Column:
    """Per-vector symmetric scale max|x| / 127 (0.0 for all-zero vectors)."""
    a = F.col(a) if isinstance(a, str) else a
    return F.array_max(F.transform(a, lambda x: F.abs(x.cast("double")))) / F.lit(
        float(INT8_LEVELS)
    )


def quantize_int8(a: Column | str, scale: Column) -> Column:
    """Quantized codes via ``floor(x/s + 0.5)`` — round-half-up spelled in
    floor so both engines agree exactly (their native round() tie rules
    differ).  Caller must exclude all-zero vectors (scale 0)."""
    a = F.col(a) if isinstance(a, str) else a
    return F.transform(a, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("long"))


def int_dot(qa: Column, qb: Column) -> Column:
    """Exact integer dot product of two code arrays (≤ 64·127² ≈ 1.03e6
    for 64-dim int8 — no overflow anywhere near bigint)."""
    prods = F.zip_with(qa, qb, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)
