"""Banded range join — match rows to [lo, hi) bands without a
nested-loop theta join.

The naive plan for ``fact JOIN bands ON v >= lo AND v < hi`` is a
BroadcastNestedLoopJoin: O(|fact| × |bands|) comparisons.  Fine for a
handful of bands, quadratic pain when the band table grows (pricing
tiers × regions × SKUs easily reaches 10⁵ rows).  The scalable form is
bucket expansion:

1. each band explodes to the coarse integer buckets it covers
   (``sequence(floor(lo/step), floor(hi/step))``);
2. each fact row computes its single bucket ``floor(v/step)``;
3. equi-join on bucket (hash join, shuffle-free when bands broadcast),
   then the exact ``lo <= v < hi`` residual filter.

Cost: |bands| × (width/step) expanded rows against a hash lookup per
fact row — linear, AQE-balanced, and the equi key keeps Catalyst on a
BroadcastHashJoin at any band-table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    step: float = 10.0,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Inner-join ``fact`` rows to every band whose [lo, hi) interval
    contains ``value_col``.  Bands may overlap (a row then matches each
    containing band).  ``step`` is the coarse bucket width — choose it
    near the typical band width so expansion stays ~1 bucket/band."""
    expanded = bands.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / step).cast("long"),
                F.floor(F.col(hi_col) / step).cast("long"),
            )
        ),
    )
    keyed = fact.withColumn("__bucket", F.floor(F.col(value_col) / step).cast("long"))
    return (
        keyed.join(F.broadcast(expanded), on="__bucket")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("__bucket")
    )
