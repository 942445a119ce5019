"""Skew-resistant join (SURVEY.md §4 scale toolkit).

AQE's skew-join splitting (on in session.py) handles most runtime skew;
this explicit salted join is for the pathological case AQE can't fix —
a single hot key bigger than one executor's memory on the BUILD side,
or deterministic plan-shape requirements.

Construction: scatter the big side into ``salt`` sub-keys with a
deterministic per-row hash, replicate the small side once per sub-key,
join on (key, salt).  Each hot key's rows spread over ``salt`` tasks;
results are identical to the unsalted join because every (key, salt)
pair on the big side meets exactly one copy of the small side's key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the big side salted across ``salt`` buckets.

    ``how`` supports inner/left (the replicated side must be the
    lookup side for outer semantics to hold)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    # deterministic scatter: hash of the whole row, never rand() —
    # retries/speculative tasks must land rows in the same bucket
    scatter = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    bigs = big.withColumn("__salt", scatter.cast("int"))
    salts = F.array(*[F.lit(i) for i in range(salt)])
    smalls = small.withColumn("__salt", F.explode(salts))
    return bigs.join(smalls, on=[*on, "__salt"], how=how).drop("__salt")
