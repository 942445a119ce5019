"""Shared registry for the driver-checked query corpus.

Modules (queries.py, extensions.py, streaming.py) register entries here;
__spark_entry__ and the oracle harness read the combined dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

#: Names in the order register() first saw them — unlike QUERIES, this
#: list is NEVER reordered by the gate-window rotation, so tooling that
#: needs true registration order (scripts/gate_history.py) reads it here.
REGISTRATION_ORDER: list[str] = []


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the corpus.
    ``oracle=None`` ⇒ the driver records a weaker rows-only check."""

    def deco(fn):
        if name not in QUERIES:
            REGISTRATION_ORDER.append(name)
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


#: Session-cache primers, keyed by the store they build.  Several corpus
#: entries share (appId, sf_dir)-keyed caches (_curated, the PQ/residual
#: codebooks, span/winnow/group frames, BPE/unigram vocab frames); the
#: FIRST entry to touch a store pays its build cost, so in a timed bench
#: sweep the payer is whichever entry happens to run first — a registry
#: reorder shows up as a phantom regression (VERDICT r10/r13/r14
#: adjudication tax).  Each store-owning module registers a primer here;
#: bench.py runs them all UNTIMED before the timed loop so no timed entry
#: ever pays another entry's cache build.  Primers must be idempotent
#: (they call the same memoized helper the entries call).
CACHE_PRIMERS: dict[str, Callable[[SparkSession, str], None]] = {}


def register_cache_primer(store_name: str):
    """Decorator: register a (spark, sf_dir) -> None session-cache builder."""

    def deco(fn):
        CACHE_PRIMERS[store_name] = fn
        return fn

    return deco


def prime_session_caches(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Build every registered session cache for (spark, sf_dir); returns
    {store name: build seconds} so callers (bench.py) can publish the
    per-primer cost — the untimed prime pass grew to ~0.75× the timed
    corpus wall by r17, and VERDICT r17 requires its growth to be
    auditable per store, not one opaque total.  Failures propagate — a
    primer that cannot build is the same defect as the entry that owns
    it failing."""
    import time

    primed: dict[str, float] = {}
    for store_name, fn in CACHE_PRIMERS.items():
        start = time.perf_counter()
        fn(spark, sf_dir)
        primed[store_name] = round(time.perf_counter() - start, 3)
    return primed


def evict_other_keys(store: dict, key: tuple, unpersist) -> None:
    """ADVICE r7: session caches keyed by (appId, dir) must not pin
    persisted frames for the life of the process — a long-lived session
    sweeping many fixture dirs (or restarting its SparkSession) would
    otherwise accumulate an entry per dead key.  Keep only the CURRENT
    key: unpersist and drop everything else; releases against a dead
    SparkContext are best-effort.  Lives here (not etl.py) so every
    corpus module can share it without circular imports."""
    for k in [k for k in store if k != key]:
        entry = store.pop(k)
        try:
            unpersist(entry)
        except Exception:
            pass
