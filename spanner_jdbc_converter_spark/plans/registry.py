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
