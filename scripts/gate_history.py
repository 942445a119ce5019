"""Gate-window telemetry: which corpus entries got driver correctness
rows in which round, machine-checkable instead of comment-tracked
(VERDICT r6 #8 / minor #3).

Scans the driver-recorded ``CORRECTNESS_r*.json`` files at the repo
root and writes ``GATE_HISTORY.json``::

    {
      "rounds_seen": [1, ..., N],
      "entries": {
        "<entry>": {"rounds": [..], "last_round": N,
                    "last_status": "pass" | "rows_only" | "fail"},
        ...
      },
      "never_checked": [..]        # registered entries with no row yet
    }

Run with ``--propose K`` to print the staleness-ordered front of the
next gate window: never-checked entries first (oldest registration
first), then by ascending last-checked round.  The rotation in
``plans/__init__.py`` should keep its ``_GATE_PRIORITY`` consistent
with this ordering; ``tests/test_config.py`` asserts the invariants.

Usage (from the repo root)::

    python scripts/gate_history.py [--propose 50]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def entry_status(row: dict) -> str:
    if row.get("err"):
        return "fail"
    if row.get("hash_match") is None:
        return "rows_only" if row.get("rows_match") else "fail"
    return "pass" if row.get("hash_match") else "fail"


def build_history(registered: list[str] | None = None) -> dict:
    rounds: dict[int, dict] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", os.path.basename(path))
        if not m:
            continue
        with open(path) as fh:
            rounds[int(m.group(1))] = json.load(fh)

    entries: dict[str, dict] = {}
    for rnd in sorted(rounds):
        for name, row in rounds[rnd].items():
            rec = entries.setdefault(name, {"rounds": []})
            rec["rounds"].append(rnd)
            rec["last_round"] = rnd
            rec["last_status"] = entry_status(row)

    never = [n for n in (registered or []) if n not in entries]
    return {
        "rounds_seen": sorted(rounds),
        "entries": dict(sorted(entries.items())),
        "never_checked": never,
    }


def propose_window(history: dict, registered: list[str], k: int = 50) -> list[str]:
    """Staleness-ordered gate front: never-checked entries first (in
    registration order), then ascending last-checked round, ties in
    registration order."""
    reg_pos = {n: i for i, n in enumerate(registered)}
    never = [n for n in registered if n not in history["entries"]]
    checked = sorted(
        (n for n in registered if n in history["entries"]),
        key=lambda n: (history["entries"][n]["last_round"], reg_pos[n]),
    )
    return (never + checked)[:k]


def main() -> None:
    registered: list[str] = []
    try:
        sys.path.insert(0, REPO)
        # REGISTRATION_ORDER is append-only and never touched by the
        # gate-window rotation (importing the registry module pulls in
        # plans/__init__, whose rotation reorders QUERIES — so QUERIES
        # itself can NOT provide registration order here).
        from spanner_jdbc_converter_spark.plans.registry import (
            REGISTRATION_ORDER,
        )

        registered = list(REGISTRATION_ORDER)
    except Exception as exc:  # registry unavailable: history still useful
        print(f"gate_history: registry not loaded ({exc})", file=sys.stderr)

    history = build_history(registered)
    out = os.path.join(REPO, "GATE_HISTORY.json")
    with open(out, "w") as fh:
        json.dump(history, fh, indent=1, sort_keys=True)
    n_entries = len(history["entries"])
    print(
        f"GATE_HISTORY.json: {n_entries} entries with driver rows across "
        f"rounds {history['rounds_seen']}, {len(history['never_checked'])} never checked"
    )
    if "--propose" in sys.argv:
        idx = sys.argv.index("--propose")
        try:
            k = int(sys.argv[idx + 1])
        except (IndexError, ValueError):
            k = 50
            print("gate_history: --propose takes an integer K; defaulting to 50", file=sys.stderr)
        for name in propose_window(history, registered, k):
            rec = history["entries"].get(name)
            tag = f"r{rec['last_round']}:{rec['last_status']}" if rec else "NEVER"
            print(f"  {name:45s} {tag}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `--propose N | head` closing early is fine
        import os

        os._exit(0)
