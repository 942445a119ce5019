"""Round-over-round bench comparison on machine-load-normalized medians.

Adjudicates per-entry swings between two ``bench_history/*.json``
records (VERDICT r8 "Next round #4"): raw warm medians swing with
machine load (root-caused in bench_history/REGRESSION_r07.md), so every
comparison here divides by the record's own ``calibration_seconds``
probe first.  Entries whose normalized ratio exceeds the threshold are
flagged; everything else is noise-or-better by the corpus's own
standard (VERDICT r8 treated >1.35x as "unexplained swing").

Usage (from the repo root)::

    python scripts/bench_compare.py                 # two newest rNN.json
    python scripts/bench_compare.py OLD.json NEW.json [--threshold 1.35]
    python scripts/bench_compare.py --all           # every entry, sorted

Exit status: 0 (clean), 1 (at least one flagged regression) — usable as
a pre-commit tripwire.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST = os.path.join(REPO, "bench_history")


def load_normalized(path: str) -> tuple[dict[str, float], float, dict[str, float]]:
    """(normalized warm medians, calibration, RAW warm medians) — the
    normalized view is computed from the raw medians when the record
    predates the precomputed field.  Raw medians ride along for the
    absolute-delta flag (VERDICT r14 "What's wrong #2": a +3.69 s swing
    slipped under the 1.8x ratio gate on a 8 s entry)."""
    with open(path) as fh:
        rec = json.load(fh)
    cal = float(rec.get("calibration_seconds") or 0.0)
    raw = {k: float(v) for k, v in rec.get("queries", {}).items()}
    if "queries_normalized" in rec:
        norm = {k: float(v) for k, v in rec["queries_normalized"].items()}
    else:
        if cal <= 0:
            raise SystemExit(f"{path}: no calibration probe — cannot normalize")
        norm = {
            k: (round(v / cal, 3) if v >= 0 else -1.0) for k, v in raw.items()
        }
    return norm, cal, raw


def newest_round_files() -> tuple[str, str]:
    # numeric sort — lexicographic would pick the wrong pair at r100
    files = sorted(
        (
            p
            for p in glob.glob(os.path.join(HIST, "r*.json"))
            if re.fullmatch(r"r\d+\.json", os.path.basename(p))
        ),
        key=lambda p: int(os.path.basename(p)[1:-5]),
    )
    if len(files) < 2:
        raise SystemExit(
            "need two bench_history/rNN.json records (or pass two paths)"
        )
    return files[-2], files[-1]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old", nargs="?", help="older history file")
    ap.add_argument("new", nargs="?", help="newer history file")
    ap.add_argument("--threshold", type=float, default=1.35)
    ap.add_argument(
        "--abs-delta",
        type=float,
        default=1.5,
        help="ALSO flag entries whose RAW warm median grew by more than this"
        " many seconds, regardless of ratio (VERDICT r14 #2 — big entries"
        " can regress materially while staying under the ratio gate)",
    )
    ap.add_argument(
        "--all", action="store_true", help="print every entry, not just flagged"
    )
    ap.add_argument(
        "--vs-baseline",
        action="store_true",
        help="isolation worklist (VERDICT r15 #1): compare the NEWEST"
        " record against bench_history/r06.json on RAW warm-median ratios"
        " at threshold 2.0 and print every entry that must be ×5-isolated"
        " in-round — no precedent exceptions",
    )
    args = ap.parse_args()

    if args.vs_baseline:
        baseline = os.path.join(HIST, "r06.json")
        # a single positional binds to args.old — honor it (review r16:
        # `bench_compare.py SOME.json --vs-baseline` silently compared
        # the newest rNN.json instead of the named record)
        newest = args.new or args.old or newest_round_files()[1]
        # raw medians only — r06 predates the calibration probe
        def _raw(path: str) -> dict[str, float]:
            with open(path) as fh:
                return {
                    k: float(v)
                    for k, v in json.load(fh).get("queries", {}).items()
                }

        base_raw, new_raw = _raw(baseline), _raw(newest)
        work = sorted(
            (
                (new_raw[n] / base_raw[n], base_raw[n], new_raw[n], n)
                for n in set(base_raw) & set(new_raw)
                if base_raw[n] > 0 and new_raw[n] > 0
                and new_raw[n] / base_raw[n] > 2.0
            ),
            reverse=True,
        )
        # ADVICE r16: an entry that regressed into FAILURE (-1) or
        # vanished from the new record must surface, not silently drop
        # out of the isolation worklist.
        failed = sorted(
            n for n in set(base_raw) & set(new_raw) if new_raw[n] <= 0
        )
        missing_new = sorted(n for n in base_raw if n not in new_raw)
        print(
            f"# RAW ratios {os.path.basename(baseline)} ->"
            f" {os.path.basename(newest)}; entries >2.0x needing"
            f" in-round x5 isolation: {len(work)}"
        )
        for ratio, o, n, name in work:
            print(f"{ratio:7.2f}x  {o:8.2f} -> {n:8.2f}  {name}")
        if failed:
            print(f"# FAILED in new record (ran in baseline): {len(failed)}")
            for name in failed:
                print(f"   FAIL  {base_raw[name]:8.2f} ->    -1.00  {name}")
        if missing_new:
            print(f"# MISSING from new record (in baseline): {len(missing_new)}")
            for name in missing_new:
                print(f"   MISS  {base_raw[name]:8.2f} ->   absent  {name}")
        sys.exit(1 if (work or failed or missing_new) else 0)

    if args.old and args.new:
        old_path, new_path = args.old, args.new
    elif not args.old and not args.new:
        old_path, new_path = newest_round_files()
    else:
        ap.error("pass both paths or neither")

    old, old_cal, old_raw = load_normalized(old_path)
    new, new_cal, new_raw = load_normalized(new_path)

    rows = []
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        if o <= 0 or n <= 0:  # failed/timed-out runs compare as absent
            continue
        raw_delta = new_raw.get(name, 0.0) - old_raw.get(name, 0.0)
        rows.append((n / o, o, n, name, raw_delta))
    rows.sort(reverse=True)

    flagged = [
        r for r in rows if r[0] > args.threshold or r[4] > args.abs_delta
    ]
    improved = [r for r in rows if r[0] < 1 / args.threshold]
    shown = rows if args.all else flagged

    print(
        f"# {os.path.basename(old_path)} (cal {old_cal}) -> "
        f"{os.path.basename(new_path)} (cal {new_cal}); "
        f"{len(rows)} comparable entries, threshold {args.threshold}x"
        f" or raw +{args.abs_delta}s"
    )
    print(f"# flagged regressions: {len(flagged)}  improvements: {len(improved)}")
    for ratio, o, n, name, raw_delta in shown:
        mark = (
            "REGRESSED"
            if ratio > args.threshold
            else (
                f"REGRESSED(abs +{raw_delta:.2f}s)"
                if raw_delta > args.abs_delta
                else ("improved" if ratio < 1 / args.threshold else "")
            )
        )
        print(f"{ratio:7.2f}x  {o:8.2f} -> {n:8.2f}  {name}  {mark}")
    missing = sorted(set(old) ^ set(new))
    if missing:
        print(f"# entries in only one record: {missing}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
