"""Benchmark harness: runs the headline query corpus at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line the driver records as BENCH_r{N}.json.

Each query is forced end-to-end with a noop-format write (computes every
output column/row, no driver collect bottleneck, no disk write).

Each query runs $SPARK_GRAFT_BENCH_RUNS times (default 3): the first
(cold) run is recorded separately under "cold_queries"; "queries" holds
the median of the remaining warm runs.  Single cold runs proved to be
half noise round-over-round (VERDICT r3: 7 queries swung >2× with zero
code change) — medians of warm runs are what regressions are judged on."""

from __future__ import annotations

import json
import os
import sys
import threading
import time

from spanner_jdbc_converter_spark.plans import QUERIES
from spanner_jdbc_converter_spark.session import get_spark

#: Per-query wall budget — a single regressed/hung query records -1
#: instead of taking down the whole bench run.
QUERY_TIMEOUT_S = float(os.environ.get("SPARK_GRAFT_BENCH_TIMEOUT", "120"))

#: Runs per query: 1 cold + (N-1) warm; "queries" reports the warm median.
BENCH_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    n = len(xs)
    mid = n // 2
    return xs[mid] if n % 2 else (xs[mid - 1] + xs[mid]) / 2.0


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _run_with_timeout(spark, fn, timeout_s: float) -> tuple[bool, str | None]:
    """Run fn() on a worker thread; cancel all Spark jobs on timeout."""
    err: list[str] = []
    done = threading.Event()

    def work():
        try:
            fn()
        except Exception as exc:  # noqa: BLE001 - recorded, not raised
            err.append(str(exc))
        finally:
            done.set()

    t = threading.Thread(target=work, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        spark.sparkContext.cancelAllJobs()
        done.wait(30)
        return False, f"timeout > {timeout_s}s (jobs cancelled)"
    return (not err), (err[0] if err else None)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen path once so per-query numbers measure the
    # engine, not first-run classloading.
    try:
        _force(QUERIES["flagship_revenue_by_nation"](spark, sf_dir))
    except Exception as exc:
        print(f"bench: warmup failed (bad SF dir?): {exc}", file=sys.stderr)

    # Machine-load calibration probe: a FIXED synthetic plan (no fixture
    # IO, pure codegen agg over a range) timed like any query.  Its cost
    # is invariant to corpus/code changes, so round-over-round drift in
    # "calibration_seconds" measures the MACHINE/session, not the engine
    # — VERDICT r6 #1's corpus-wide 1.3× swing is exactly the signal this
    # normalizes.
    #
    # r16 hardening (VERDICT r15 "Next round #1"): a single up-front
    # warm-median probe proved useless in r15 — it swung 0.31–1.12 s
    # across the day while raw entry medians sat at parity, so the
    # normalized flag net caught nothing all round.  The probe is now
    # the MEDIAN OF K≥5 SAMPLES INTERLEAVED THROUGH THE TIMED LOOP
    # (same fixed plan as r06–r15, so the unit stays cross-round
    # comparable): one sample before the loop, one after, the rest
    # spaced evenly between timed entries — the probe samples the same
    # machine-load trajectory the entries actually experienced.  The
    # raw sample list ships in the payload ("calibration_probes") so
    # NOTES adjudication can see the spread, not just the median.
    def _probe_once() -> float:
        start = time.perf_counter()
        _force(
            spark.range(0, 20_000_000, 1, 32)
            .selectExpr("id % 97 AS k", "id * 2654435761 % 1000003 AS v")
            .groupBy("k")
            .agg({"v": "sum", "*": "count"})
        )
        return time.perf_counter() - start

    _probe_once()  # untimed warmup: pay the probe's codegen once
    CAL_SAMPLES = max(5, int(os.environ.get("SPARK_GRAFT_BENCH_PROBES", "7")))
    probe_samples: list[float] = [_probe_once()]

    # Session-cache warm-up pre-pass (VERDICT r14 "Next round #1"): build
    # every (appId, sf_dir)-keyed shared store (plans/registry.py
    # CACHE_PRIMERS — _curated, PQ/residual codebooks, span/winnow/group
    # frames, BPE/unigram vocab frames, signature state) BEFORE the timed
    # loop, so no timed entry ever pays another entry's cache build and the
    # record is registry-position-independent.  Also runs for
    # SPARK_GRAFT_BENCH_ONLY subset runs so ×5 isolation measures the same
    # warm-store condition as the record run.
    from spanner_jdbc_converter_spark.plans.registry import prime_session_caches

    prime_start = time.perf_counter()
    try:
        primed = prime_session_caches(spark, sf_dir)
    except Exception as exc:
        primed = {}
        print(f"bench: cache prime failed (continuing unprimed): {exc}", file=sys.stderr)
    prime_seconds = round(time.perf_counter() - prime_start, 3)
    print(
        f"bench: primed {len(primed)} session caches in {prime_seconds}s",
        file=sys.stderr,
    )

    # Optional subset filter for local experiments (comma-separated entry
    # names) — full-corpus runs remain the round record.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        wanted = {n.strip() for n in only.split(",") if n.strip()}
        unknown = wanted - set(QUERIES)
        if unknown:
            print(f"bench: unknown SPARK_GRAFT_BENCH_ONLY entries ignored: {sorted(unknown)}", file=sys.stderr)
        selected = [n for n in sorted(QUERIES) if n in wanted]
        if not selected:
            print("bench: SPARK_GRAFT_BENCH_ONLY matched nothing — exiting", file=sys.stderr)
            spark.stop()
            sys.exit(2)
    else:
        selected = sorted(QUERIES)

    # Interleave the remaining CAL_SAMPLES-2 mid-loop probes evenly
    # between entries (the first sample ran above, the last runs after
    # the loop).
    mid_probes = max(0, CAL_SAMPLES - 2)
    probe_stride = max(1, len(selected) // (mid_probes + 1)) if mid_probes else 0

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for pos, name in enumerate(selected, start=1):
        if (
            mid_probes
            and pos % probe_stride == 0
            and len(probe_samples) < CAL_SAMPLES - 1
        ):
            probe_samples.append(_probe_once())
        runs: list[float] = []
        failed = None
        for i in range(BENCH_RUNS):
            start = time.perf_counter()
            ok, reason = _run_with_timeout(
                spark, lambda name=name: _force(QUERIES[name](spark, sf_dir)), QUERY_TIMEOUT_S
            )
            if not ok:
                failed = reason
                break
            runs.append(time.perf_counter() - start)
        if failed is not None:  # record the failure, keep benching
            timings[name] = -1.0
            cold[name] = -1.0
            print(f"bench: {name} failed: {failed}", file=sys.stderr)
            continue
        cold[name] = round(runs[0], 3)
        # median of warm runs; with BENCH_RUNS=1 fall back to the cold run
        timings[name] = round(_median(runs[1:]) if len(runs) > 1 else runs[0], 3)

    probe_samples.append(_probe_once())
    calibration = round(_median(probe_samples), 4)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # Key order is deliberate: scalars first, then warm medians, then the
    # cold runs — recorded BENCH lines have truncated in past rounds, and
    # this order loses the least-important data first.
    payload = {
        "metric": "corpus_wall_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "runs_per_query": BENCH_RUNS,
        "calibration_seconds": calibration,
        "calibration_probes": [round(p, 4) for p in probe_samples],
        "cache_prime_seconds": prime_seconds,
        # Per-primer build seconds (VERDICT r17 "Next round #8"): the
        # untimed prime pass is ~0.75× the timed wall — its growth must
        # be auditable per store, not one opaque total.
        "cache_primer_seconds": primed,
        "queries": timings,
        "cold_queries": cold,
    }
    if calibration > 0:
        # Machine-load-normalized warm medians (seconds / calibration
        # probe) — the unit regressions are adjudicated in, so history
        # files carry it precomputed (VERDICT r8 "Next round #4").
        # scripts/bench_compare.py diffs two history files on this.
        # Guarded BEFORE building the dict: calibration == 0.0 must omit
        # the key (routing bench_compare to its explicit "no calibration
        # probe" SystemExit), not die on ZeroDivisionError mid-payload
        # (ADVICE r10 low).
        payload["queries_normalized"] = {
            k: (round(v / calibration, 3) if v >= 0 else -1.0)
            for k, v in timings.items()
        }
    # The driver's recorded line truncates on long corpora; ALSO write the
    # full timing dict to a committed history file so every entry stays
    # comparable round-over-round (VERDICT r4 #7).  Overridable so local
    # experiments don't clobber the round record.  Files are written
    # BEFORE the stdout line: a consumer that closes the pipe early
    # (`bench.py | head`) must not SIGPIPE-kill the history write.
    hist = os.environ.get("SPARK_GRAFT_BENCH_HISTORY", "bench_history/latest.json")
    # latest.json is UNTRACKED scratch (gitignored since r15 — VERDICT
    # r11/r12/r13/r14 all flagged the driver's post-round run dirtying the
    # tree; the committed round record is ONLY the per-round file below).
    # It is overwritten each run; ALSO write a per-round file
    # (bench_history/r{N}.json) so warm medians stay diffable across
    # rounds (VERDICT r5 #6 — r4's full medians were lost to the
    # overwrite).  The per-round file is written ONLY under an explicit
    # $SPARK_GRAFT_BENCH_ROUND — inferring N from the driver's recorded
    # BENCH_r*.json files proved unfixable (ADVICE r6 + r7 review: a
    # post-record re-run poisons the NEXT round's file), so the round
    # record is always a deliberate act.
    # Subset runs (SPARK_GRAFT_BENCH_ONLY) are experiments: writing their
    # partial timings to the round history would poison the record — so
    # they write no history at all unless an explicit history path is
    # given.
    if only:
        targets = [hist] if "SPARK_GRAFT_BENCH_HISTORY" in os.environ else []
    else:
        targets = [hist]
    round_env = os.environ.get("SPARK_GRAFT_BENCH_ROUND")
    if round_env is not None and not only:
        try:
            this_round = int(round_env)
            targets.append(
                os.path.join(os.path.dirname(hist) or ".", f"r{this_round:02d}.json")
            )
        except ValueError:
            print(
                f"bench: ignoring malformed SPARK_GRAFT_BENCH_ROUND={round_env!r}"
                " — per-round history not written",
                file=sys.stderr,
            )
    for path in targets:
        try:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            with open(path, "w") as fh:
                json.dump(payload, fh, indent=1, sort_keys=True)
        except OSError as exc:
            print(f"bench: could not write history file {path}: {exc}", file=sys.stderr)
    # The stdout line is what the driver records as BENCH_r{N}.json, and
    # long lines have truncated there (r16's record was unparseable, which
    # cost r17 its native per-query PERF table — VERDICT r17 "Next round
    # #2").  Ship only the scalars + the warm medians on stdout; the cold
    # runs, normalized medians, and per-primer seconds stay in the history
    # files written above (bench_history/latest.json + the round record).
    stdout_payload = {
        k: v
        for k, v in payload.items()
        if k not in ("cold_queries", "queries_normalized", "cache_primer_seconds")
    }
    print(json.dumps(stdout_payload))
    spark.stop()


if __name__ == "__main__":
    main()
