"""Benchmark harness: runs the headline query corpus at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line the driver records as BENCH_r{N}.json.

Each query is forced end-to-end with a noop-format write (computes every
output column/row, no driver collect bottleneck, no disk write)."""

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

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        start = time.perf_counter()
        ok, reason = _run_with_timeout(
            spark, lambda name=name: _force(QUERIES[name](spark, sf_dir)), QUERY_TIMEOUT_S
        )
        if ok:
            timings[name] = round(time.perf_counter() - start, 4)
        else:  # record the failure, keep benching
            timings[name] = -1.0
            print(f"bench: {name} failed: {reason}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "corpus_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
