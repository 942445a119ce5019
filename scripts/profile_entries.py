"""Split per-entry cost into driver BUILD time vs executor RUN time.

Usage:
    python scripts/profile_entries.py <out_json> <entries_csv> [sf_dir]

For each entry (after the bench's own cache-prime pass, same warm-store
condition): time QUERIES[name](spark, sf_dir) construction alone, then
the first (cold) noop write, then the median of two further warm noop
writes.  Build time is single-threaded driver wall (py4j round trips +
Catalyst work queued from Python) — guide §7.3: at cluster scale it
holds the whole fleet idle, so it is a first-class optimization target
distinct from executor seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_json = sys.argv[1]
    entries = [e.strip() for e in sys.argv[2].split(",") if e.strip()]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from spanner_jdbc_converter_spark.plans import QUERIES
    from spanner_jdbc_converter_spark.plans.registry import prime_session_caches
    from spanner_jdbc_converter_spark.session import get_spark

    spark = get_spark(app_name="profile_entries")
    spark.sparkContext.setLogLevel("ERROR")
    prime_session_caches(spark, sf_dir)

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # untimed warmup of the codegen/scheduler path
    noop(QUERIES["flagship_revenue_by_nation"](spark, sf_dir))

    out: dict[str, dict] = {}
    for name in entries:
        if name not in QUERIES:
            print(f"unknown entry skipped: {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"profile: {name}")
        rec: dict[str, float] = {}
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        rec["build"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        noop(df)
        rec["cold"] = round(time.perf_counter() - t0, 3)
        warms = []
        for _ in range(2):
            # rebuild each run exactly like bench.py does
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            b = time.perf_counter() - t0
            t0 = time.perf_counter()
            noop(df)
            warms.append((round(b, 3), round(time.perf_counter() - t0, 3)))
        rec["warm_builds"] = [w[0] for w in warms]
        rec["warm_execs"] = [w[1] for w in warms]
        rec["total_warm"] = round(
            sorted(b + e for b, e in warms)[0], 3
        )
        out[name] = rec
        print(name, json.dumps(rec), flush=True)
    with open(out_json, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
