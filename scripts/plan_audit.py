"""Capture .explain("formatted") for every registered corpus entry and
summarize plan shape: Exchange count, join strategies, Python-eval nodes,
scan pushdown.  Writes one plan file per entry plus a TSV summary.

Usage:
    python scripts/plan_audit.py <out_dir> [sf_dir] [only_csv]

Planning only (no timed actions) — query *construction* may still run
planning-scale jobs (vocab collects, codebook builds), same as the bench's
untimed prime pass.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(out_dir, exist_ok=True)

    from spanner_jdbc_converter_spark.plans import QUERIES
    from spanner_jdbc_converter_spark.plans.registry import prime_session_caches
    from spanner_jdbc_converter_spark.session import get_spark

    spark = get_spark(app_name="plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    prime_session_caches(spark, sf_dir)

    names = sorted(QUERIES) if only is None else sorted(n for n in QUERIES if n in only)
    summary = []
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - audit tool, record and move on
            plan = f"ERROR: {exc}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        counts = {
            # formatted plans print the node as "(N) Exchange" with the
            # partitioning on the following Arguments: line, so count
            # the node header (BroadcastExchange does not match — the
            # literal ") Exchange" requires the bare node name); the
            # one-line "== Physical Plan ==" tree echoes the node as
            # "+- Exchange hashpartitioning(...)" only in non-formatted
            # mode, which this audit does not use
            "exch": len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M)),
            "bcast": len(re.findall(r"BroadcastExchange", plan)),
            "smj": len(re.findall(r"SortMergeJoin", plan)),
            "shj": len(re.findall(r"ShuffledHashJoin", plan)),
            "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
            "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
            "cart": len(re.findall(r"CartesianProduct", plan)),
            "pyeval": len(re.findall(r"BatchEvalPython", plan)),
            "arrow": len(re.findall(r"ArrowEvalPython", plan)),
            "mapip": len(re.findall(r"MapInPandas|PythonMapInArrow|MapInArrow", plan)),
            "fmg": len(re.findall(r"FlatMapGroupsInPandas|FlatMapGroupsWithStateInPandas", plan)),
            "sort": len(re.findall(r"^\(\d+\) Sort\b|\) Sort \[", plan, re.M)),
            "scans": len(re.findall(r"Scan parquet", plan)),
            "rows": plan.count("\n"),
        }
        summary.append((name, counts))
        sys.stderr.write(f"done {name}\n")

    with open(os.path.join(out_dir, "_summary.tsv"), "w") as fh:
        cols = ["exch", "bcast", "smj", "shj", "bhj", "bnlj", "cart", "pyeval", "arrow", "mapip", "fmg", "sort", "scans", "rows"]
        fh.write("name\t" + "\t".join(cols) + "\n")
        for name, c in summary:
            fh.write(name + "\t" + "\t".join(str(c[k]) for k in cols) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
