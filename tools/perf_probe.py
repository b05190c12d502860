"""Per-query perf probe for optimization rounds (guide §1: measure first).

Usage:
    python tools/perf_probe.py [--reps N] [--plans DIR] [--tag TAG] q1 q2 ...
    python tools/perf_probe.py --bench          # probe the bench headline set
    python tools/perf_probe.py --extras         # probe the bench extra set

For each query: builds the DataFrame and times build + noop-sink write
(identical methodology to bench.py), repeated --reps times in ONE session —
rep 0 is the cold (first-parse/codegen) wall, later reps are warm. Optionally
writes `.explain("formatted")` to <plans-dir>/<query>_<tag>.txt (captured once,
after the timed runs, so explain cost never pollutes a timing).

Emits one JSON line per query: {"query", "walls": [cold, warm...], "loadavg"}.
Never run while another Spark JVM is using the machine (BASELINE.md protocol).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans", default=None, help="directory for formatted plans")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--extras", action="store_true")
    args = ap.parse_args()

    names = list(args.queries)
    if args.bench or args.extras:
        import bench

        if args.bench:
            names += bench.BENCH_QUERIES
        if args.extras:
            names += bench.BENCH_EXTRA

    from __spark_entry__ import queries

    from hpmr_spark.engine import get_spark
    from hpmr_spark.plans.explain import formatted_plan

    spark = get_spark("hpmr-perf-probe")
    qs = queries()
    # same warmup as bench.py: one lineitem scan to absorb JVM startup
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    for name in names:
        walls = []
        builds = []
        for _ in range(max(1, args.reps)):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            walls.append(round(time.time() - t0, 3))
            builds.append(round(t1 - t0, 3))
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            try:
                plan = formatted_plan(qs[name](spark, SF_DIR))
                with open(os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w") as fh:
                    fh.write(plan)
            except Exception as exc:  # plan capture must never kill the probe
                print(f"plan capture failed for {name}: {exc}", file=sys.stderr)
        print(
            json.dumps(
                {
                    "query": name,
                    "walls": walls,
                    "builds": builds,
                    "loadavg": round(os.getloadavg()[0], 2),
                }
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
