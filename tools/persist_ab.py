"""Interleaved persist-vs-no-persist A/B for registered queries
(VERDICT r11 item 7: the r2 "persist multi-consumer frames" rule was tuned
under canChangeCachedPlanOutputPartitioning=false; re-probe the big
persisted frames under the new conf).

For each query: one session, strategies alternate
persist → none → persist → none → persist → none (clearCache between), so
JIT warm-up and contention episodes hit both arms. "none" monkeypatches
DataFrame.persist to a no-op (each consumer recomputes the frame).

Usage: python tools/persist_ab.py <query> [query ...]
Never run while another Spark JVM is using the machine (BASELINE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: persist_ab.py <query> ...")
        return 2

    from pyspark.sql import DataFrame

    from __spark_entry__ import queries
    from hpmr_spark.engine import get_spark

    spark = get_spark("persist-ab")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()  # bench warmup
    qs = queries()
    real_persist = DataFrame.persist

    for name in names:
        walls: dict[str, list[float]] = {"persist": [], "none": []}
        for rep in range(3):
            for tag in ("persist", "none"):
                spark.catalog.clearCache()
                DataFrame.persist = (
                    real_persist if tag == "persist" else (lambda self, *a, **k: self)
                )
                try:
                    spark.sparkContext.setJobDescription(f"{name}:{tag}:{rep}")
                    t0 = time.time()
                    qs[name](spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    walls[tag].append(round(time.time() - t0, 2))
                finally:
                    DataFrame.persist = real_persist
        print(
            f"{name}: persist={walls['persist']} none={walls['none']}"
            f" loadavg={os.getloadavg()[0]:.2f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
