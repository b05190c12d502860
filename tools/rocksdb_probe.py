"""RocksDB state-store provider A/B on the memory-sink streaming family
(VERDICT r11 item 5). One session; arms interleave default-provider vs
RocksDBStateStoreProvider per rep (the provider is applied through
`_run_to_table`'s STREAM_STATESTORE_PROVIDER knob, monkeypatched per arm —
each AvailableNow run uses a fresh checkpoint, so flipping providers
between runs is safe; checkpoint-coupled queries never read the knob).

Usage: python tools/rocksdb_probe.py [query ...]
Never run while another Spark JVM is using the machine (BASELINE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROCKS = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
DEFAULT_QUERIES = [
    "streaming_tumbling_counts",
    "streaming_sliding_activity",
    "streaming_session_windows",
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES

    from __spark_entry__ import queries

    import hpmr_spark.streaming.windows as W
    from hpmr_spark.engine import get_spark

    spark = get_spark("rocksdb-probe")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    qs = queries()

    for name in names:
        walls: dict[str, list[float]] = {"hdfs": [], "rocksdb": []}
        for rep in range(3):
            for tag, provider in (("hdfs", ""), ("rocksdb", ROCKS)):
                W.STREAM_STATESTORE_PROVIDER = provider
                try:
                    spark.sparkContext.setJobDescription(f"{name}:{tag}:{rep}")
                    t0 = time.time()
                    qs[name](spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    walls[tag].append(round(time.time() - t0, 2))
                except Exception as e:  # noqa: BLE001
                    walls[tag].append(None)
                    print(f"-- {name} {tag} ERROR {str(e)[:120]}", file=sys.stderr)
                finally:
                    W.STREAM_STATESTORE_PROVIDER = ""
        print(
            f"{name}: hdfs={walls['hdfs']} rocksdb={walls['rocksdb']}"
            f" loadavg={os.getloadavg()[0]:.2f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
