"""Storage-level probe for the two r11 corpus-scale persists
(VERDICT r11 item 2): naive_bayes_lang_eval's dwc postings frame and
bcubed_dedup_eval's (pred, truth) cells frame.

At n synthetic docs (default 1M, 4096-word vocab, 5 langs), runs each query
under four materialization strategies:
  committed — StorageLevel.MEMORY_AND_DISK (NOTE: PySpark's MEMORY_AND_DISK
              is SERIALIZED, unlike Scala's — the judged "deserialized
              cache" hazard does not exist on the Python API)
  deser     — MEMORY_AND_DISK_DESER (the Scala-default deserialized level)
  disk      — DISK_ONLY
  none      — persist() monkeypatched to a no-op (recompute per consumer)
and reports wall seconds plus the cached RDD's memory/disk bytes.

Each strategy runs in the SAME session with clearCache() between runs
(interleave order: committed, deser, disk, none, committed — the repeat
guards against JIT-warm drift).

Usage: python tools/persist_probe.py [n_docs] [query ...]
Never run while another Spark JVM is using the machine (BASELINE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth(spark, n: int, tmp: str, vocab_size: int = 4096):
    from pyspark.sql import functions as F

    langs = F.array(*[F.lit(x) for x in ("en", "de", "fr", "es", "pt")])
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(60)),
                lambda i: F.concat(
                    F.lit("w"),
                    (
                        (F.xxhash64(F.col("id") * 1000 + i) % vocab_size + vocab_size)
                        % vocab_size
                    ).cast("string"),
                ),
            ),
        ).alias("text"),
        F.element_at(langs, (F.col("id") % 5 + 1).cast("int")).alias("lang"),
        F.lit("src0").alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")


def cached_bytes(spark) -> tuple[int, int]:
    mem = disk = 0
    for info in spark.sparkContext._jsc.sc().getRDDStorageInfo():
        mem += info.memSize()
        disk += info.diskSize()
    return mem, disk


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    names = sys.argv[2:] or ["naive_bayes_lang_eval", "bcubed_dedup_eval"]

    import tempfile

    from pyspark import StorageLevel
    from pyspark.sql import DataFrame

    from __spark_entry__ import queries
    from hpmr_spark.engine import get_spark

    spark = get_spark("persist-probe")
    tmp = tempfile.mkdtemp(prefix="persist_probe_")
    synth(spark, n, tmp)
    print(f"corpus: {n} docs at {tmp}")
    qs = queries()

    committed = StorageLevel.MEMORY_AND_DISK
    cycle = [
        ("committed", committed, True),
        ("deser", StorageLevel.MEMORY_AND_DISK_DESER, True),
        ("disk", StorageLevel.DISK_ONLY, True),
        ("none", None, False),
    ]
    # two full cycles: cycle 1 pays codegen/JIT warmup, DECIDE ON CYCLE 2
    # (cached-bytes readings can carry async-unpersist leftovers from the
    # previous strategy — trust the committed run's bytes, walls always)
    strategies = [(f"{t}/c{c}", lv, dp) for c in (1, 2) for t, lv, dp in cycle]
    real_persist = DataFrame.persist
    for name in names:
        for tag, level, do_persist in strategies:
            spark.catalog.clearCache()
            if not do_persist:
                DataFrame.persist = lambda self, *a, **k: self  # type: ignore
                StorageLevel.MEMORY_AND_DISK = committed
            else:
                DataFrame.persist = real_persist
                StorageLevel.MEMORY_AND_DISK = level
            try:
                spark.sparkContext.setJobDescription(f"{name}:{tag}")
                t0 = time.time()
                qs[name](spark, tmp).write.format("noop").mode("overwrite").save()
                wall = time.time() - t0
                mem, disk = cached_bytes(spark)
                print(
                    f"{name} {tag}: wall {wall:.1f}s cached mem={mem/1e6:.0f}MB"
                    f" disk={disk/1e6:.0f}MB"
                )
            finally:
                DataFrame.persist = real_persist
                StorageLevel.MEMORY_AND_DISK = committed
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
