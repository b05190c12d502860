"""SparkSession construction tuned for the engine.

The reference's performance envelope is compile-time constants (trunk size,
load factors — /root/reference/src/bare_hash_container.h:14-18); ours is Spark
conf. Every knob here is chosen for scale-out first, then works locally:

- AQE on: runtime coalescing of shuffle partitions + skew-join splitting is the
  analog of the reference's probe-length skew watchdog
  (/root/reference/src/bare_hash_container.h:135-148).
- Arrow on: all Pandas-UDF paths (dedup/similarity/multimodal) batch via Arrow.
- shuffle.partitions defaults to 2× cores locally; on a real cluster AQE
  coalesces from a deliberately-high initial number, so oversizing is safe.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def session_builder(
    app_name: str = "hpmr-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession.Builder:
    """Builder with engine defaults; caller may override before getOrCreate."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        # SPARK_GRAFT_MASTER exists for the partition-invariance sweep
        # (tools/selfcheck.py under local[4]/shuffle=7 — SURVEY §5's
        # n_procs=1/4 discipline, gtest_main_mpi.cc:47-61): results must be
        # bit-identical under ANY parallelism.
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", max(2 * cpus, 8))
        )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Let AQE choose the output partitioning of plans that materialize
        # a persisted frame (default false pins every .persist() at the raw
        # shuffle-partition count — the InMemoryRelation then feeds each
        # consumer 64 tiny partitions locally and AQE cannot coalesce below
        # it; observed as the 4x MAD-persist regression, OPTIMIZATION_r11.md).
        # Scale-adaptive by definition: AQE sizes by bytes. Results are
        # partition-count invariant repo-wide under THIS conf
        # (selfcheck_r14_invariance.json — the r12-named sweep predates the
        # conf). COUPLING: setting SPARK_GRAFT_CACHE_AQE=false re-creates
        # the documented 4x regression on every persisted multi-consumer
        # frame (MAD's histogram persist and the r11 postings persists were
        # sized assuming this conf is on).
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            os.environ.get("SPARK_GRAFT_CACHE_AQE", "true"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return b


def get_spark(app_name: str = "hpmr-spark", **kwargs) -> SparkSession:
    return session_builder(app_name, **kwargs).getOrCreate()
