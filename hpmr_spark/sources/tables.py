"""Table sources. The reference has no file I/O (its only source is Range +
programmatic inserts — SURVEY.md §2.3); the engine's sources are Spark's
native columnar readers, which give vectorized scans, predicate pushdown and
column pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to always broadcast in joins at any SF the
# engine targets (region: 5 rows, nation: 25 — fixed-size in TPC-H-style data).
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts has shipped as both parquet TIMESTAMP(NANOS) (round 1) and
    TIMESTAMP(MICROS) (round 2 regeneration) — adapt to whichever this
    sf_dir holds.

    NANOS: Spark's reader rejects it; read nanos as long (legacy conf,
    runtime-settable) and truncate to a micros timestamp with exact integer
    division — `ts div 1000`, never float division: epoch-nanos ≈ 1.7e18
    exceeds double's 2^53 mantissa, so `/1000` would corrupt microseconds.
    DuckDB truncates nanos→micros the same way.

    MICROS: Spark 4 infers TIMESTAMP_NTZ from these files; cast to the
    session-zone TIMESTAMP the queries were written against (identity —
    the engine pins spark.sql.session.timeZone=UTC)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The NTZ→TIMESTAMP cast (and every to_date/date_trunc downstream) is
    # only oracle-correct under a UTC session zone. The engine's own
    # sessions pin it, but the DRIVER's session may not — pin it here so
    # every events query is timezone-independent of the host environment.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view so spark.sql(...) works against the
    same names the DuckDB oracle uses."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
