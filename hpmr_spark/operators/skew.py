"""Skew mitigation + diagnostics — the engine analog of the reference's
probe-length watchdog (/root/reference/src/bare_hash_container.h:18,135-148:
warn at >64 probes, throw/grow when "severely unbalanced").

Spark-side the first line of defense is AQE (skewJoin.enabled, set in
engine.py); these utilities cover what AQE can't: pre-aggregation salting for
pathological hot keys and a diagnostics scan for partition planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_diagnostics(df: DataFrame, key_col: str, top: int = 10) -> DataFrame:
    """Hot-key report: top keys by frequency plus their share of all rows.
    The decision input for salting / AQE tuning (ref check_balance's warn).

    One scan of the input: the global total is a broadcast 1-row partial+
    final aggregate of the already-aggregated (key, n_rows) frame (the
    per-key frame is FACT-scale at 100 TB — a window total over it would
    single-partition it), and the top-k itself is TakeOrderedAndProject
    (per-partition partial top-k). share_ppm uses integer floor division
    (operands positive, so Spark `div` ≡ DuckDB `//`) per the repo's
    no-float-decisions rule."""
    agg = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_rows"))
    t = agg.agg(F.sum("n_rows").alias("_total"))
    return (
        agg.orderBy(F.desc("n_rows"), F.asc(key_col))
        .limit(top)
        .crossJoin(F.broadcast(t))
        .withColumn("share_ppm", F.expr("n_rows * 1000000 div _total").cast("long"))
        .drop("_total")
    )


def salted_sum(
    df: DataFrame, key_col: str, value_col, n_salts: int = 16, out_col: str = "value"
) -> DataFrame:
    """Two-phase salted sum for hot-key aggregation: phase 1 aggregates
    (key, salt) — spreading a hot key over n_salts reducers — phase 2 merges
    per key. Map-side combine already bounds agg skew in Spark, so this is
    for extreme hot keys where even one reducer per key is too much."""
    salt = F.pmod(F.spark_partition_id(), F.lit(n_salts)).alias("_salt")
    phase1 = (
        df.select(F.col(key_col), F.expr(value_col).alias("_v") if isinstance(value_col, str) else value_col.alias("_v"), salt)
        .groupBy(key_col, "_salt")
        .agg(F.sum("_v").alias("_partial"))
    )
    return phase1.groupBy(key_col).agg(F.sum("_partial").alias(out_col))


def salted_join(
    left: DataFrame, right: DataFrame, key_col: str, n_salts: int = 8
) -> DataFrame:
    """Skew-safe shuffle join: left rows get a deterministic-per-row salt,
    the (smaller) right side is replicated n_salts× — a hot join key spreads
    over n_salts reducers. Result is identical to a plain inner join on
    key_col. Prefer AQE's runtime skew split; use this when skew is known a
    priori (e.g. the null/default-key pile-up) or AQE is unavailable."""
    left_salted = left.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    right_rep = right.select("*", salts)
    return left_salted.join(right_rep, on=[key_col, "_salt"], how="inner").drop("_salt")
