"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check at sf0.001.
queries()     — every implemented operator from SURVEY.md §2 (+ extensions),
                (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-equivalent ANSI SQL per query (column names aligned).

Implementations live in hpmr_spark/; this file only re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-order revenue mapreduce over sf0.001 lineitem (the
    reference's dist_map_test.cc:71-88 kernel over real parquet)."""
    from hpmr_spark.catalog import QUERIES

    return QUERIES["mapreduce_revenue_by_order"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import hpmr_spark.all_queries  # noqa: F401 — populates the registry
    from hpmr_spark.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    import hpmr_spark.all_queries  # noqa: F401
    from hpmr_spark.catalog import ORACLES

    return dict(ORACLES)
