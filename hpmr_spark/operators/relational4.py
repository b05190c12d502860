"""Batch 4: multiset set operations, scalar subqueries, null-handling
surface — the remaining relational corners."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t


@register(
    "setops_multiset_except_all",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM (
      SELECT o_custkey FROM orders
      EXCEPT ALL
      SELECT c_custkey FROM customer)
    """,
)
def setops_multiset_except_all(spark, sf_dir):
    """EXCEPT ALL (bag semantics — duplicates preserved), vs the distinct
    set ops in `setops_union_intersect_except`."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return o.exceptAll(c).agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "scalar_subquery_above_avg",
    """
    SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
    ORDER BY totalprice_cents DESC, o_orderkey
    """,
)
def scalar_subquery_above_avg(spark, sf_dir):
    """Scalar-subquery filter: orders above 1.5× the mean price. The threshold
    compare uses the engines' identically-computed mean only as a filter
    bound (margin ≫ float noise); output values are integer cents."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_orders_ssq")
    return spark.sql(
        """
        SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents
        FROM _orders_ssq
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM _orders_ssq)
        ORDER BY totalprice_cents DESC, o_orderkey
        """
    )


@register(
    "null_handling_surface",
    """
    SELECT n_nationkey,
           coalesce(CAST(MIN(c_custkey) AS BIGINT), -1) AS first_cust,
           CAST(COUNT(c_custkey) AS BIGINT) AS n_matched,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CASE WHEN COUNT(c_custkey) = 0 THEN 'empty' ELSE 'has_customers' END AS status
    FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
)
def null_handling_surface(spark, sf_dir):
    """NULL semantics through outer join + aggregation: COUNT(col) vs
    COUNT(*), coalesce defaults, CASE on null-derived state."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    return (
        n.join(c, n.n_nationkey == c.c_nationkey, "left")
        .groupBy("n_nationkey")
        .agg(
            F.coalesce(F.min("c_custkey"), F.lit(-1)).alias("first_cust"),
            F.count("c_custkey").alias("n_matched"),
            F.count(F.lit(1)).alias("n_rows"),
            F.when(F.count("c_custkey") == 0, "empty")
            .otherwise("has_customers")
            .alias("status"),
        )
    )
