"""Oracle-checked skew-path queries: the salted operators must produce
results identical to their unsalted equivalents — the oracle is the plain
SQL, proving salting is a pure physical rewrite."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t
from hpmr_spark.operators.skew import salted_join, salted_sum, skew_diagnostics


@register(
    "skew_salted_sum_by_status",
    """
    SELECT o_orderstatus,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders GROUP BY o_orderstatus
    """,
)
def skew_salted_sum_by_status(spark, sf_dir):
    """o_orderstatus has ~3 distinct values over all rows — exactly the hot-key
    regime. Salted two-phase sum must equal the plain group-by."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return salted_sum(o, "o_orderstatus", cents, n_salts=16, out_col="total_cents")


@register(
    "skew_salted_join_revenue",
    """
    SELECT o_orderpriority,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def skew_salted_join_revenue(spark, sf_dir):
    """Salted shuffle join lineitem⋈orders then agg — identical result to the
    plain join (salting is physical only)."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(li, o, "o_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
        ).alias("revenue_cents")
    )


@register(
    "skew_diagnostics_orders",
    """
    WITH tot AS (SELECT COUNT(*) AS n FROM orders)
    SELECT o_custkey, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_rows * 1000000 // n AS BIGINT) AS share_ppm
    FROM (SELECT o_custkey, COUNT(*) AS n_rows FROM orders GROUP BY o_custkey), tot
    ORDER BY n_rows DESC, o_custkey LIMIT 10
    """,
)
def skew_diagnostics_orders(spark, sf_dir):
    """Hot-key diagnostics (ref check_balance analog): top-10 keys + row share."""
    return skew_diagnostics(_t(spark, sf_dir, "orders"), "o_custkey", top=10)
