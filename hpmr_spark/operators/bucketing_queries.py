"""Oracle-checked bucketed-join query: result identical to the plain join,
physical plan has no exchange under the join (asserted in tests/test_plans)."""

from __future__ import annotations

from hpmr_spark.catalog import register
from hpmr_spark.operators.bucketing import bucketed_join_revenue


@register(
    "bucketed_join_revenue",
    """
    SELECT o_orderpriority,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def bucketed_join_revenue_q(spark, sf_dir):
    return bucketed_join_revenue(spark, sf_dir)
