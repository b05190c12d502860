"""Data-profiling, second batch (round 6, wave 6).

functional_dependency_audit: approximate-FD discovery over a committed
candidate list on lineitem — for each candidate A → B, the number of
LHS values, the number of violating LHS values (those with > 1
distinct B), the worst fan-out, and the violation rate in ppm. All
four candidates are STACKED into one (fd, a, b) frame first (the
encoding-advisor pattern — CLAUDE.md round-6: stacking k columns turns
k NDV aggs into ONE), so the fact is scanned once and there is a
single (fd, a) shuffle regardless of how many FDs are audited.
Doubles never become keys: l_quantity/l_discount are cast through
their exact integer forms before stringification (double→string
formatting is not engine-portable; CAST(BIGINT AS STRING) is).

Scale notes (100 TB): one fact pass, one (fd, a) exchange, output is
4 rows. Adding FD candidates costs zero additional passes.

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's analytics axis.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register

# (name, lhs expr, rhs expr) — exprs yield engine-portable strings.
_FDS = [
    ("l_orderkey->l_returnflag", "CAST(l_orderkey AS STRING)", "l_returnflag"),
    ("l_partkey->l_suppkey", "CAST(l_partkey AS STRING)", "CAST(l_suppkey AS STRING)"),
    ("l_suppkey->l_partkey", "CAST(l_suppkey AS STRING)", "CAST(l_partkey AS STRING)"),
    (
        "l_quantity->l_discount",
        "CAST(CAST(l_quantity AS BIGINT) AS STRING)",
        "CAST(CAST(ROUND(l_discount * 100) AS BIGINT) AS STRING)",
    ),
]

_FD_STACK_SPARK = ", ".join(
    f"named_struct('fd', '{n}', 'a', {a}, 'b', {b})" for n, a, b in _FDS
)
_FD_STACK_DUCK = "\n      UNION ALL\n".join(
    f"SELECT '{n}' AS fd, {a.replace('AS STRING', 'AS VARCHAR')} AS a,"
    f" {b.replace('AS STRING', 'AS VARCHAR')} AS b FROM lineitem"
    for n, a, b in _FDS
)

_FD_ORACLE = f"""
    WITH stacked AS (
      {_FD_STACK_DUCK}
    ),
    lhs AS (
      SELECT fd, a, CAST(COUNT(DISTINCT b) AS BIGINT) AS ndv
      FROM stacked GROUP BY fd, a
    )
    SELECT fd,
           CAST(COUNT(*) AS BIGINT) AS n_lhs,
           CAST(SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           CAST(MAX(ndv) AS BIGINT) AS max_fanout,
           CAST(CAST(SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT)
                * 1000000 // CAST(COUNT(*) AS BIGINT) AS BIGINT)
             AS violation_ppm
    FROM lhs GROUP BY fd
"""


@register("functional_dependency_audit", _FD_ORACLE)
def functional_dependency_audit(spark, sf_dir):
    """Approximate-FD audit over lineitem — see module docstring.
    Output: 4 rows (fd, n_lhs, n_violating, max_fanout, violation_ppm)."""
    li = _t(spark, sf_dir, "lineitem")
    stacked = li.select(
        F.explode(F.expr(f"array({_FD_STACK_SPARK})")).alias("s")
    ).select("s.fd", "s.a", "s.b")
    lhs = stacked.groupBy("fd", "a").agg(
        F.countDistinct("b").cast("long").alias("ndv")
    )
    return lhs.groupBy("fd").agg(
        F.count(F.lit(1)).cast("long").alias("n_lhs"),
        F.sum(F.when(F.col("ndv") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_violating"),
        F.max("ndv").cast("long").alias("max_fanout"),
        F.expr(
            "CAST(SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) * 1000000"
            " div COUNT(*) AS BIGINT)"
        ).alias("violation_ppm"),
    )
