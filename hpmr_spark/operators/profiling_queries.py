"""Data-profiling batch: exact multi-quantile grids and per-column
profiles — the first queries any engineer runs against a new 100 TB table,
expressed so they stay one-or-two-scan jobs.

Determinism: quantiles are k-th order statistics (k = ceil(q*n), tie-safe);
doubles are converted to exact integer cents before anything aggregates;
per-column values are profiled over canonical strings (BIGINT/date/string
renderings agree across engines — no raw double is ever stringified).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register

# ---------------------------------------------------------------------------
# Exact percentile grid (p10/p25/p50/p75/p90) per return flag.
# ---------------------------------------------------------------------------
@register(
    "percentile_grid_exact",
    """
    WITH c AS (
      SELECT l_returnflag AS flag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    r AS (
      SELECT flag, cents,
             ROW_NUMBER() OVER (PARTITION BY flag ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY flag) AS n
      FROM c
    )
    SELECT flag, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN rn = (n + 9) // 10 THEN cents END) AS BIGINT) AS p10_cents,
           CAST(MAX(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS BIGINT) AS p25_cents,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS BIGINT) AS p50_cents,
           CAST(MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END) AS BIGINT) AS p75_cents,
           CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN cents END) AS BIGINT) AS p90_cents
    FROM r GROUP BY flag
    """,
)
def percentile_grid_exact(spark, sf_dir):
    """Five exact percentiles per group in ONE window pass: rank every row
    once, then conditional-max the five rank-selected order statistics
    (k = ceil(q*n) — tie-safe, the k-th value is unique however duplicates
    order). This is the exact alternative to approx_percentile when the
    group count is modest; the sort is per-flag (3 partitions), and the
    whole grid collapses in a single partial-aggregated groupBy. No float
    touches an output."""
    li = _t(spark, sf_dir, "lineitem")
    c = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("flag").orderBy("cents")
    wn = Window.partitionBy("flag")
    r = c.select(
        "flag",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    sel = [
        ("p10_cents", "(n + 9) div 10"),
        ("p25_cents", "(n + 3) div 4"),
        ("p50_cents", "(n + 1) div 2"),
        ("p75_cents", "(3 * n + 3) div 4"),
        ("p90_cents", "(9 * n + 9) div 10"),
    ]
    return r.groupBy("flag").agg(
        F.max("n").cast("long").alias("n"),
        *[
            F.max(F.when(F.col("rn") == F.expr(k), F.col("cents")))
            .cast("long")
            .alias(name)
            for name, k in sel
        ],
    )


# ---------------------------------------------------------------------------
# Per-column profile of orders: nulls, exact distinct, lexicographic
# min/max over canonical string renderings.
# ---------------------------------------------------------------------------
_PROFILE_COLS = [
    ("o_orderkey", "CAST(o_orderkey AS VARCHAR)"),
    ("o_custkey", "CAST(o_custkey AS VARCHAR)"),
    ("o_orderstatus", "o_orderstatus"),
    ("o_totalprice_cents", "CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)"),
    ("o_orderdate", "CAST(CAST(o_orderdate AS DATE) AS VARCHAR)"),
    ("o_orderpriority", "o_orderpriority"),
]

_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""
    SELECT '{name}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({expr}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {expr}) AS BIGINT) AS n_distinct,
           MIN({expr}) AS min_str, MAX({expr}) AS max_str
    FROM orders
    """
    for name, expr in _PROFILE_COLS
)


@register("column_profile_orders", _PROFILE_SQL)
def column_profile_orders(spark, sf_dir):
    """Per-column table profile (row/null/exact-distinct counts, lexical
    min/max) over canonical string renderings — doubles go through exact
    cents, dates through ISO text, so both engines see identical strings.
    The Spark plan unpivots with stack() and computes every column's
    profile in ONE pass (single Expand + one groupBy on the 6-value column
    key) instead of the oracle's 6 scans — the shape that matters at
    100 TB, where each extra profiling pass costs a full table read."""
    o = _t(spark, sf_dir, "orders")
    canon = o.select(
        F.col("o_orderkey").cast("string").alias("o_orderkey"),
        F.col("o_custkey").cast("string").alias("o_custkey"),
        F.col("o_orderstatus").alias("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .cast("string")
        .alias("o_totalprice_cents"),
        F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
        F.col("o_orderpriority").alias("o_orderpriority"),
    )
    stack_expr = "stack({n}, {pairs}) AS (col_name, val)".format(
        n=len(_PROFILE_COLS),
        pairs=", ".join(f"'{name}', {name}" for name, _ in _PROFILE_COLS),
    )
    long = canon.select(F.expr(stack_expr))
    return long.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("val")).cast("long").alias("n_null"),
        F.countDistinct("val").cast("long").alias("n_distinct"),
        F.min("val").alias("min_str"),
        F.max("val").alias("max_str"),
    )
