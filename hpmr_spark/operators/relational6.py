"""Batch 6: exact-integer correlation and boolean aggregates.

Correlation from raw integer moments — corr(x,y) =
(n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²)(n·Σy² − (Σy)²)) — every Σ is an exact
BIGINT, so the final double is one identical IEEE expression in both engines
(never corr() over doubles, whose partial-merge order varies)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t


@register(
    "corr_qty_discount_exact",
    """
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
             CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS sy,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
             CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                      * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS syy,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           ROUND((n * sxy - sx * sy) /
                 sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)), 6) AS corr_qd
    FROM m
    """,
)
def corr_qty_discount_exact(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_discount") * 100).cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    corr = (n * F.col("sxy") - sx * sy) / F.sqrt(
        (n * F.col("sxx") - sx * sx) * 1.0 * (n * F.col("syy") - sy * sy)
    )
    return m.select("l_returnflag", "n", F.round(corr, 6).alias("corr_qd"))


@register(
    "argmax_customer_per_nation",
    """
    SELECT n_name, c_custkey AS top_custkey, c_acctbal AS top_acctbal FROM (
      SELECT n_name, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
      FROM nation JOIN customer ON c_nationkey = n_nationkey)
    WHERE rn = 1
    """,
)
def argmax_customer_per_nation(spark, sf_dir):
    """argmax-per-group (TPC-H Q2 shape): richest customer per nation,
    deterministic tie-break on lowest custkey via struct ordering."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    order = F.struct(F.col("c_acctbal"), (-F.col("c_custkey")).alias("neg_key"))
    return (
        n.join(c, n.n_nationkey == c.c_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by("c_custkey", order).alias("top_custkey"),
            F.max("c_acctbal").alias("top_acctbal"),
        )
    )


@register(
    "exists_subquery_priority",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 49)
    GROUP BY o_orderpriority
    """,
)
def exists_subquery_priority(spark, sf_dir):
    """Correlated EXISTS (TPC-H Q4 shape) → left-semi join under the hood."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 49).select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        o.join(li, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q18_large_volume_orders",
    """
    SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
           CAST(total_qty AS BIGINT) AS total_qty
    FROM orders JOIN (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    ) big ON o_orderkey = big.l_orderkey
    """,
)
def q18_large_volume_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING-filtered agg subquery joined back to orders."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 150)
        .select(F.col("l_orderkey").alias("o_orderkey"), "total_qty")
    )
    return o.join(big, "o_orderkey").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("totalprice_cents"),
        F.col("total_qty").cast("long").alias("total_qty"),
    )


@register(
    "calendar_gap_fill",
    """
    WITH bounds AS (
      SELECT o_custkey, date_trunc('month', MIN(o_orderdate)) AS lo,
             date_trunc('month', MAX(o_orderdate)) AS hi
      FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 20),
    months AS (
      SELECT o_custkey, unnest(generate_series(lo, hi, INTERVAL '1 month')) AS month
      FROM bounds),
    actual AS (
      SELECT o_custkey, date_trunc('month', o_orderdate) AS month,
             COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey, month)
    SELECT m.o_custkey, m.month,
           CAST(coalesce(a.n_orders, 0) AS BIGINT) AS n_orders
    FROM months m LEFT JOIN actual a
      ON m.o_custkey = a.o_custkey AND m.month = a.month
    """,
)
def calendar_gap_fill(spark, sf_dir):
    """Time-series gap fill: dense month spine per active customer (sequence
    + explode), left-joined to actuals with zero fill — the densify
    operator every time-series pipeline needs."""
    o = _t(spark, sf_dir, "orders")
    bounds = (
        o.groupBy("o_custkey")
        .agg(
            F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
            F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .where(F.col("n") >= 20)
    )
    months = bounds.select(
        "o_custkey",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
        ).alias("month"),
    )
    actual = o.groupBy(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    return months.join(actual, ["o_custkey", "month"], "left").select(
        "o_custkey",
        "month",
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
    )


@register(
    "percent_rank_prices",
    """
    SELECT o_orderkey,
           ROUND(percent_rank() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS pr,
           ROUND(cume_dist() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS cd
    FROM orders WHERE o_orderkey % 20 = 0
    """,
)
def percent_rank_prices(spark, sf_dir):
    """percent_rank/cume_dist — rank ratios of exact ints, rounded the same
    on both sides. The ordering (o_totalprice, o_orderkey) is UNIQUE, so
    rank ≡ row_number and cume_dist ≡ rn/n: both come from the two-pass
    value-bucketed row_number (functions/ranking.py) + a broadcast total,
    with the same double divisions as the window built-ins —
    (rn−1)/(n−1) and rn/n — so values are bit-identical, and there is no
    single-partition window."""
    from hpmr_spark.functions.ranking import global_row_number

    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 20 == 0)
    o = o.select("o_orderkey", "o_totalprice")
    r = global_row_number(o, ["o_totalprice", "o_orderkey"], out="rn")
    t = o.agg(F.count(F.lit(1)).alias("n"))
    return r.crossJoin(F.broadcast(t)).select(
        "o_orderkey",
        F.round((F.col("rn") - 1) / (F.col("n") - 1), 6).alias("pr"),
        F.round(F.col("rn") / F.col("n"), 6).alias("cd"),
    )


@register(
    "bool_aggregates",
    """
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 500000) AS any_over_500k,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished
    FROM orders GROUP BY o_orderpriority
    """,
)
def bool_aggregates(spark, sf_dir):
    """every/any (bool_and/bool_or) + FILTER-style conditional count."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.some(F.col("o_totalprice") > 500000).alias("any_over_500k"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
    )
