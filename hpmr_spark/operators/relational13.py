"""Relational batch 13: exact-moment linear regression, cume_dist /
nth_value window surface, SCD Type-2 history build, and LOCF gap fill.

Reference parity: keyed-aggregation + ordered-window workloads — the
reference's sync() combine loop (/root/reference/src/dist_map.h:147-210)
plus per-key ordered state, re-expressed as Catalyst window plans.

Determinism: regression moments follow the exact-integer-moments rule
(BIGINT sums per group, one final double expression — corr_qty_discount
pattern); window orderings carry a full tie-break (event_id / p_partkey);
interval edges are epoch-micros BIGINTs, never floats.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t


# ---------------------------------------------------------------------------
# Exact-moment linear regression (regr_slope / regr_intercept parity).
# ---------------------------------------------------------------------------
@register(
    "regression_moments_qty_price",
    """
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sy_cents,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
               AS BIGINT) AS sxx,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(ROUND(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n, sx, sy_cents, sxx, sxy,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy_cents AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope_cents
    FROM m
    """,
)
def regression_moments_qty_price(spark, sf_dir):
    """regr_slope parity without float accumulation: the five sufficient
    moments (n, Σx, Σy, Σx², Σxy) are exact BIGINT sums — associative, so
    map-side partial aggregation and any partition count give the same
    bits — and the slope is ONE final double expression over those exact
    integers (identical IEEE ops on both engines; no parallel float sum
    ever happens). y is price in integer cents per row, the money rule.
    At 100 TB this is the canonical two-level reduce: 4 numbers per group
    cross the wire, not the rows."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy_cents"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    slope = F.expr(
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy_cents AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    return m.select(
        "l_returnflag", "n", "sx", "sy_cents", "sxx", "sxy",
        slope.alias("slope_cents"),
    )


# ---------------------------------------------------------------------------
# cume_dist + nth_value window surface.
# ---------------------------------------------------------------------------
@register(
    "window_cume_dist_nth",
    """
    SELECT p_partkey, p_brand,
           CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
           cume_dist() OVER w AS cd,
           nth_value(CAST(ROUND(p_retailprice * 100) AS BIGINT), 2) OVER w
             AS second_lowest_cents
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    """,
)
def window_cume_dist_nth(spark, sf_dir):
    """cume_dist + nth_value over a fully tie-broken ordering (price then
    partkey — partkey is unique, so frames are deterministic). cume_dist is
    an exact ratio of two integers — the same double division on both
    engines; nth_value uses the default running frame, so rows before the
    2nd are NULL on both engines. One shuffle on p_brand."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    return p.select(
        "p_partkey",
        "p_brand",
        cents.alias("price_cents"),
        F.cume_dist().over(w).alias("cd"),
        F.nth_value(cents, 2).over(w).alias("second_lowest_cents"),
    )


# ---------------------------------------------------------------------------
# SCD Type-2 history: collapse consecutive states into validity intervals.
# ---------------------------------------------------------------------------
@register(
    "scd2_user_event_history",
    """
    WITH o AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id)
               AS prev_type
      FROM events
    ),
    v AS (
      SELECT event_id, user_id, event_type, ts_us,
             SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS UNBOUNDED PRECEDING) AS version
      FROM o
    ),
    iv AS (
      SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
             CAST(MIN(ts_us) AS BIGINT) AS valid_from_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM v GROUP BY user_id, version, event_type
    )
    SELECT user_id, version, event_type, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
             AS valid_to_us,
           n_events,
           lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
             IS NULL AS is_current
    FROM iv
    """,
)
def scd2_user_event_history(spark, sf_dir):
    """Slowly-changing-dimension Type 2 build: per user, consecutive events
    with the same event_type collapse into one version row with
    [valid_from_us, valid_to_us) intervals; the open row is is_current.
    Gaps-and-islands via lag + running sum on a fully tie-broken ordering
    (ts, event_id), then one groupBy(user_id, version) and a lead() to
    close each interval — two window passes and one shuffle, all keyed on
    user_id so a 100 TB event log partitions cleanly."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    chg = (
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type"))
    ).cast("long")
    versions = ev.withColumn(
        "version",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    iv = versions.groupBy("user_id", "version", "event_type").agg(
        F.min("ts_us").alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("version")
    return iv.select(
        "user_id",
        "version",
        "event_type",
        "valid_from_us",
        F.lead("valid_from_us").over(w2).alias("valid_to_us"),
        "n_events",
        F.lead("valid_from_us").over(w2).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# LOCF gap fill: carry the last valid observation forward per key.
# ---------------------------------------------------------------------------
@register(
    "locf_gap_fill_values",
    """
    SELECT event_id, user_id,
           event_type = 'error' AS is_gap,
           last_value(CASE WHEN event_type <> 'error'
                           THEN CAST(ROUND(value * 100) AS BIGINT) END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_cents
    FROM events
    """,
)
def locf_gap_fill_values(spark, sf_dir):
    """Last-observation-carried-forward: error readings are gaps; each row
    gets the most recent valid value (integer cents) of the same user at or
    before it — NULL until the first valid one, matching both engines'
    IGNORE NULLS running frame. One window pass, keyed on user_id, fully
    tie-broken ordering (ts, event_id). The time-series repair primitive:
    at 100 TB each key's history sorts within its partition, nothing else
    moves."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    valid = F.when(
        F.col("event_type") != "error",
        F.round(F.col("value") * 100).cast("long"),
    )
    return ev.select(
        "event_id",
        "user_id",
        (F.col("event_type") == "error").alias("is_gap"),
        F.last(valid, ignorenulls=True).over(w).alias("filled_cents"),
    )


# ---------------------------------------------------------------------------
# Pivot with multiple aggregates per cell.
# ---------------------------------------------------------------------------
@register(
    "pivot_multi_agg_status",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS f_n,
           CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT) AS f_cents,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT)
             AS o_n,
           CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 FILTER (WHERE o_orderstatus = 'O'), 0) AS BIGINT) AS o_cents,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT)
             AS p_n,
           CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 FILTER (WHERE o_orderstatus = 'P'), 0) AS BIGINT) AS p_cents
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_multi_agg_status(spark, sf_dir):
    """Pivot with TWO measures per pivoted column (count + integer-cents
    sum per order status) — the crosstab-with-measures report shape. Spark
    pivot names cells {value}_{aggAlias}; both aggregates stay one
    partial-aggregated shuffle on the group key with the pivot values as
    conditional aggregates (equivalent to the oracle's FILTER clauses —
    no extra pass per measure). Missing cells coalesce to 0 on both
    engines."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(cents), F.lit(0)).alias("cents"),
        )
    )
    return piv.select(
        "o_orderpriority",
        F.col("F_n").alias("f_n"),
        F.col("F_cents").alias("f_cents"),
        F.col("O_n").alias("o_n"),
        F.col("O_cents").alias("o_cents"),
        F.col("P_n").alias("p_n"),
        F.col("P_cents").alias("p_cents"),
    )


# ---------------------------------------------------------------------------
# grouping_id over a CUBE: which aggregation level produced each row.
# ---------------------------------------------------------------------------
@register(
    "cube_grouping_id_revenue",
    """
    SELECT CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
             AS BIGINT) AS gid,
           o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def cube_grouping_id_revenue(spark, sf_dir):
    """CUBE with grouping_id: every aggregation level (detail, each
    one-dimension rollup, grand total) tagged by which columns were
    aggregated away — how BI layers distinguish subtotal rows from NULL
    group values. grouping_id bit order matches GROUPING(a)·2+GROUPING(b)
    on both engines. One Expand + one shuffle; integer cents throughout."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("total_cents"),
        )
        .select(
            "gid",
            "o_orderpriority",
            "o_orderstatus",
            "n_orders",
            "total_cents",
        )
    )


# ---------------------------------------------------------------------------
# Scalar-function surface round-out: strings 3, dates 2, conditionals.
# ---------------------------------------------------------------------------
@register(
    "string_functions_3",
    """
    SELECT c_custkey,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           rpad(c_mktsegment, 12, '.') AS seg_rpadded,
           repeat('-', CAST(c_custkey % 4 AS INTEGER)) AS dashes,
           left(c_name, 9) AS name_left,
           right(c_name, 4) AS name_right
    FROM customer WHERE c_custkey <= 200
    """,
)
def string_functions_3(spark, sf_dir):
    """String surface batch 3: translate / lpad / rpad / repeat / left /
    right — pure codegen projections, verified character-identical across
    engines on this ASCII corpus."""
    c = _t(spark, sf_dir, "customer")
    return c.where(F.col("c_custkey") <= 200).select(
        "c_custkey",
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_rpadded"),
        F.repeat(F.lit("-"), (F.col("c_custkey") % 4).cast("int")).alias("dashes"),
        F.expr("left(c_name, 9)").alias("name_left"),
        F.expr("right(c_name, 4)").alias("name_right"),
    )


@register(
    "date_functions_2",
    """
    SELECT o_orderkey,
           last_day(o_orderdate) AS month_end,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT)
             AS days_since_95
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def date_functions_2(spark, sf_dir):
    """Date surface batch 2: last_day / add_months (≡ DuckDB + INTERVAL,
    both clamp to month end — the recursive-CTE parity fact) / quarter /
    dayofyear / datediff. Calendar arithmetic is integer-exact on both
    engines."""
    o = _t(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.last_day("o_orderdate").alias("month_end"),
        F.add_months("o_orderdate", 3).alias("plus3m"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
    )


@register(
    "conditional_functions_surface",
    """
    SELECT c_custkey,
           NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_coalesced,
           GREATEST(c_custkey % 7, c_custkey % 5, c_custkey % 3) AS g3,
           LEAST(c_custkey % 7, c_custkey % 5, c_custkey % 3) AS l3,
           CASE WHEN c_acctbal >= 0 THEN 'POS' ELSE 'NEG' END AS bal_sign,
           CAST(IF(c_custkey % 2 = 0, c_custkey, -c_custkey) AS BIGINT)
             AS signed_key
    FROM customer WHERE c_custkey <= 300
    """,
)
def conditional_functions_surface(spark, sf_dir):
    """Conditional surface: NULLIF / COALESCE / GREATEST / LEAST / CASE /
    IF — the null-plumbing scalar layer; integer modulo keeps every value
    exact. (DuckDB supports IF(cond, a, b) with identical semantics.)"""
    c = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    return c.where(k <= 300).select(
        "c_custkey",
        F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg_or_null"),
        F.coalesce(
            F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("DEFAULT")
        ).alias("seg_coalesced"),
        F.greatest(k % 7, k % 5, k % 3).alias("g3"),
        F.least(k % 7, k % 5, k % 3).alias("l3"),
        F.when(F.col("c_acctbal") >= 0, "POS").otherwise("NEG").alias("bal_sign"),
        F.expr("CAST(IF(c_custkey % 2 = 0, c_custkey, -c_custkey) AS BIGINT)").alias(
            "signed_key"
        ),
    )
