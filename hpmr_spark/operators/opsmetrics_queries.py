"""Operational-metrics batch (round 4): period-over-period metric
decomposition (volume vs rate attribution with an exact integer residual
audit) and the multi-window SLO burn-rate alert — the two reports an
on-call analytics stack renders first.

Disciplines: every attribution term is a floor-divided integer
micro-unit with an explicit residual column making the decomposition sum
EXACTLY to the observed delta (floors never silently lose mass);
burn-rate thresholds are integer cross-multiplications (no float gates).

Reference parity: extends the engine surface beyond the reference's
kv kernel (/root/reference/src/hpmr.h:1-10) along the analytics axis
the brief makes first-class; every aggregation follows the DistMap
combine-on-insert ≡ map-side partial agg mapping
(/root/reference/src/bare_map.h:55-57).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.sources.tables import load_events

# ---------------------------------------------------------------------------
# Period-over-period revenue decomposition: volume effect vs rate effect.
# ---------------------------------------------------------------------------
@register(
    "revenue_change_decomposition",
    """
    WITH t0 AS (SELECT CAST(epoch_us(MIN(ts)) AS BIGINT) AS t0 FROM events),
    e AS (
      SELECT ev.user_id,
             CAST(CASE WHEN epoch_us(ev.ts) - t0.t0 >= 1296000000000
                  THEN 2 ELSE 1 END AS BIGINT) AS period,
             CASE WHEN ev.event_type = 'purchase'
                  THEN CAST(ROUND(ev.value * 100) AS BIGINT) ELSE 0 END AS cents
      FROM events ev, t0
    ),
    p AS (
      SELECT period,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(SUM(cents) AS BIGINT) AS revenue
      FROM e GROUP BY period
    ),
    w AS (
      SELECT MAX(CASE WHEN period = 1 THEN n_users END) AS n1,
             MAX(CASE WHEN period = 1 THEN revenue END) AS r1,
             MAX(CASE WHEN period = 2 THEN n_users END) AS n2,
             MAX(CASE WHEN period = 2 THEN revenue END) AS r2
      FROM p
    )
    SELECT n1, r1, n2, r2,
           CAST((r2 - r1) * 1000000 AS BIGINT) AS delta_micro,
           CAST((n2 - n1) * (CAST(r1 AS HUGEINT) * 1000000 // n1) AS BIGINT)
             AS volume_effect_micro,
           CAST(CAST(n2 AS HUGEINT)
                * (CAST(r2 AS HUGEINT) * 1000000 // n2
                   - CAST(r1 AS HUGEINT) * 1000000 // n1) AS BIGINT)
             AS rate_effect_micro,
           CAST((r2 - r1) * 1000000
                - (n2 - n1) * (CAST(r1 AS HUGEINT) * 1000000 // n1)
                - CAST(n2 AS HUGEINT)
                  * (CAST(r2 AS HUGEINT) * 1000000 // n2
                     - CAST(r1 AS HUGEINT) * 1000000 // n1) AS BIGINT)
             AS residual_micro
    FROM w
    """,
)
def revenue_change_decomposition(spark, sf_dir):
    """Period-over-period revenue-change attribution — the "why did the
    metric move" decomposition: ΔR splits into a VOLUME effect
    (Δusers × period-1 ARPU) and a RATE effect (period-2 users × ΔARPU),
    all in floor-divided integer micro-cents, PLUS an explicit residual
    column so the three parts sum to ΔR·10⁶ EXACTLY (floor division never
    silently loses mass — the residual is the rounding audit, bounded by
    n2 + |Δn| micro-units). ARPU quotients in int128. The identity
    ΔR = Δn·ARPU₁ + n₂·ΔARPU holds exactly in rationals; the residual
    exposes precisely what flooring moved."""
    ev = load_events(spark, sf_dir)
    t0 = ev.agg(F.unix_micros(F.min("ts")).alias("t0"))
    e = ev.crossJoin(F.broadcast(t0)).select(
        "user_id",
        F.when(
            F.unix_micros(F.col("ts")) - F.col("t0") >= 1_296_000_000_000, 2
        )
        .otherwise(1)
        .cast("long")
        .alias("period"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("long"),
        )
        .otherwise(0)
        .alias("cents"),
    )
    p = e.groupBy("period").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum("cents").cast("long").alias("revenue"),
    )
    w = p.agg(
        F.max(F.when(F.col("period") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("period") == 1, F.col("revenue"))).alias("r1"),
        F.max(F.when(F.col("period") == 2, F.col("n_users"))).alias("n2"),
        F.max(F.when(F.col("period") == 2, F.col("revenue"))).alias("r2"),
    )
    arpu1 = "CAST(r1 AS DECIMAL(38,0)) * 1000000 div n1"
    arpu2 = "CAST(r2 AS DECIMAL(38,0)) * 1000000 div n2"
    vol = f"(n2 - n1) * ({arpu1})"
    rate = f"CAST(n2 AS DECIMAL(38,0)) * (({arpu2}) - ({arpu1}))"
    return w.select(
        "n1",
        "r1",
        "n2",
        "r2",
        F.expr("CAST((r2 - r1) * 1000000 AS BIGINT)").alias("delta_micro"),
        F.expr(f"CAST({vol} AS BIGINT)").alias("volume_effect_micro"),
        F.expr(f"CAST({rate} AS BIGINT)").alias("rate_effect_micro"),
        F.expr(
            f"CAST((r2 - r1) * 1000000 - ({vol}) - ({rate}) AS BIGINT)"
        ).alias("residual_micro"),
    )


# ---------------------------------------------------------------------------
# Multi-window SLO burn-rate alert (the SRE 1h/6h policy).
# ---------------------------------------------------------------------------
@register(
    "slo_burn_rate_windows",
    """
    WITH tmax AS (SELECT CAST(epoch_us(MAX(ts)) AS BIGINT) AS tm FROM events),
    win AS (
      SELECT CAST(SUM(CASE WHEN epoch_us(ev.ts) > tmax.tm - 3600000000
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_1h,
             CAST(SUM(CASE WHEN epoch_us(ev.ts) > tmax.tm - 3600000000
                       AND ev.event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS err_1h,
             CAST(SUM(CASE WHEN epoch_us(ev.ts) > tmax.tm - 21600000000
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_6h,
             CAST(SUM(CASE WHEN epoch_us(ev.ts) > tmax.tm - 21600000000
                       AND ev.event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS err_6h
      FROM events ev, tmax
    )
    SELECT n_1h, err_1h, n_6h, err_6h,
           CAST(CASE WHEN n_1h > 0
                THEN CAST(err_1h AS HUGEINT) * 100000000 // n_1h
                ELSE 0 END AS BIGINT) AS burn_1h_x1pct_ppm,
           CAST(CASE WHEN n_6h > 0
                THEN CAST(err_6h AS HUGEINT) * 100000000 // n_6h
                ELSE 0 END AS BIGINT) AS burn_6h_x1pct_ppm,
           (1000 * err_1h * 100 >= 144 * 10 * n_1h
            AND 1000 * err_6h * 100 >= 60 * 10 * n_6h) AS page_alert
    FROM win
    """,
)
def slo_burn_rate_windows(spark, sf_dir):
    """The SRE multi-window burn-rate alert against a 1% error SLO: the
    burn rate (error-rate / SLO) over the trailing 1-hour AND 6-hour
    windows, firing the page only when BOTH exceed their thresholds
    (14.4× and 6× — the Google SRE workbook's fast-burn policy; the long
    window keeps a transient spike from paging, the short one keeps the
    alert responsive). Burn rates are reported in ppm of 1× via int128
    floor division; the ALERT DECISION never touches a float — it is the
    cross-multiplication err·100 ≥ threshold·n/1000-scaled with exact
    integers on both sides. Window membership is exact integer micros off
    the corpus max timestamp."""
    ev = load_events(spark, sf_dir)
    tmax = ev.agg(F.unix_micros(F.max("ts")).alias("tm"))
    e = ev.crossJoin(F.broadcast(tmax)).select(
        F.unix_micros(F.col("ts")).alias("us"),
        F.col("event_type"),
        F.col("tm"),
    )
    win = e.agg(
        F.sum(F.when(F.col("us") > F.col("tm") - 3_600_000_000, 1).otherwise(0))
        .cast("long")
        .alias("n_1h"),
        F.sum(
            F.when(
                (F.col("us") > F.col("tm") - 3_600_000_000)
                & (F.col("event_type") == "error"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("err_1h"),
        F.sum(F.when(F.col("us") > F.col("tm") - 21_600_000_000, 1).otherwise(0))
        .cast("long")
        .alias("n_6h"),
        F.sum(
            F.when(
                (F.col("us") > F.col("tm") - 21_600_000_000)
                & (F.col("event_type") == "error"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("err_6h"),
    )
    return win.select(
        "n_1h",
        "err_1h",
        "n_6h",
        "err_6h",
        F.expr(
            "CAST(CASE WHEN n_1h > 0"
            " THEN CAST(err_1h AS DECIMAL(38,0)) * 100000000 div n_1h"
            " ELSE 0 END AS BIGINT)"
        ).alias("burn_1h_x1pct_ppm"),
        F.expr(
            "CAST(CASE WHEN n_6h > 0"
            " THEN CAST(err_6h AS DECIMAL(38,0)) * 100000000 div n_6h"
            " ELSE 0 END AS BIGINT)"
        ).alias("burn_6h_x1pct_ppm"),
        F.expr(
            "1000 * err_1h * 100 >= 144 * 10 * n_1h"
            " AND 1000 * err_6h * 100 >= 60 * 10 * n_6h"
        ).alias("page_alert"),
    )


# ---------------------------------------------------------------------------
# Table fingerprint: content-addressed schema+stats hash.
# ---------------------------------------------------------------------------
@register(
    "table_fingerprint_audit",
    """
    WITH s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS ndv_key,
             CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
             CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
             CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS ndv_prio
      FROM orders
    )
    SELECT n, ndv_key, sum_cents,
           md5('orders|' || CAST(n AS VARCHAR) || '|'
               || CAST(ndv_key AS VARCHAR) || '|'
               || CAST(min_key AS VARCHAR) || '|'
               || CAST(max_key AS VARCHAR) || '|'
               || CAST(sum_cents AS VARCHAR) || '|'
               || CAST(ndv_prio AS VARCHAR)) AS fingerprint
    FROM s
    """,
)
def table_fingerprint_audit(spark, sf_dir):
    """Content-addressed table fingerprint: md5 over a canonical string of
    exact statistics (row count, key NDV/min/max, total integer cents,
    categorical NDV) — the cheap data-version check a pipeline stores per
    snapshot to detect silent upstream changes without hashing every row
    (the full-row fingerprint is dedup/exact's job). Every stat is exact
    integer arithmetic and md5 is the committed cross-engine hash, so
    both engines derive the IDENTICAL fingerprint — it can gate promotion
    in either system."""
    o = _t(spark, sf_dir, "orders")
    s = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("o_orderkey").cast("long").alias("ndv_key"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("sum_cents"),
        F.countDistinct("o_orderpriority").cast("long").alias("ndv_prio"),
    )
    return s.select(
        "n",
        "ndv_key",
        "sum_cents",
        F.md5(
            F.concat_ws(
                "|",
                F.lit("orders"),
                F.col("n").cast("string"),
                F.col("ndv_key").cast("string"),
                F.col("min_key").cast("string"),
                F.col("max_key").cast("string"),
                F.col("sum_cents").cast("string"),
                F.col("ndv_prio").cast("string"),
            )
        ).alias("fingerprint"),
    )
