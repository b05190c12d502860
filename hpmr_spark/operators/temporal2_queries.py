"""Temporal batch 2: time-weighted averages and sequence-pattern matching.

Reference parity: per-key ordered-state workloads (the reference's keyed
combine model with an ordering column — /root/reference/src/dist_map.h:
147-210 + reducer.h); both are one-shuffle window plans on user_id.

Determinism: durations as integer seconds (floor div of exact epoch-micros
differences, non-negative), products and sums as BIGINT, one final double
division; pattern hits are integer counts over a fully tie-broken order.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t


@register(
    "time_weighted_avg_value",
    """
    WITH seq AS (
      SELECT user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             (lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id)
              - epoch_us(ts)) // 1000000 AS dur_s
      FROM events
    )
    SELECT user_id,
           CAST(SUM(dur_s) AS BIGINT) AS total_s,
           CAST(SUM(dur_s * cents) AS BIGINT) AS weighted_cents_s,
           CASE WHEN SUM(dur_s) > 0 THEN
             CAST(SUM(dur_s * cents) AS DOUBLE) / CAST(SUM(dur_s) AS DOUBLE)
           END AS twa_cents
    FROM seq WHERE dur_s IS NOT NULL
    GROUP BY user_id
    """,
)
def time_weighted_avg_value(spark, sf_dir):
    """Time-weighted average — the honest mean for irregularly-sampled
    series: each reading holds until the next one, so it weighs by its
    integer-second duration (floor-divided from exact epoch-micros deltas;
    the last open-ended reading is excluded on both engines). Weighted
    sums are exact BIGINT products; the average is ONE final double
    division. One shuffle on user_id shared by the lead() window and the
    aggregation."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    seq = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.expr(
            "(lead(unix_micros(ts)) over (partition by user_id order by ts, event_id)"
            " - unix_micros(ts)) div 1000000"
        ).alias("dur_s"),
    )
    agg = seq.where(F.col("dur_s").isNotNull()).groupBy("user_id").agg(
        F.sum("dur_s").alias("total_s"),
        F.sum(F.col("dur_s") * F.col("cents")).alias("weighted_cents_s"),
    )
    return agg.select(
        "user_id",
        "total_s",
        "weighted_cents_s",
        F.expr(
            "CASE WHEN total_s > 0 THEN CAST(weighted_cents_s AS DOUBLE)"
            " / CAST(total_s AS DOUBLE) END"
        ).alias("twa_cents"),
    )


@register(
    "pattern_match_view_purchase",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS nxt1,
             lead(event_type, 2) OVER w AS nxt2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_views,
           CAST(SUM(CASE WHEN event_type = 'view'
                          AND (nxt1 = 'purchase' OR nxt2 = 'purchase')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_converting_views
    FROM seq GROUP BY user_id
    """,
)
def pattern_match_view_purchase(spark, sf_dir):
    """MATCH_RECOGNIZE-lite: count views that convert to a purchase within
    the next two events of the same user — the sequence-pattern shape
    (A then B within k steps) expressed as lead() lookaheads over a fully
    tie-broken per-user order, then integer counting. Lookahead past the
    partition end is NULL → no match, identically on both engines. One
    shuffle on user_id; k is a column-count knob, not a join."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("nxt1"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
    )
    is_view = F.col("event_type") == "view"
    converts = is_view & (
        (F.col("nxt1") == "purchase") | (F.col("nxt2") == "purchase")
    )
    return seq.groupBy("user_id").agg(
        F.sum(F.when(is_view, 1).otherwise(0)).alias("n_views"),
        F.sum(F.when(converts, 1).otherwise(0)).alias("n_converting_views"),
    )


@register(
    "asof_join_with_tolerance",
    """
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    views AS (
      SELECT user_id, ts, MAX(CAST(ROUND(value * 100) AS BIGINT)) AS view_cents
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN epoch_us(p.ts) - epoch_us(v.ts) > 3600000000
                THEN NULL ELSE v.ts END AS asof_ts,
           CASE WHEN epoch_us(p.ts) - epoch_us(v.ts) > 3600000000
                THEN NULL ELSE v.view_cents END AS view_cents
    FROM purchases p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_join_with_tolerance(spark, sf_dir):
    """As-of join with a staleness tolerance: the matched view must be
    within 1 hour of the purchase, else the attachment nulls out (the
    market-data semantic — a quote older than the tolerance is no quote).
    Exercises the operator's tolerance branch; the comparison is exact
    integer micros on both engines. Same single-shuffle union + window
    carry-forward plan as the tolerance-free twin."""
    from hpmr_spark.operators.temporal import asof_join
    from hpmr_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max(F.round(F.col("value") * 100).cast("long")).alias("view_cents"))
    )
    out = asof_join(
        purchases, views, "user_id", "ts", ["view_cents"], tolerance_seconds=3600
    )
    return out.select("event_id", "user_id", "ts", "asof_ts", "view_cents")


@register(
    "ohlc_hourly_bars",
    """
    WITH e AS (
      SELECT date_trunc('hour', ts) AS hr,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT hr,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
           CAST(MAX(cents) AS BIGINT) AS high_cents,
           CAST(MIN(cents) AS BIGINT) AS low_cents,
           CAST(MAX(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents
    FROM e GROUP BY hr
    """,
)
def ohlc_hourly_bars(spark, sf_dir):
    """Time-series downsampling to OHLC bars (the market-data resample):
    per hour — open (value at the first fully tie-broken (ts, event_id)),
    high, low, close (value at the last). Spark uses min_by/max_by over a
    (ts, event_id) struct ordering — the compound-tie-break rule — while
    the oracle pins the same rows with window row_number (DuckDB 1.0
    arg_min can't take struct orderings, CLAUDE.md). ONE shuffle on the
    hour bucket; at 100 TB bars parallelize over (symbol, window) keys."""
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    order = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.select(
            F.date_trunc("hour", "ts").alias("hr"),
            cents.alias("cents"),
            "ts",
            "event_id",
        )
        .groupBy("hr")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min_by("cents", order).alias("open_cents"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.max_by("cents", order).alias("close_cents"),
        )
    )


@register(
    "topk_with_ties_prices",
    """
    SELECT p_brand, p_partkey,
           CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
           CAST(rk AS BIGINT) AS price_rank
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             dense_rank() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC) AS rk
      FROM part)
    WHERE rk <= 3
    """,
)
def topk_with_ties_prices(spark, sf_dir):
    """Top-k WITH ties (the SQL:2008 FETCH WITH TIES semantic): every part
    whose price reaches the top-3 distinct price levels of its brand —
    dense_rank so equal prices share a rank and ALL peers survive, making
    the result set deterministic WITHOUT a tie-break (row_number top-k
    would need one; this is the other honest answer to ties). One shuffle
    on p_brand."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return (
        p.select(
            "p_brand",
            "p_partkey",
            F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
            F.dense_rank().over(w).alias("rk"),
        )
        .where(F.col("rk") <= 3)
        .select(
            "p_brand", "p_partkey", "price_cents",
            F.col("rk").cast("long").alias("price_rank"),
        )
    )


@register(
    "event_lateness_profile",
    """
    WITH a AS (
      SELECT event_type,
             epoch_us(ts) AS us,
             MAX(epoch_us(ts)) OVER (ORDER BY event_id
                                     ROWS UNBOUNDED PRECEDING) AS frontier
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(frontier - us) AS BIGINT) AS max_lateness_us,
           CAST(SUM(CASE WHEN frontier - us > 3600000000 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_late_1h
    FROM a GROUP BY event_type
    """,
)
def event_lateness_profile(spark, sf_dir):
    """Out-of-orderness profiling — how you CHOOSE a watermark delay before
    deploying the streaming jobs: in arrival order (event_id), each event's
    lateness is the event-time frontier (running max) minus its own
    timestamp; report the worst case and the count beyond a 1-hour
    candidate watermark per type. Exact integer micros throughout. The
    arrival-ordered running max is the two-pass value-bucketed running
    max (functions/ranking.global_running over event_id) — parallel across
    value buckets, no single-partition window; at cluster scale arrival
    order is per-source-partition anyway and the same helper applies
    within each."""
    from hpmr_spark.functions.ranking import global_running

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type", "event_id", F.unix_micros("ts").alias("us")
    )
    a = global_running(
        base, ["event_id"], "us", kind="max", strict=False, out="frontier"
    )
    return a.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.col("frontier") - F.col("us")).alias("max_lateness_us"),
        F.sum(
            F.when(F.col("frontier") - F.col("us") > 3_600_000_000, 1).otherwise(0)
        ).alias("n_late_1h"),
    )
