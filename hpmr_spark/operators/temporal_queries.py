"""Oracle-checked temporal queries: as-of join (vs DuckDB's native ASOF
JOIN) and gap sessionization (vs window SQL)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register
from hpmr_spark.operators.temporal import asof_join, sessionize
from hpmr_spark.sources.tables import load_events


@register(
    "asof_join_purchase_view",
    """
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    views AS (
      SELECT user_id, ts, MAX(CAST(ROUND(value * 100) AS BIGINT)) AS view_cents
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
    SELECT p.event_id, p.user_id, p.ts, v.ts AS asof_ts, v.view_cents
    FROM purchases p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_join_purchase_view(spark, sf_dir):
    """As-of join: each purchase gets the user's most recent view at-or-before
    it. Engine: union + window carry-forward (one shuffle, no range explode);
    oracle: DuckDB's native ASOF LEFT JOIN."""
    ev = load_events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max(F.round(F.col("value") * 100).cast("long")).alias("view_cents"))
    )
    out = asof_join(purchases, views, "user_id", "ts", ["view_cents"])
    return out.select("event_id", "user_id", "ts", "asof_ts", "view_cents")


@register(
    "sessionize_clicks",
    """
    WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    l AS (SELECT e.*, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts FROM e)
    SELECT event_id, user_id,
           CAST(SUM(CASE WHEN pts IS NULL OR epoch_us(ts) - epoch_us(pts) > 1800000000
                    THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
    FROM l
    """,
)
def sessionize_clicks(spark, sf_dir):
    """Gap-based sessionization (30-min gap) of click events per user."""
    ev = load_events(spark, sf_dir).where(F.col("event_type") == "click")
    out = sessionize(ev.select("event_id", "user_id", "ts"), "user_id", "ts", 1800)
    return out.select("event_id", "user_id", "session_seq")


@register(
    "session_stats",
    """
    WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    l AS (SELECT e.*, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts FROM e),
    s AS (SELECT event_id, user_id, ts,
                 SUM(CASE WHEN pts IS NULL OR epoch_us(ts) - epoch_us(pts) > 1800000000
                     THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM l)
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us
    FROM s GROUP BY user_id, session_seq
    """,
)
def session_stats(spark, sf_dir):
    """Session rollup: events per session + exact duration in micros."""
    ev = load_events(spark, sf_dir).where(F.col("event_type") == "click")
    s = sessionize(ev.select("event_id", "user_id", "ts"), "user_id", "ts", 1800)
    return s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )
