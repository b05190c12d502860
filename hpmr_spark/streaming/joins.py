"""Stream-stream join with event-time range condition + watermarks.

Purchases joined to the same user's views within the preceding hour — both
sides are unbounded streams; watermarks bound the join state (views older
than the tolerance are evicted, purchases need no lookback beyond their own
watermark). Over a static corpus with Trigger.AvailableNow the result equals
the batch time-range join, so it is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hpmr_spark.streaming.windows import _events_stream, _run_to_table


def purchases_with_recent_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir)
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    out = _run_to_table(joined, "ssjoin", "append")
    return out.select(
        F.col("p_user").alias("user_id"), "purchase_id", "view_id", "p_ts", "v_ts"
    )


def purchases_with_recent_views_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join: purchases keep flowing even with no
    matching view; the NULL row for an unmatched purchase is emitted only
    once the VIEW-side watermark passes its p_ts (no future view could
    match) — so under Trigger.AvailableNow the emitted set is
    inner-matches ∪ {unmatched purchases with p_ts < max(ts) − 2h}, the
    exact predicate the oracle applies (the append-mode discipline applied
    to outer-join state expiry)."""
    ev = _events_stream(spark, sf_dir)
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    )
    out = _run_to_table(joined, "ssjoin_outer", "append")
    return out.select(
        F.col("p_user").alias("user_id"), "purchase_id", "view_id", "p_ts", "v_ts"
    )
