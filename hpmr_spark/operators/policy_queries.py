"""Decision/policy analytics: offline bandit policy evaluation by replay,
and a time-bounded conversion funnel.

- bandit_replay_ctr: the replay estimator (Li et al., WSDM 2011) —
  evaluate a NEW arm-selection policy on LOGGED interaction data by
  keeping only the events where the policy's choice coincides with the
  logged arm; the mean reward over matches is an unbiased estimate when
  logging was uniform. The policy here is a committed hash (so both
  engines replay identically), rewards are integer-thresholded values.
- funnel_time_bounded: view → click within 1h → purchase within 24h —
  the funnel variant where each stage must land inside a window anchored
  at the previous stage (the unbounded variant is
  funnel_view_click_purchase). Exact integer micros everywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register
from hpmr_spark.functions.hashing import hash60, sql_hash60
from hpmr_spark.sources.tables import load_events

_ARMS = ["view", "click", "purchase", "signup", "error"]
_ARMS_SQL = ", ".join(f"'{a}'" for a in _ARMS)


@register(
    "bandit_replay_ctr",
    f"""
    WITH logged AS (
      SELECT event_id, user_id, event_type,
             CASE WHEN value >= 25.0 THEN 1 ELSE 0 END AS reward,
             [{_ARMS_SQL}][CAST({sql_hash60("'pol:' || CAST(user_id AS VARCHAR)")}
                           % 5 AS BIGINT) + 1] AS policy_arm
      FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_logged,
           CAST(SUM(CASE WHEN policy_arm = event_type THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN policy_arm = event_type THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS match_rate_ppm,
           CAST(SUM(CASE WHEN policy_arm = event_type THEN reward ELSE 0 END)
                * 1000000
                // SUM(CASE WHEN policy_arm = event_type THEN 1 ELSE 0 END)
                AS BIGINT) AS policy_value_ppm,
           CAST(SUM(reward) * 1000000 // COUNT(*) AS BIGINT)
             AS logging_value_ppm
    FROM logged
    """,
)
def bandit_replay_ctr(spark, sf_dir):
    """Offline policy evaluation by replay: a committed hash policy picks
    one of 5 arms per user; only logged events whose type equals the
    policy's pick count toward the policy's estimated value (reward = the
    committed value>=25 threshold). Because the policy is content-addressed
    both engines replay the SAME subset — the estimator itself is
    hash-checked, not just its inputs. One conditional-aggregate scan; at
    100 TB this is how recommendation policies are screened against logs
    before any A/B traffic is spent."""
    ev = load_events(spark, sf_dir)
    arms = F.array(*[F.lit(a) for a in _ARMS])
    logged = ev.select(
        "event_type",
        F.when(F.col("value") >= 25.0, 1).otherwise(0).alias("reward"),
        F.element_at(
            arms,
            (
                hash60(F.concat(F.lit("pol:"), F.col("user_id").cast("string"))) % 5
            ).cast("int")
            + 1,
        ).alias("policy_arm"),
    )
    m = F.when(F.col("policy_arm") == F.col("event_type"), 1).otherwise(0)
    return logged.agg(
        F.count(F.lit(1)).cast("long").alias("n_logged"),
        F.sum(m).cast("long").alias("n_matched"),
        F.expr(
            "SUM(CASE WHEN policy_arm = event_type THEN 1 ELSE 0 END)"
            " * 1000000 div COUNT(1)"
        ).cast("long").alias("match_rate_ppm"),
        F.expr(
            "SUM(CASE WHEN policy_arm = event_type THEN reward ELSE 0 END)"
            " * 1000000"
            " div SUM(CASE WHEN policy_arm = event_type THEN 1 ELSE 0 END)"
        ).cast("long").alias("policy_value_ppm"),
        F.expr("SUM(reward) * 1000000 div COUNT(1)").cast("long").alias(
            "logging_value_ppm"
        ),
    )


@register(
    "funnel_time_bounded",
    """
    WITH v AS (
      SELECT user_id, MIN(epoch_us(ts)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND epoch_us(e.ts) > v.t1
        AND epoch_us(e.ts) - v.t1 <= 3600000000
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND epoch_us(e.ts) > c.t2
        AND epoch_us(e.ts) - c.t2 <= 86400000000
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_1h,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_24h,
           CAST((SELECT COUNT(*) FROM p) * 1000000
                // (SELECT COUNT(*) FROM v) AS BIGINT) AS conv_ppm
    """,
)
def funnel_time_bounded(spark, sf_dir):
    """Time-anchored funnel: first view, then first click within ONE HOUR
    of that view, then first purchase within 24 HOURS of that click —
    each stage's window anchors at the user's previous stage timestamp
    (the unbounded cousin is funnel_view_click_purchase). Stage frames are
    user-level aggregates joined back to events — two hash joins on
    user_id, all integer micros. At 100 TB the stage frames are
    users-sized; the events table streams through once per stage (or once
    total with a conditional re-aggregation)."""
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("t")
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where((F.col("t") > F.col("t1")) & (F.col("t") - F.col("t1") <= 3600000000))
        .groupBy("user_id")
        .agg(F.min("t").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where((F.col("t") > F.col("t2")) & (F.col("t") - F.col("t2") <= 86400000000))
        .groupBy("user_id")
        .agg(F.min("t").alias("t3"))
    )
    nv = v.agg(F.count(F.lit(1)).cast("long").alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).cast("long").alias("n_click_1h"))
    np_ = p.agg(F.count(F.lit(1)).cast("long").alias("n_purchase_24h"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_view",
            "n_click_1h",
            "n_purchase_24h",
            F.expr("n_purchase_24h * 1000000 div n_view").cast("long").alias(
                "conv_ppm"
            ),
        )
    )
