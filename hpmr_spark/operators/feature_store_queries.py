"""Feature-store batch (round 6): point-in-time-correct feature joins —
the leakage-safe enrichment every ML training pipeline runs ("what was
the feature value AS OF each observation's timestamp", never a value
from the future).

Spark-first shape: NO interval join at all. Feature updates and
observations UNION into one per-user event stream; a single user-keyed
window pass LOCFs the latest feature value onto each observation
(F.last ignorenulls ≡ DuckDB last_value IGNORE NULLS with an explicit
ROWS running frame — a verified cross-engine parity fact, CLAUDE.md).
At 100 TB this is one hash shuffle on user_id and zero join blowup;
the classic union-and-carry formulation of the AS OF join.

Disciplines (CLAUDE.md): money in exact integer cents (ROUND(x*100) per
row before any sum); full tie-breaks — feature updates sort BEFORE
observations at the same microsecond (kind 0 < 1), then event_id;
sentinel -1 for observations preceding any feature version (explicit >
implicit NULL).

Reference parity: extends the engine surface beyond the reference kv
kernel (/root/reference/src/hpmr.h:1-10); the per-user carried state is
the DistMap get-latest idiom (/root/reference/src/dist_map.h:132-145)
expressed as a window, not a point lookup.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import register
from hpmr_spark.sources.tables import load_events

_PIT_ORACLE = """
    WITH ev AS (
      SELECT event_id, user_id, event_type,
             CAST(epoch_us(ts) AS BIGINT) AS ts_us,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    feat AS (
      SELECT user_id, ts_us, event_id, 0 AS kind,
             CAST(SUM(cents) OVER (PARTITION BY user_id
                                   ORDER BY ts_us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS feat_cents
      FROM ev WHERE event_type = 'purchase'
    ),
    obs AS (
      SELECT user_id, ts_us, event_id, 1 AS kind,
             CAST(NULL AS BIGINT) AS feat_cents
      FROM ev WHERE event_type = 'view'
    ),
    u AS (
      SELECT * FROM feat UNION ALL SELECT * FROM obs
    ),
    carried AS (
      SELECT user_id, ts_us, event_id, kind,
             last_value(feat_cents IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts_us, kind, event_id
                     ROWS UNBOUNDED PRECEDING) AS pit_cents
      FROM u
    )
    SELECT event_id, user_id, ts_us,
           CAST(COALESCE(pit_cents, -1) AS BIGINT) AS pit_spend_cents
    FROM carried WHERE kind = 1
"""


@register("pit_join_feature_spend", _PIT_ORACLE)
def pit_join_feature_spend(spark, sf_dir):
    """Point-in-time feature join: the feature is each user's cumulative
    purchase spend (exact integer cents, versioned at every purchase);
    every 'view' observation is enriched with the feature value AS OF its
    timestamp — the leakage-safe training-set join (a view never sees a
    later purchase). Implemented as union-and-carry: one user-keyed
    window LOCFs the latest version onto observations; purchases at the
    SAME microsecond as a view sort first (kind tie-break), so the view
    sees them — the committed at-or-before contract. Observations before
    any purchase carry the -1 sentinel."""
    ev = load_events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    feat = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts_us",
        "event_id",
        F.lit(0).alias("kind"),
        F.sum("cents").over(w_run).cast("long").alias("feat_cents"),
    )
    obs = ev.where(F.col("event_type") == "view").select(
        "user_id",
        "ts_us",
        "event_id",
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("feat_cents"),
    )
    u = feat.unionAll(obs)
    w_carry = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn(
            "pit_cents", F.last("feat_cents", ignorenulls=True).over(w_carry)
        )
        .where(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            "ts_us",
            F.coalesce(F.col("pit_cents"), F.lit(-1))
            .cast("long")
            .alias("pit_spend_cents"),
        )
    )
