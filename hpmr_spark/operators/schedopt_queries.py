"""Scheduling / optimization DP (round 6, wave 6).

weighted_interval_scheduling: the classic weighted interval scheduling
DP over the busiest user's sessions (30-min-gap sessionization, strict
">" new-session rule — CLAUDE.md; value = exact event cents). Sessions
sorted by end time; p(i) = the last session j with end_j < start_i
(strict compatibility); dp_i = max(dp_{i-1}, v_i + dp_{p(i)}). The DP
is irreducibly sequential, so the engine folds it in grouped pandas
over the BOUNDED per-user session list (≤ events-per-user rows at any
fact scale) and the oracle walks the identical recurrence as a
recursive CTE carrying the dp table as a LIST column (the
token-bucket/DTW pattern). Output: session count, total value, and
the optimal non-overlapping value.

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's analytics axis.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hpmr_spark.catalog import register
from hpmr_spark.sources.tables import load_events

_GAP_US = 1800 * 1000000


def _wis_fold(pdf):
    """Exact integer weighted-interval DP (rows: start_us, end_us, v)."""
    import pandas as pd

    rows = sorted(
        zip(pdf["end_us"].tolist(), pdf["start_us"].tolist(), pdf["v"].tolist())
    )
    n = len(rows)
    dp = [0] * (n + 1)
    for i in range(1, n + 1):
        end_i, start_i, v_i = rows[i - 1]
        p = 0
        for j in range(i - 1, 0, -1):
            if rows[j - 1][0] < start_i:
                p = j
                break
        dp[i] = max(dp[i - 1], v_i + dp[p])
    return pd.DataFrame(
        {
            "n_sessions": [n],
            "total_value_cents": [sum(r[2] for r in rows)],
            "best_value_cents": [dp[n]],
        }
    )


_WIS_ORACLE = f"""
    WITH RECURSIVE topu AS (
      SELECT user_id FROM events
      GROUP BY user_id
      ORDER BY COUNT(*) DESC, user_id ASC LIMIT 1
    ),
    e AS (
      SELECT epoch_us(ev.ts) AS us,
             CAST(ROUND(ev.value * 100) AS BIGINT) AS cents
      FROM events ev JOIN topu t ON t.user_id = ev.user_id
    ),
    m AS (
      SELECT us, cents,
             CASE WHEN us - LAG(us) OVER (ORDER BY us) > {_GAP_US}
                    OR LAG(us) OVER (ORDER BY us) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM e
    ),
    s AS (
      SELECT us, cents,
             SUM(is_new) OVER (ORDER BY us ROWS UNBOUNDED PRECEDING) AS seq
      FROM m
    ),
    sess AS MATERIALIZED (
      SELECT CAST(MIN(us) AS BIGINT) AS start_us,
             CAST(MAX(us) AS BIGINT) AS end_us,
             CAST(SUM(cents) AS BIGINT) AS v
      FROM s GROUP BY seq
    ),
    r AS MATERIALIZED (
      SELECT *, ROW_NUMBER() OVER (ORDER BY end_us, start_us) AS i FROM sess
    ),
    pp AS MATERIALIZED (
      SELECT a.i, a.v,
             CAST(COALESCE(MAX(b.i), 0) AS BIGINT) AS p
      FROM r a LEFT JOIN r b ON b.end_us < a.start_us
      GROUP BY a.i, a.v
    ),
    nmax AS (SELECT CAST(MAX(i) AS BIGINT) AS n FROM r),
    walk(i, dps) AS (
      SELECT CAST(0 AS BIGINT), [CAST(0 AS BIGINT)]
      UNION ALL
      SELECT w.i + 1,
             list_append(w.dps,
               GREATEST(w.dps[CAST(w.i + 1 AS INTEGER)],
                        q.v + w.dps[CAST(q.p + 1 AS INTEGER)]))
      FROM walk w JOIN pp q ON q.i = w.i + 1
    )
    SELECT nm.n AS n_sessions,
           (SELECT CAST(SUM(v) AS BIGINT) FROM sess) AS total_value_cents,
           CAST(w.dps[CAST(nm.n + 1 AS INTEGER)] AS BIGINT)
             AS best_value_cents
    FROM walk w, nmax nm
    WHERE w.i = nm.n
"""


@register("weighted_interval_scheduling", _WIS_ORACLE)
def weighted_interval_scheduling(spark, sf_dir):
    """Weighted interval scheduling over the busiest user's sessions —
    see module docstring. Output: one row (n_sessions,
    total_value_cents, best_value_cents)."""
    ev = load_events(spark, sf_dir)
    topu = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("ne"))
        .orderBy(F.col("ne").desc(), F.col("user_id"))
        .limit(1)
        .select("user_id")
    )
    e = ev.join(F.broadcast(topu), "user_id").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("us")
    m = e.withColumn(
        "is_new",
        F.when(
            (F.col("us") - F.lag("us").over(w) > _GAP_US)
            | F.lag("us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    s = m.withColumn(
        "seq", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    sess = s.groupBy("user_id", "seq").agg(
        F.min("us").cast("long").alias("start_us"),
        F.max("us").cast("long").alias("end_us"),
        F.sum("cents").cast("long").alias("v"),
    )
    return sess.groupBy("user_id").applyInPandas(
        lambda pdf: _wis_fold(pdf),
        schema="n_sessions long, total_value_cents long, best_value_cents long",
    ).select("n_sessions", "total_value_cents", "best_value_cents")
