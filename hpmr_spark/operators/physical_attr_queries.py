"""Physical-control and exact-allocation batch:

- join_hint_smj_revenue: the same declarative join under an explicit
  sort-merge-join hint — proving the engine surface exposes physical join
  strategy control (the knob you reach for when the "small" side of a
  broadcast stops being small at 100 TB). Result identical to the
  unhinted plan (oracle); the plan difference is asserted in
  tests/test_physical.py.
- attribution_position_based: multi-touch attribution with EXACT integer
  credit allocation (40/20/40 position rule, largest-remainder to the
  first touch) — every conversion's credits sum to exactly 1,000,000 ppm
  by construction, so channel totals are exact BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.sources.tables import load_events

# ---------------------------------------------------------------------------
# Sort-merge-join hint: physical strategy override, same answer.
# ---------------------------------------------------------------------------
@register(
    "join_hint_smj_revenue",
    """
    SELECT p_brand,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def join_hint_smj_revenue(spark, sf_dir):
    """Brand revenue through an EXPLICIT sort-merge join: part is hinted
    with MERGE, overriding the broadcast Catalyst would pick at this size.
    This is the control a 100 TB operator needs when a dimension outgrows
    the broadcast threshold or when co-located bucketed layouts make SMJ
    shuffle-free; the hint changes ONLY the physical strategy — the oracle
    (and tests/test_physical.py, which inspects both plans) proves the
    answer is byte-identical to the unhinted query."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").hint("merge")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Position-based (40/20/40) multi-touch attribution, exact ppm credits.
# ---------------------------------------------------------------------------
_CREDIT_CASE = """
    CASE WHEN k = 1 THEN 1000000
         WHEN k = 2 THEN 500000
         WHEN rn_asc = 1 THEN 400000 + (200000 - (200000 div (k - 2)) * (k - 2))
         WHEN rn_desc = 1 THEN 400000
         ELSE 200000 div (k - 2)
    END
"""


@register(
    "attribution_position_based",
    f"""
    WITH fp AS (
      SELECT user_id, MIN(epoch_us(ts)) AS p_us
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touch AS (
      SELECT e.user_id, e.event_type, epoch_us(e.ts) AS t_us, e.event_id
      FROM events e JOIN fp ON e.user_id = fp.user_id
      WHERE e.event_type <> 'purchase' AND epoch_us(e.ts) < fp.p_us
    ),
    r AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t_us, event_id)
               AS rn_asc,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t_us DESC,
                                event_id DESC) AS rn_desc,
             COUNT(*) OVER (PARTITION BY user_id) AS k
      FROM touch
    )
    SELECT event_type,
           CAST(SUM({_CREDIT_CASE.replace('div', '//')}) AS BIGINT)
             AS credit_ppm_total,
           CAST(COUNT(*) AS BIGINT) AS n_touches
    FROM r GROUP BY event_type
    """,
)
def attribution_position_based(spark, sf_dir):
    """Position-based (40/20/40) multi-touch attribution: each converting
    user's pre-first-purchase touchpoints share the conversion's credit —
    first 40%, last 40%, middles splitting 20% by integer floor with the
    remainder assigned to the first touch, so every conversion's credits
    sum to EXACTLY 1e6 ppm (allocation invariant pinned in pytest). Touch
    ordering carries the full (ts, event_id) tie-break. One user-shuffle
    for the window trio, then a channel-sized rollup. Complements the
    existing last-touch model with the allocation-with-remainder
    discipline every exact budgeting operator needs."""
    ev = load_events(spark, sf_dir)
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("p_us"))
    )
    touch = (
        ev.join(fp, "user_id")
        .where(
            (F.col("event_type") != "purchase")
            & (F.unix_micros("ts") < F.col("p_us"))
        )
        .select("user_id", "event_type", F.unix_micros("ts").alias("t_us"), "event_id")
    )
    wa = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    wd = Window.partitionBy("user_id").orderBy(F.desc("t_us"), F.desc("event_id"))
    wk = Window.partitionBy("user_id")
    r = touch.select(
        "event_type",
        F.row_number().over(wa).alias("rn_asc"),
        F.row_number().over(wd).alias("rn_desc"),
        F.count(F.lit(1)).over(wk).alias("k"),
    )
    return r.groupBy("event_type").agg(
        F.sum(F.expr(_CREDIT_CASE)).cast("long").alias("credit_ppm_total"),
        F.count(F.lit(1)).cast("long").alias("n_touches"),
    )
