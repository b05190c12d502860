"""Causal / decision-analytics batch (round 4): per-group OLS trend
slopes, inverse-propensity-score off-policy evaluation, and
difference-in-differences uplift — the estimators an experimentation
platform computes after the raw statistics.

Disciplines: moments accumulate in DECIMAL(38,0) (≡ HUGEINT — exact at
any scale), each final statistic is ONE double expression over the exact
moments (identical text both engines — bit-equal, the moment-parity
commitment); decision quantities (IPS value, DiD) stay in floor-divided
integer micro-units end to end.

Reference parity: extends the engine surface beyond the reference's
kv kernel (/root/reference/src/hpmr.h:1-10) along the analytics axis
the brief makes first-class; every aggregation follows the DistMap
combine-on-insert ≡ map-side partial agg mapping
(/root/reference/src/bare_map.h:55-57).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.hashing import hash60, sql_hash60
from hpmr_spark.sources.tables import load_events

# ---------------------------------------------------------------------------
# Per-segment OLS trend: revenue vs order date.
# ---------------------------------------------------------------------------
@register(
    "grouped_ols_trend",
    """
    WITH b AS (
      SELECT c.c_mktsegment AS segment,
             CAST(date_diff('day', DATE '1992-01-01', o.o_orderdate) AS BIGINT)
               AS x,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    m AS (
      SELECT segment,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM b GROUP BY segment
    )
    SELECT segment, n,
           CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS slope_num,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             AS slope_cents_per_day
    FROM m
    """,
)
def grouped_ols_trend(spark, sf_dir):
    """Per-segment OLS trend of order value over time:
    slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) with x = days since
    1992-01-01 (exact integer) and y = integer cents. Moments accumulate
    in int128 (DECIMAL(38,0) ≡ HUGEINT — Σxy passes int64 in the first
    few billion rows), then the slope is ONE double expression over the
    exact moments — bit-identical both engines (the moment-parity
    commitment; int128→double casts are correctly rounded on both). The
    per-group trend report every growth dashboard opens with."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    b = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    m = b.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0))")).alias("sx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0))")).alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
    )
    return m.select(
        "segment",
        "n",
        F.expr(
            "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
        ).alias("slope_num"),
        F.expr(
            "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
            " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        ).alias("slope_cents_per_day"),
    )


# ---------------------------------------------------------------------------
# Inverse-propensity-score off-policy evaluation.
# ---------------------------------------------------------------------------
_ARMS = "('view', 'click', 'purchase', 'signup', 'error')"


@register(
    "ips_offpolicy_value",
    f"""
    WITH lg AS (
      SELECT user_id, event_type AS logged_action,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END AS r_cents,
             CASE CAST({sql_hash60("'pi:' || CAST(user_id AS VARCHAR)")} % 5
                  AS BIGINT)
               WHEN 0 THEN 'view' WHEN 1 THEN 'click' WHEN 2 THEN 'purchase'
               WHEN 3 THEN 'signup' ELSE 'error' END AS target_action
      FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN logged_action = target_action THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matched,
           CAST(CAST(SUM(r_cents) AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT)
             AS logging_value_microcents,
           CAST(CAST(SUM(CASE WHEN logged_action = target_action
                         THEN 5 * r_cents ELSE 0 END) AS HUGEINT) * 1000000
                // COUNT(*) AS BIGINT) AS ips_value_microcents
    FROM lg
    """,
)
def ips_offpolicy_value(spark, sf_dir):
    """Inverse-propensity-score off-policy evaluation: estimate the value
    of a NEW deterministic policy π(user) = committed-hash arm from logs
    collected under a uniform logging policy (p = 1/5 per arm, so the
    importance weight is EXACTLY 5 — the estimator stays in integer
    arithmetic: V̂_IPS = Σ 5·r·𝟙[a=π(x)]·10⁶ // n micro-cents). Reward =
    purchase value. Emits the logging policy's average value alongside —
    the lift a bandit platform reads before deploying π. One scan, one
    aggregate; the hash-derived target policy is reproducible
    cross-engine (no RNG)."""
    ev = load_events(spark, sf_dir)
    arms = ["view", "click", "purchase", "signup", "error"]
    arm_expr = F.element_at(
        F.array(*[F.lit(a) for a in arms]),
        (
            hash60(F.concat(F.lit("pi:"), F.col("user_id").cast("string"))) % 5
        ).cast("int")
        + 1,
    )
    lg = ev.select(
        F.col("event_type").alias("logged_action"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("long"),
        )
        .otherwise(0)
        .alias("r_cents"),
        arm_expr.alias("target_action"),
    )
    return lg.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("logged_action") == F.col("target_action"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_matched"),
        F.expr(
            "CAST(CAST(SUM(r_cents) AS DECIMAL(38,0)) * 1000000 div COUNT(1) AS BIGINT)"
        ).alias("logging_value_microcents"),
        F.expr(
            "CAST(CAST(SUM(CASE WHEN logged_action = target_action"
            " THEN 5 * r_cents ELSE 0 END) AS DECIMAL(38,0)) * 1000000"
            " div COUNT(1) AS BIGINT)"
        ).alias("ips_value_microcents"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences uplift by segment.
# ---------------------------------------------------------------------------
@register(
    "did_uplift_segments",
    """
    WITH t0 AS (SELECT CAST(epoch_us(MIN(ts)) AS BIGINT) AS t0 FROM events),
    e AS (
      SELECT ev.user_id,
             CAST(CASE WHEN epoch_us(ev.ts) - t0.t0 >= 1296000000000
                  THEN 1 ELSE 0 END AS BIGINT) AS period,
             CAST(ev.user_id % 2 AS BIGINT) AS treated,
             CASE WHEN ev.event_type = 'purchase'
                  THEN CAST(ROUND(ev.value * 100) AS BIGINT) ELSE 0 END
               AS r_cents
      FROM events ev, t0
    ),
    j AS (
      SELECT c.c_mktsegment AS segment, e.period, e.treated,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(e.r_cents) AS BIGINT) AS cents
      FROM e JOIN customer c ON c.c_custkey = e.user_id
      GROUP BY c.c_mktsegment, e.period, e.treated
    ),
    p AS (
      SELECT segment,
             CAST(SUM(CASE WHEN treated = 1 AND period = 0 THEN CAST(cents AS HUGEINT) * 1000000 END)
                  // SUM(CASE WHEN treated = 1 AND period = 0 THEN n END) AS BIGINT)
               AS t_pre,
             CAST(SUM(CASE WHEN treated = 1 AND period = 1 THEN CAST(cents AS HUGEINT) * 1000000 END)
                  // SUM(CASE WHEN treated = 1 AND period = 1 THEN n END) AS BIGINT)
               AS t_post,
             CAST(SUM(CASE WHEN treated = 0 AND period = 0 THEN CAST(cents AS HUGEINT) * 1000000 END)
                  // SUM(CASE WHEN treated = 0 AND period = 0 THEN n END) AS BIGINT)
               AS c_pre,
             CAST(SUM(CASE WHEN treated = 0 AND period = 1 THEN CAST(cents AS HUGEINT) * 1000000 END)
                  // SUM(CASE WHEN treated = 0 AND period = 1 THEN n END) AS BIGINT)
               AS c_post
      FROM j GROUP BY segment
    )
    SELECT segment, t_pre, t_post, c_pre, c_post,
           CAST((t_post - t_pre) - (c_post - c_pre) AS BIGINT)
             AS did_microcents
    FROM p
    """,
)
def did_uplift_segments(spark, sf_dir):
    """Difference-in-differences uplift per segment: users split into
    deterministic treatment/control halves (user_id parity), time split
    at day 15 of the event window (exact integer micros off the corpus
    min — both engines derive the identical boundary), per-cell mean
    event revenue in floor-divided integer micro-cents, and
    DiD = (post−pre)_T − (post−pre)_C. The parallel-trends estimator an
    experimentation platform reports when a holdout exists but
    randomization happened at a coarser grain. All four cell means come
    from ONE grouped frame (no per-cell scans)."""
    ev = load_events(spark, sf_dir)
    c = _t(spark, sf_dir, "customer")
    t0 = ev.agg(F.unix_micros(F.min("ts")).alias("t0"))
    e = ev.crossJoin(F.broadcast(t0)).select(
        "user_id",
        F.when(
            F.unix_micros(F.col("ts")) - F.col("t0") >= 1_296_000_000_000, 1
        )
        .otherwise(0)
        .cast("long")
        .alias("period"),
        (F.col("user_id") % 2).cast("long").alias("treated"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("long"),
        )
        .otherwise(0)
        .alias("r_cents"),
    )
    j = (
        e.join(c, e["user_id"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"), "period", "treated"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("r_cents").cast("long").alias("cents"),
        )
    )

    def cell(tr, pe, out):
        return F.expr(
            f"CAST(SUM(CASE WHEN treated = {tr} AND period = {pe}"
            f" THEN CAST(cents AS DECIMAL(38,0)) * 1000000 END)"
            f" div SUM(CASE WHEN treated = {tr} AND period = {pe} THEN n END)"
            f" AS BIGINT)"
        ).alias(out)

    p = j.groupBy("segment").agg(
        cell(1, 0, "t_pre"),
        cell(1, 1, "t_post"),
        cell(0, 0, "c_pre"),
        cell(0, 1, "c_post"),
    )
    return p.select(
        "segment",
        "t_pre",
        "t_post",
        "c_pre",
        "c_post",
        ((F.col("t_post") - F.col("t_pre")) - (F.col("c_post") - F.col("c_pre")))
        .cast("long")
        .alias("did_microcents"),
    )
