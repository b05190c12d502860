"""Product-analytics batch: staged funnel, weekly cohort retention,
ratio-to-report shares, rank (quantile) normalization, deterministic
weighted mixture sampling, and FK integrity audit.

Reference parity: multi-stage keyed aggregations over the reference's
sync() combine model (/root/reference/src/dist_map.h:147-210); the funnel
and cohort shapes additionally exercise staged self-joins the reference's
single-map model cannot express (SURVEY.md §0).

Determinism: timestamps as epoch-micros BIGINTs; shares in integer ppm by
floor division; the sampling decision is the committed md5-derived hash60
(functions/hashing) against integer ppm thresholds — no RNG anywhere.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t
from hpmr_spark.functions.hashing import hash60, sql_hash60


# ---------------------------------------------------------------------------
# Staged funnel: view → click → purchase, time-ordered per user.
# ---------------------------------------------------------------------------
@register(
    "funnel_view_click_purchase",
    """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    v AS (
      SELECT user_id, MIN(epoch_us(ts)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
                          AND epoch_us(e.ts) >= v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
                          AND epoch_us(e.ts) >= c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS n_users,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_reached_view,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_reached_click,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_reached_purchase
    """,
)
def funnel_view_click_purchase(spark, sf_dir):
    """Ordered conversion funnel: a user reaches stage k only with an
    event at-or-after their stage-(k−1) entry time. Each stage is one
    groupBy(user) agg plus one join back onto the (already user-keyed)
    event stream — every exchange keys on user_id, so at 100 TB the funnel
    is a co-partitioned pipeline with no data-sized state beyond the
    per-user stage timestamps. The four stage counts are 1-row aggregates
    cross-joined at the end (broadcast, no shuffle)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    u = ev.select("user_id").distinct()
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("us").alias("t1")
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("us") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("us") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    return (
        u.agg(F.count(F.lit(1)).alias("n_users"))
        .crossJoin(v.agg(F.count(F.lit(1)).alias("n_reached_view")))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_reached_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_reached_purchase")))
    )


# ---------------------------------------------------------------------------
# Weekly cohort retention matrix.
# ---------------------------------------------------------------------------
@register(
    "cohort_weekly_retention",
    """
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.wk) // 7 AS BIGINT)
             AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM active a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY f.cohort_week, date_diff('day', f.cohort_week, a.wk) // 7
    """,
)
def cohort_weekly_retention(spark, sf_dir):
    """The retention matrix every growth dashboard is built on: users are
    cohorted by first-activity week (Monday-truncated on both engines) and
    counted in each later week they return; the offset is exact integer
    day-difference floor-divided by 7. Two user-keyed aggregations and one
    user-keyed join — the cohort table is users-sized, the activity table
    (user, week)-distinct; both partition cleanly at any event volume."""
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    return (
        active.join(first_seen, "user_id")
        .withColumn(
            "week_offset", F.expr("datediff(wk, cohort_week) div 7").cast("long")
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# Ratio-to-report: each nation's revenue share within its region.
# ---------------------------------------------------------------------------
@register(
    "ratio_to_report_nation_revenue",
    """
    WITH rev AS (
      SELECT r_name, n_name,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
      GROUP BY r_name, n_name
    )
    SELECT r_name, n_name, revenue_cents,
           CAST(revenue_cents * 1000000 //
                SUM(revenue_cents) OVER (PARTITION BY r_name) AS BIGINT)
             AS share_ppm
    FROM rev
    """,
)
def ratio_to_report_nation_revenue(spark, sf_dir):
    """Percent-of-total (RATIO_TO_REPORT) in exact integer ppm: nation
    revenue (integer cents) against its region's total via a window over
    the ALREADY-aggregated 25-nation frame — the denominators never touch
    row-level data. Dim chain region⋈nation broadcast; the fact aggregates
    once on (r_name, n_name). Shares by floor division, non-negative
    operands (Spark div ≡ DuckDB //)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    rev = (
        F.broadcast(r.join(n, n.n_regionkey == r.r_regionkey))
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "revenue_cents"
            )
        )
    )
    return rev.withColumn(
        "share_ppm",
        F.expr(
            "revenue_cents * 1000000 div sum(revenue_cents) over (partition by r_name)"
        ),
    )


# ---------------------------------------------------------------------------
# Rank (quantile) normalization of embeddings, per dimension.
# ---------------------------------------------------------------------------
@register(
    "embedding_rank_normalize",
    """
    WITH e AS (
      SELECT vec_id, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings
    ),
    r AS (
      SELECT vec_id, dim,
             ROW_NUMBER() OVER (PARTITION BY dim ORDER BY v, vec_id) AS rk,
             COUNT(*) OVER (PARTITION BY dim) AS n
      FROM e
    )
    SELECT vec_id,
           CAST(COUNT(*) AS BIGINT) AS n_dims,
           CAST(SUM((rk - 1) * 1000000 // (n - 1)) AS BIGINT)
             AS sum_rank_ppm
    FROM r GROUP BY vec_id
    """,
)
def embedding_rank_normalize(spark, sf_dir):
    """Quantile (rank) normalization — the scale-free feature transform:
    within every dimension, each value maps to its rank position in
    [0, 1e6] ppm (ties broken by vec_id so float equality can't flake),
    then folds back to one row per vector with exact integer sums. One
    posexplode + one per-dim window (dims are independent → natural range
    partitioning at scale) + one groupBy(vec_id). No float ever crosses a
    partial-aggregation boundary."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.posexplode("embedding").alias("dim0", "v")
    ).select("vec_id", (F.col("dim0") + 1).alias("dim"), "v")
    w = Window.partitionBy("dim").orderBy("v", "vec_id")
    r = e.select(
        "vec_id",
        "dim",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("dim")).alias("n"),
    )
    return r.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.sum(F.expr("(rk - 1) * 1000000 div (n - 1)")).alias("sum_rank_ppm"),
    )


# ---------------------------------------------------------------------------
# Deterministic weighted mixture sampling by language.
# ---------------------------------------------------------------------------
_LANG_W = {"en": 500000, "fr": 250000, "es": 125000, "zh": 62500, "de": 31250}

_LANG_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _LANG_W.items())
    + " ELSE 0 END"
)


@register(
    "sample_weighted_by_lang",
    f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN {sql_hash60("CAST(doc_id AS VARCHAR)")}
                          % 1000000 < {_LANG_CASE}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents GROUP BY lang
    """,
)
def sample_weighted_by_lang(spark, sf_dir):
    """Mixture downsampling with per-language keep rates (the data-mixing
    step of corpus assembly): a document survives iff its committed
    md5-derived hash60 lands under the language's ppm threshold — fully
    deterministic, reproducible across engines/partitionings/reruns, and
    embarrassingly parallel (the decision is per-row; only the per-lang
    audit counts shuffle). Swapping weights re-derives a new, equally
    deterministic subsample — no RNG state to coordinate across 1000
    executors."""
    d = _t(spark, sf_dir, "documents")
    kept = (hash60(F.col("doc_id").cast("string")) % 1000000) < F.expr(_LANG_CASE)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit via anti-joins.
# ---------------------------------------------------------------------------
@register(
    "fk_integrity_audit",
    """
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        AS n_lineitem_orphans,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        AS n_order_orphans,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
        WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
        AS n_customer_orphans
    """,
)
def fk_integrity_audit(spark, sf_dir):
    """Data-quality gate: count FK orphans along the lineitem→orders→
    customer→nation chain with LEFT ANTI joins (null-safe — keys here are
    non-null; notin_null_aware_customers covers the NULL-semantics case).
    Each anti-join keys on the FK and the dimension sides broadcast where
    small; the three audit counts are 1-row frames cross-joined. This is
    the pre-ingest validation every pipeline runs before publishing a
    snapshot."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    a1 = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n_lineitem_orphans")
    )
    a2 = o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n_order_orphans")
    )
    a3 = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n_customer_orphans")
    )
    return a1.crossJoin(a2).crossJoin(a3)


@register(
    "event_rate_anomaly_hours",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hr,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY date_trunc('hour', ts)
    ),
    m AS (
      SELECT hr, x,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(SUM(x) OVER w AS BIGINT) AS s,
             CAST(SUM(x * x) OVER w AS BIGINT) AS ss
      FROM hourly
      WINDOW w AS (ORDER BY hr ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT hr, x, n, s, ss,
           n >= 12 AND
           (n * x - s) * (n * x - s) > 9 * (n * ss - s * s) AS is_anomaly
    FROM m
    """,
)
def event_rate_anomaly_hours(spark, sf_dir):
    """Event-rate anomaly detection with ZERO floating point: each hour's
    count is tested against its trailing-24h baseline with the z²-test
    rewritten as integer cross-multiplication — z² > 9 (|z| > 3σ) ⟺
    (n·x − Σ)² > 9·(n·Σx² − Σ²) — over exact BIGINT window moments, so the
    flag is bit-deterministic on every engine and partitioning (a float
    z-score would flake at the boundary). Warm-up hours (n < 12) never
    flag. The hourly rollup is the only data-sized stage; the trailing
    ROWS frame is a BANDED self-join on the two-pass bucketed row_number
    (each row probes its own and the previous 24-wide rn bucket — linear,
    parallel, no window) — the monitoring shape for any 100 TB firehose."""
    from hpmr_spark.functions.ranking import global_row_number

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("x")
    )
    r = global_row_number(
        hourly.withColumn("hr_num", F.unix_micros(F.col("hr").cast("timestamp"))),
        ["hr_num"],
        out="rn",
    )
    # banded interval join: b.rn in [a.rn-24, a.rn-1] implies
    # floor(b.rn/24) in {floor(a.rn/24), floor(a.rn/24)-1}
    probe = r.select(
        "hr",
        "x",
        "rn",
        F.explode(
            F.array(F.floor(F.col("rn") / 24), F.floor(F.col("rn") / 24) - 1)
        ).alias("bkt"),
    )
    base = r.select(
        F.col("rn").alias("brn"),
        F.col("x").alias("bx"),
        F.floor(F.col("rn") / 24).alias("bkt"),
    )
    cand = (
        probe.join(base, ["bkt"])
        .where((F.col("brn") >= F.col("rn") - 24) & (F.col("brn") <= F.col("rn") - 1))
        .groupBy("hr")
        .agg(
            F.count("bx").cast("long").alias("_n"),
            F.sum("bx").cast("long").alias("_s"),
            F.sum(F.col("bx") * F.col("bx")).cast("long").alias("_ss"),
        )
    )
    # left-join the window moments back so warm-up hours with an empty
    # frame keep the window semantics exactly: n = 0, s/ss NULL
    m = r.select("hr", "x").join(cand, "hr", "left").select(
        "hr",
        "x",
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n"),
        F.col("_s").alias("s"),
        F.col("_ss").alias("ss"),
    )
    return m.select(
        "hr", "x", "n", "s", "ss",
        (
            (F.col("n") >= 12)
            & (
                (F.col("n") * F.col("x") - F.col("s"))
                * (F.col("n") * F.col("x") - F.col("s"))
                > 9 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
            )
        ).alias("is_anomaly"),
    )


@register(
    "ab_test_metrics",
    f"""
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN ({sql_hash60("CAST(user_id AS VARCHAR)")}) % 2 = 0
                  THEN 'A' ELSE 'B' END AS variant,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS purchase_cents
      FROM events GROUP BY user_id
    )
    SELECT variant,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST(SUM(converted) * 1000000 // COUNT(*) AS BIGINT)
             AS conversion_ppm,
           CAST(SUM(purchase_cents) AS BIGINT) AS revenue_cents
    FROM assigned GROUP BY variant
    """,
)
def ab_test_metrics(spark, sf_dir):
    """Experimentation readout: users deterministically bucketed into A/B
    by the committed hash60 (stable across sessions, engines, reruns — the
    assignment IS the hash, nothing stored), then per-variant conversion
    (integer ppm) and revenue (integer cents). One user-keyed aggregation
    then a 2-row rollup. The same hash-bucket trick powers holdouts and
    gradual rollouts at any user-base size with zero assignment state."""
    ev = _t(spark, sf_dir, "events")
    assigned = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        ),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("purchase_cents"),
    ).withColumn(
        "variant",
        F.when(hash60(F.col("user_id").cast("string")) % 2 == 0, "A").otherwise("B"),
    )
    return assigned.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
        F.expr("sum(converted) * 1000000 div count(1)").alias("conversion_ppm"),
        F.sum("purchase_cents").alias("revenue_cents"),
    )


@register(
    "funnel_time_to_convert",
    """
    WITH v AS (
      SELECT user_id, MIN(epoch_us(ts)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
      FROM events e JOIN v ON e.user_id = v.user_id
                          AND epoch_us(e.ts) >= v.t1
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    d AS (
      SELECT p.user_id, p.t3 - v.t1 AS delta_us,
             ROW_NUMBER() OVER (ORDER BY p.t3 - v.t1, p.user_id) AS rn,
             COUNT(*) OVER () AS n
      FROM p JOIN v ON p.user_id = v.user_id
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
           CAST(MIN(delta_us) AS BIGINT) AS min_us,
           CAST(MAX(delta_us) AS BIGINT) AS max_us,
           CAST(MAX(CASE WHEN rn * 2 = n + (n % 2) THEN delta_us END)
             AS BIGINT) AS median_us
    FROM d
    """,
)
def funnel_time_to_convert(spark, sf_dir):
    """Time-to-convert distribution (first view → first purchase at-or-
    after it): count, min, max, and the EXACT lower median selected by
    integer rank arithmetic (rn·2 = n + n%2 picks rank ⌈n/2⌉ — no float
    percentile, no approx sketch; ties broken by user_id). The deltas
    frame is converting-users-sized — fact-scale at 100 TB — so the rank is
    the two-pass bucketed row_number (functions/ranking.py) with a
    broadcast total, not a single-partition window; everything upstream
    keys on user_id."""
    from hpmr_spark.functions.ranking import global_row_number
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("us").alias("t1")
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("us") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    deltas = p.join(v, "user_id").select(
        "user_id", (F.col("t3") - F.col("t1")).alias("delta_us")
    )
    t = deltas.agg(F.count(F.lit(1)).alias("n"))
    d = global_row_number(deltas, ["delta_us", "user_id"], out="rn").crossJoin(
        F.broadcast(t)
    )
    return d.agg(
        F.max("n").alias("n_converted"),
        F.min("delta_us").alias("min_us"),
        F.max("delta_us").alias("max_us"),
        F.max(
            F.when(F.col("rn") * 2 == F.col("n") + F.col("n") % 2, F.col("delta_us"))
        ).alias("median_us"),
    )


@register(
    "debounce_events_5s",
    """
    WITH l AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id, event_type
                     ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 5000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM l GROUP BY event_type
    """,
)
def debounce_events_5s(spark, sf_dir):
    """Debounce filter — the duplicate-click suppressor: an event survives
    when ≥5 s (exact integer micros) passed since the SAME user's previous
    event of the same type (lag-based, the standard stateless debounce; a
    chained/stateful debounce is sessionize with gap=5s). One window pass
    keyed (user, type), then a type-level rollup."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    l = ev.select("event_type", gap.alias("gap_us"))
    return l.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("gap_us").isNull() | (F.col("gap_us") > 5_000_000), 1)
            .otherwise(0)
        ).alias("n_kept"),
    )
