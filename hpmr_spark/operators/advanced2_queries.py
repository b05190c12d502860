"""Round-2 closing batch: substring-passage dedup, interval-overlap join,
Markov transitions, equi-width histogram, nucleus vocab truncation, exact
dyadic EWMA, and percentile winsorization.

Reference parity: all are keyed combine/shuffle workloads in the reference's
model (/root/reference/src/dist_map.h:147-210 sync + reducer.h merges); the
LLM-pipeline entries (substring dedup, nucleus vocab) follow the brief's
training-data-pipeline extension surface.

Determinism discipline (CLAUDE.md): money/values as integer cents, counts and
weighted sums as BIGINT, integer floor division only on non-negative
operands (`div` ≡ `//` there), any final double produced by ONE expression
over exact integer moments; every ordering fully tie-broken.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t
from hpmr_spark.functions.hashing import hash60, sql_hash60
from hpmr_spark.operators.temporal import sessionize
from hpmr_spark.sources.tables import load_events

# ---------------------------------------------------------------------------
# Substring-passage dedup (Lee et al., "Deduplicating Training Data Makes
# Language Models Better"): positional word 15-grams, a passage is duplicated
# if its fingerprint occurs more than once corpus-wide.
# ---------------------------------------------------------------------------
N_SUB = 15

_SUBSTRING_SQL = f"""
    WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_transform(range(len(t) - {N_SUB - 1}),
                        _gi -> array_to_string(list_slice(t, _gi + 1, _gi + {N_SUB}), ' '))) AS gram
          FROM tk WHERE len(t) >= {N_SUB}),
    f AS (SELECT doc_id, {sql_hash60('gram')} AS fp FROM g),
    a AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY fp) AS cnt FROM f)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
           CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
                AS BIGINT) AS dup_ppm
    FROM a GROUP BY doc_id
"""


@register("dedup_substring_ngram", _SUBSTRING_SQL)
def dedup_substring_ngram(spark, sf_dir):
    """Duplicated-passage profile per document: the fraction of a doc's
    positional word 15-grams whose 60-bit fingerprint appears >1 time in the
    whole corpus. Plan: only (doc_id, fp) pairs shuffle (16 bytes/gram —
    the text itself never moves); one window count on fp + one doc_id agg.
    At 100 TB both shuffles hash-partition on high-cardinality uniform keys
    (fingerprints / doc ids), so the plan is skew-free by construction."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0))
    wt = docs.select("doc_id", toks.alias("toks")).where(F.size("toks") >= N_SUB)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - (N_SUB - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at("toks", (i + k).cast("int")) for k in range(N_SUB)]
        ),
    )
    g = wt.select("doc_id", F.explode(grams).alias("gram")).select(
        "doc_id", hash60(F.col("gram")).alias("fp")
    )
    ann = g.withColumn("cnt", F.count(F.lit(1)).over(Window.partitionBy("fp")))
    dup = F.sum((F.col("cnt") > 1).cast("long"))
    return (
        ann.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"), dup.alias("n_dup_grams"))
        .withColumn("dup_ppm", F.expr("n_dup_grams * 1000000 div n_grams"))
    )


# ---------------------------------------------------------------------------
# Interval-overlap join (range join): which pairs of users have concurrently
# active sessions, and for how long in total?
# ---------------------------------------------------------------------------
_HOUR_US = 3_600_000_000

_SESS_IV_CTE = """
    l AS (SELECT e.*, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
          FROM events e),
    s AS (SELECT user_id, ts,
                 SUM(CASE WHEN pts IS NULL OR epoch_us(ts) - epoch_us(pts) > 1800000000
                     THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM l),
    iv AS (SELECT user_id, session_seq,
                  epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) AS e_us
           FROM s GROUP BY user_id, session_seq)
"""

_OVERLAP_SQL = f"""
    WITH {_SESS_IV_CTE}
    SELECT a.user_id AS u1, b.user_id AS u2,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps,
           CAST(SUM(least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us)) AS BIGINT)
             AS overlap_us
    FROM iv a JOIN iv b
      ON a.user_id < b.user_id AND a.s_us <= b.e_us AND b.s_us <= a.e_us
    GROUP BY u1, u2
"""


@register("session_overlap_pairs", _OVERLAP_SQL)
def session_overlap_pairs(spark, sf_dir):
    """Scale-correct interval-overlap self-join. A naive overlap predicate is
    a nested-loop O(n²) plan; instead each session interval is exploded into
    the hour buckets it spans and pairs equi-join on the bucket — Catalyst
    gets a hash join, and the duplicate-bucket problem is solved exactly by
    keeping a pair only in the bucket containing the overlap's start
    (greatest of the two starts), which both intervals provably span. The
    oracle runs the naive predicate (DuckDB IEJoin), proving the bucketed
    plan computes the identical relation."""
    ev = load_events(spark, sf_dir)
    s = sessionize(ev.select("event_id", "user_id", "ts"), "user_id", "ts", 1800)
    iv = s.groupBy("user_id", "session_seq").agg(
        F.unix_micros(F.min("ts")).alias("s_us"),
        F.unix_micros(F.max("ts")).alias("e_us"),
    )
    b = iv.withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.expr(f"s_us div {_HOUR_US}"), F.expr(f"e_us div {_HOUR_US}")
            )
        ),
    )
    a, c = b.alias("a"), b.alias("b")
    pairs = a.join(
        c,
        [
            F.col("a.bkt") == F.col("b.bkt"),
            F.col("a.user_id") < F.col("b.user_id"),
            F.col("a.s_us") <= F.col("b.e_us"),
            F.col("b.s_us") <= F.col("a.e_us"),
            F.col("a.bkt")
            == F.expr(f"greatest(a.s_us, b.s_us) div {_HOUR_US}"),
        ],
    )
    return (
        pairs.select(
            F.col("a.user_id").alias("u1"),
            F.col("b.user_id").alias("u2"),
            (
                F.least(F.col("a.e_us"), F.col("b.e_us"))
                - F.greatest(F.col("a.s_us"), F.col("b.s_us"))
            ).alias("ov"),
        )
        .groupBy("u1", "u2")
        .agg(F.count(F.lit(1)).alias("n_overlaps"), F.sum("ov").alias("overlap_us"))
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences.
# ---------------------------------------------------------------------------
_MARKOV_SQL = """
    WITH seq AS (SELECT user_id, event_type,
                        lag(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS prev
                 FROM events),
    c AS (SELECT prev, event_type AS cur, CAST(COUNT(*) AS BIGINT) AS n
          FROM seq WHERE prev IS NOT NULL GROUP BY prev, cur)
    SELECT prev, cur, n,
           CAST(n * 1000000 // CAST(SUM(n) OVER (PARTITION BY prev) AS BIGINT)
                AS BIGINT) AS p_ppm
    FROM c
"""


@register("markov_transitions_ppm", _MARKOV_SQL)
def markov_transitions_ppm(spark, sf_dir):
    """First-order Markov transition counts + probabilities (integer ppm,
    floor division on positive counts) from per-user event-type sequences.
    One window shuffle on user_id, one agg shuffle on (prev, cur); the ppm
    window runs over the tiny grouped result (|event types|² rows)."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("prev"), F.col("event_type").alias("cur")
    ).where(F.col("prev").isNotNull())
    c = seq.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy("prev"))
    return (
        c.withColumn("_tot", total)
        .withColumn("p_ppm", F.expr("n * 1000000 div _tot"))
        .drop("_tot")
    )


# ---------------------------------------------------------------------------
# Equi-width histogram with data-driven bounds (20 buckets).
# ---------------------------------------------------------------------------
_EQWIDTH_SQL = """
    WITH c AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
    b AS (SELECT MIN(cents) AS mn, MAX(cents) AS mx FROM c),
    p AS (SELECT cents, mn, (mx - mn) // 20 + 1 AS w FROM c, b)
    SELECT CAST((cents - mn) // w AS BIGINT) AS bucket,
           CAST(MIN(mn + ((cents - mn) // w) * w) AS BIGINT) AS lo_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM p GROUP BY bucket
"""


@register("equi_width_histogram_prices", _EQWIDTH_SQL)
def equi_width_histogram_prices(spark, sf_dir):
    """Equi-width 20-bucket histogram of order totals with bounds taken from
    the data: the 1-row (min, max) aggregate is broadcast onto the scan, so
    the whole query is two passes with no wide shuffle (the final agg has 20
    groups). Width = (mx-mn)//20+1 guarantees bucket ∈ [0, 19] exactly; all
    arithmetic on non-negative integer cents."""
    o = _t(spark, sf_dir, "orders")
    c = o.select(F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    b = c.agg(F.min("cents").alias("mn"), F.max("cents").alias("mx"))
    p = c.crossJoin(F.broadcast(b)).withColumn("w", F.expr("(mx - mn) div 20 + 1"))
    return (
        p.withColumn("bucket", F.expr("(cents - mn) div w"))
        .groupBy("bucket")
        .agg(
            F.min(F.expr("mn + ((cents - mn) div w) * w")).alias("lo_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Nucleus (top-p) vocabulary truncation: smallest prefix of the
# frequency-sorted vocab covering ≥90% of token mass.
# ---------------------------------------------------------------------------
_NUCLEUS_SQL = """
    WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
                 FROM documents),
    c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
    r AS (SELECT token, n,
                 row_number() OVER (ORDER BY n DESC, token) AS rnk,
                 CAST(SUM(n) OVER (ORDER BY n DESC, token
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM c)
    SELECT token, n, CAST(rnk AS BIGINT) AS rnk
    FROM r, t WHERE 10 * (cum - n) < 9 * total
"""


@register("vocab_nucleus_topp", _NUCLEUS_SQL)
def vocab_nucleus_topp(spark, sf_dir):
    """Top-p (p=0.9) nucleus truncation of the corpus vocabulary: keep a
    token iff the mass strictly before it (cum − n) is under 90% of total —
    integer cross-multiplication 10·(cum−n) < 9·total, no float threshold.
    The rank and running mass over the vocabulary frame (Heaps-law large at
    100 TB) are the two-pass bucketed forms (functions/ranking.py,
    negated-count leading key) — no single-partition window; the oracle
    keeps the window form."""
    from hpmr_spark.functions.ranking import global_row_number, global_running

    docs = _t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0))
    c = (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.agg(F.sum("n").alias("total"))
    neg = c.withColumn("neg_n", -F.col("n"))
    r = global_row_number(neg, ["neg_n", "token"], out="rnk")
    r = global_running(r, ["neg_n", "token"], "n", kind="sum", out="cum")
    return (
        r.crossJoin(F.broadcast(t))
        .where(F.expr("10 * (cum - n) < 9 * total"))
        .select("token", "n", F.col("rnk").cast("long").alias("rnk"))
    )


# ---------------------------------------------------------------------------
# Exact dyadic EWMA (α = 1/2) over each user's trailing 16 events.
# ---------------------------------------------------------------------------
_EWMA_SQL = """
    WITH c AS (SELECT user_id, ts, event_id,
                      CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events),
    a AS (SELECT user_id,
                 list(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS arr,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM c),
    m AS (SELECT user_id, arr,
                 CAST(list_sum(list_transform(range(len(arr)),
                      _wp -> arr[_wp + 1] * ((CAST(1 AS BIGINT) << _wp)))) AS BIGINT)
                   AS num,
                 (CAST(1 AS BIGINT) << len(arr)) - 1 AS den
          FROM a WHERE rn = 1)
    SELECT user_id, CAST(len(arr) AS BIGINT) AS n_recent,
           CAST(num AS BIGINT) AS num, CAST(den AS BIGINT) AS den,
           CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS ewma_cents
    FROM m
"""


@register("ewma_user_value_exact", _EWMA_SQL)
def ewma_user_value_exact(spark, sf_dir):
    """Exponentially-weighted moving average with dyadic weights (newest
    event weight 2^(m-1), …, oldest 2^0 over the trailing m ≤ 16 events),
    reported at each user's latest event. The weighted sum is EXACT BIGINT
    arithmetic (cents·2^p ≤ 1e5·2^15 ≪ 2^63); the only float is one final
    num/den double division — identical expression text on both engines, so
    the hash matches bit-for-bit (exact-moment discipline). One shuffle on
    user_id serves both windows."""
    ev = load_events(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-15, 0)
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    a = ev.select(
        "user_id",
        F.collect_list(cents).over(wf).alias("arr"),
        F.row_number().over(wr).alias("rn"),
    ).where(F.col("rn") == 1)
    return a.select(
        "user_id",
        F.size("arr").cast("long").alias("n_recent"),
        F.expr(
            "aggregate(zip_with(arr,"
            " transform(sequence(0, size(arr) - 1),"
            "           p -> shiftleft(cast(1 as bigint), p)),"
            " (x, wgt) -> x * wgt), cast(0 as bigint), (acc, v) -> acc + v)"
        ).alias("num"),
        F.expr("shiftleft(cast(1 as bigint), size(arr)) - 1").alias("den"),
    ).withColumn(
        "ewma_cents", F.col("num").cast("double") / F.col("den").cast("double")
    )


# ---------------------------------------------------------------------------
# Percentile winsorization: clip order totals to [p01, p99] by exact rank
# selection, then aggregate per priority.
# ---------------------------------------------------------------------------
_WINSOR_SQL = """
    WITH c AS (SELECT o_orderpriority,
                      CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
    d AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM c GROUP BY cents),
    cum AS (SELECT cents,
                   CAST(SUM(cnt) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cm
            FROM d),
    lo AS (SELECT MIN(cents) AS lo_cents FROM cum, t WHERE cm >= (n + 99) // 100),
    hi AS (SELECT MIN(cents) AS hi_cents FROM cum, t WHERE cm >= (99 * n + 99) // 100)
    SELECT o_orderpriority,
           CAST(SUM(least(greatest(cents, lo_cents), hi_cents)) AS BIGINT)
             AS clipped_sum_cents,
           CAST(SUM(CASE WHEN cents < lo_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
           CAST(SUM(CASE WHEN cents > hi_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM c, lo, hi GROUP BY o_orderpriority
"""


@register("winsorize_clip_stats", _WINSOR_SQL)
def winsorize_clip_stats(spark, sf_dir):
    """Winsorized per-priority totals: exact p01/p99 as rank-selected values
    (k-th smallest = least cents whose cumulative count ≥ k, k = ⌈n/100⌉ /
    ⌈99n/100⌉ via integer ceil division), clip every row into [p01, p99],
    aggregate in integer cents. The cumulative count over the GROUPED
    distinct-value frame is the two-pass value-bucketed prefix sum
    (functions/ranking.global_running) — near-unique prices make that frame
    row-scale, so the scale-safe form matters; no single-partition window
    (sketch_bounded_checks holds the approx-percentile alternative)."""
    from hpmr_spark.functions.ranking import global_running

    o = _t(spark, sf_dir, "orders")
    c = o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    t = c.agg(F.count(F.lit(1)).alias("n"))
    d = c.groupBy("cents").agg(F.count(F.lit(1)).alias("cnt"))
    cum = global_running(d, ["cents"], "cnt", kind="sum", strict=False, out="cm")
    cum_t = cum.crossJoin(F.broadcast(t))
    lo = cum_t.where(F.expr("cm >= (n + 99) div 100")).agg(
        F.min("cents").alias("lo_cents")
    )
    hi = cum_t.where(F.expr("cm >= (99 * n + 99) div 100")).agg(
        F.min("cents").alias("hi_cents")
    )
    clipped = c.crossJoin(F.broadcast(lo)).crossJoin(F.broadcast(hi))
    return clipped.groupBy("o_orderpriority").agg(
        F.sum(F.least(F.greatest("cents", "lo_cents"), "hi_cents")).alias(
            "clipped_sum_cents"
        ),
        F.sum((F.col("cents") < F.col("lo_cents")).cast("long")).alias("n_clip_lo"),
        F.sum((F.col("cents") > F.col("hi_cents")).cast("long")).alias("n_clip_hi"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# DAU / WAU / MAU active-user rollup with stickiness.
# ---------------------------------------------------------------------------
_DAU_SQL = """
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    days AS (SELECT DISTINCT d FROM ud),
    dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d),
    wau AS (SELECT dy.d, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
            FROM days dy JOIN ud u ON u.d BETWEEN dy.d - 6 AND dy.d GROUP BY dy.d),
    mau AS (SELECT dy.d, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau
            FROM days dy JOIN ud u ON u.d BETWEEN dy.d - 29 AND dy.d GROUP BY dy.d)
    SELECT dau.d AS day, dau.dau, wau.wau, mau.mau,
           CAST(dau.dau * 1000000 // mau.mau AS BIGINT) AS stickiness_ppm
    FROM dau JOIN wau ON dau.d = wau.d JOIN mau ON dau.d = mau.d
"""


@register("dau_wau_mau_rollup", _DAU_SQL)
def dau_wau_mau_rollup(spark, sf_dir):
    """Daily/weekly/monthly active users + DAU/MAU stickiness (integer ppm).
    Spark windows cannot COUNT(DISTINCT) over a RANGE frame, and a per-day
    non-equi join is quadratic — so each (user, day) row is EXPLODED into
    the ≤7/≤30 future days it keeps the user active in, turning the rolling
    distinct into a plain groupBy(day) countDistinct. 30× row amplification
    of the already-deduped (user, day) frame — the scale-correct shape (the
    oracle runs the naive range join instead, proving equivalence)."""
    ev = load_events(spark, sf_dir)
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    days = ud.select("d").distinct()
    dau = ud.groupBy(F.col("d").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )

    def rolling(n_days, alias):
        ex = ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("d"), F.date_add(F.col("d"), n_days - 1))
            ).alias("day"),
        )
        return (
            ex.join(days.withColumnRenamed("d", "day"), "day")
            .groupBy("day")
            .agg(F.countDistinct("user_id").alias(alias))
        )

    out = (
        dau.join(rolling(7, "wau"), "day")
        .join(rolling(30, "mau"), "day")
        .withColumn("stickiness_ppm", F.expr("dau * 1000000 div mau"))
    )
    return out


# ---------------------------------------------------------------------------
# Power-of-2 inter-event latency histogram.
# ---------------------------------------------------------------------------
_LATENCY_SQL = """
    WITH g AS (SELECT epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                            ORDER BY ts, event_id)) AS gap_us
               FROM events)
    SELECT CAST(length(bin(gap_us)) - 1 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM g WHERE gap_us IS NOT NULL GROUP BY bucket
"""


@register("latency_histogram_pow2", _LATENCY_SQL)
def latency_histogram_pow2(spark, sf_dir):
    """Log₂-scale histogram of inter-event gaps: bucket = ⌊log₂(gap_µs)⌋
    computed EXACTLY as length(bin(gap)) − 1 (minimal binary representation
    — identical across engines, no float log). One user_id window shuffle +
    a ~64-group agg; the standard latency-profile operator shape."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
        "gap_us"
    )
    g = ev.select(gap).where(F.col("gap_us").isNotNull())
    return g.groupBy(
        (F.length(F.bin(F.col("gap_us"))) - 1).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


# ---------------------------------------------------------------------------
# Last-touch attribution: purchases credited to the most recent prior
# non-purchase event of the same user.
# ---------------------------------------------------------------------------
_ATTR_SQL = """
    WITH e AS (SELECT user_id, ts, event_id, event_type,
                      CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events),
    w AS (SELECT *,
                 COALESCE(last_value(CASE WHEN event_type <> 'purchase'
                                     THEN event_type END IGNORE NULLS)
                          OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          '(none)') AS touch
          FROM e)
    SELECT touch, CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS attributed_cents
    FROM w WHERE event_type = 'purchase' GROUP BY touch
"""


@register("attribution_last_touch", _ATTR_SQL)
def attribution_last_touch(spark, sf_dir):
    """Last-touch revenue attribution: each purchase credits the user's most
    recent preceding non-purchase event type (IGNORE NULLS last over a
    1-PRECEDING rows frame — the verified cross-engine LOCF idiom), '(none)'
    when the purchase is the user's first event. Integer-cents sums."""
    ev = load_events(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.coalesce(
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
        F.lit("(none)"),
    )
    return (
        ev.select("user_id", "ts", "event_id", "event_type", cents.alias("cents"))
        .withColumn("touch", touch)
        .where(F.col("event_type") == "purchase")
        .groupBy("touch")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("attributed_cents"),
        )
    )
