"""Order statistics at scale — the round-3 family built on
functions/ranking.py's two-pass bucketed primitives (global_row_number /
global_running / exact_ntile): Gini coefficient, Lorenz curve, two-sample
Kolmogorov-Smirnov, Spearman rank correlation (tie-corrected average
ranks), trimmed mean, a percentile lookup table, Cohen's kappa, and
stratified CV-fold assignment.

These are the distribution-shape and agreement statistics a training-data
pipeline reports per corpus snapshot (inequality of source contribution,
drift between shards, rater agreement, split hygiene) — computed with the
reference's keyed-combine kernel plus the scale-safe rank pattern, never a
single-partition window.

Determinism disciplines (CLAUDE.md): money in integer cents; ranks and
counts as exact BIGINTs; ratios as integer ppm floor divisions with
positive operands (Spark div ≡ DuckDB //) or sign-split where a numerator
can go negative; oversized products (Gini's Σ rank·cents · 1e6) in int128
(Spark DECIMAL(38,0) ≡ DuckDB HUGEINT); the one final-double expression
rule for Spearman's ρ over exact integer moments.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.hashing import hash60, sql_hash60
from hpmr_spark.functions.ranking import (
    exact_ntile,
    global_row_number,
    global_running,
)

# Per-customer revenue in integer cents — the shared "wealth" frame.
_WEALTH_SQL = """
    SELECT o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
"""


def _wealth(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )


# ---------------------------------------------------------------------------
# Gini coefficient of customer revenue.
# ---------------------------------------------------------------------------
@register(
    "gini_wealth_coefficient",
    f"""
    WITH w AS ({_WEALTH_SQL}),
    r AS (SELECT cents,
                 row_number() OVER (ORDER BY cents, o_custkey) AS rn
          FROM w),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(cents) AS BIGINT) AS s0,
                 CAST(SUM(rn * cents) AS BIGINT) AS s1
          FROM r)
    SELECT n, s0 AS total_cents,
           CAST((2 * CAST(s1 AS HUGEINT) - (CAST(n AS HUGEINT) + 1)
                   * CAST(s0 AS HUGEINT)) * 1000000
                // (CAST(n AS HUGEINT) * CAST(s0 AS HUGEINT)) AS BIGINT)
             AS gini_ppm
    FROM m
    """,
)
def gini_wealth_coefficient(spark, sf_dir):
    """Exact Gini coefficient of per-customer revenue:
    G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) with ranks from the two-pass
    bucketed row_number (ties carry identical x, so the tie-break cannot
    change Σ rank·x). The numerator product reaches ~n²·max_cents·1e6, so
    the final expression runs in int128 (Spark DECIMAL(38,0) ≡ DuckDB
    HUGEINT — exact to n ≈ 1e9 customers); everything before it is plain
    BIGINT keyed aggregation. G ≥ 0 for non-negative x, so the ppm floor
    division never sees a negative numerator."""
    w = _wealth(spark, sf_dir)
    r = global_row_number(w, ["cents", "o_custkey"], out="rn")
    m = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s0"),
        F.sum(F.col("rn") * F.col("cents")).cast("long").alias("s1"),
    )
    return m.select(
        "n",
        F.col("s0").alias("total_cents"),
        F.expr(
            "CAST((2 * CAST(s1 AS DECIMAL(38,0)) - (CAST(n AS DECIMAL(38,0)) + 1)"
            " * CAST(s0 AS DECIMAL(38,0))) * 1000000"
            " div (CAST(n AS DECIMAL(38,0)) * CAST(s0 AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("gini_ppm"),
    )


# ---------------------------------------------------------------------------
# Lorenz curve by revenue decile.
# ---------------------------------------------------------------------------
@register(
    "lorenz_curve_deciles",
    f"""
    WITH w AS ({_WEALTH_SQL}),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(cents) AS BIGINT) AS total FROM w),
    b AS (SELECT cents,
                 NTILE(10) OVER (ORDER BY cents, o_custkey) AS decile
          FROM w),
    d AS (SELECT CAST(decile AS BIGINT) AS decile,
                 CAST(COUNT(*) AS BIGINT) AS n_cust,
                 CAST(SUM(cents) AS BIGINT) AS decile_cents
          FROM b GROUP BY decile)
    SELECT d.decile, d.n_cust, d.decile_cents,
           CAST(CAST(SUM(d2.decile_cents) AS BIGINT) * 1000000 // t.total
                AS BIGINT) AS cum_share_ppm
    FROM d JOIN d d2 ON d2.decile <= d.decile CROSS JOIN t
    GROUP BY d.decile, d.n_cust, d.decile_cents, t.total
    """,
)
def lorenz_curve_deciles(spark, sf_dir):
    """Lorenz curve sampled at revenue deciles: customers NTILE(10)-bucketed
    by revenue (two-pass exact NTILE), per-decile totals, and the cumulative
    revenue share in integer ppm. The cumulative step runs as a ≤10-row
    non-equi self-join — no window anywhere. cum_share_ppm of decile 10 is
    1e6 by construction; the gap between the diagonal i/10 and the curve is
    the inequality Gini integrates."""
    w = _wealth(spark, sf_dir)
    t = w.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total")
    )
    r = global_row_number(w, ["cents", "o_custkey"], out="rn")
    b = r.crossJoin(F.broadcast(t)).select(
        "cents", exact_ntile(F.col("rn"), F.col("n"), 10).alias("decile")
    )
    d = b.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("cents").cast("long").alias("decile_cents"),
    )
    d2 = d.select(
        F.col("decile").alias("d2"), F.col("decile_cents").alias("c2")
    )
    cum = (
        d.join(F.broadcast(d2), F.col("d2") <= F.col("decile"))
        .groupBy("decile", "n_cust", "decile_cents")
        .agg(F.sum("c2").cast("long").alias("cum_cents"))
    )
    return cum.crossJoin(F.broadcast(t.select("total"))).select(
        "decile",
        "n_cust",
        "decile_cents",
        F.expr("cum_cents * 1000000 div total").cast("long").alias("cum_share_ppm"),
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov D between urgent and non-urgent order values.
# ---------------------------------------------------------------------------
@register(
    "ks_two_sample_prices",
    """
    WITH c AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS grp
      FROM orders
    ),
    g AS (SELECT cents,
                 CAST(SUM(grp) AS BIGINT) AS c1,
                 CAST(SUM(1 - grp) AS BIGINT) AS c2
          FROM c GROUP BY cents),
    t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                 CAST(SUM(c2) AS BIGINT) AS n2 FROM g),
    cum AS (SELECT cents,
                   CAST(SUM(c1) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS f1,
                   CAST(SUM(c2) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS f2
            FROM g),
    d AS (SELECT cents,
                 ABS(CAST(f1 AS HUGEINT) * t.n2 - CAST(f2 AS HUGEINT) * t.n1)
                   AS dnum
          FROM cum, t),
    mx AS (SELECT MAX(dnum) AS max_dnum FROM d)
    SELECT t.n1, t.n2,
           CAST(mx.max_dnum * 1000000 // (CAST(t.n1 AS HUGEINT) * t.n2)
                AS BIGINT) AS ks_d_ppm,
           CAST((SELECT MIN(cents) FROM d WHERE dnum = mx.max_dnum) AS BIGINT)
             AS at_cents
    FROM t, mx
    """,
)
def ks_two_sample_prices(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov distance between the order-value
    distributions of urgent (1-URGENT/2-HIGH) and normal orders — the drift
    statistic a pipeline computes between corpus shards. Exact integers end
    to end: per-value group counts, two-pass bucketed prefix sums for both
    empirical CDFs in ONE ordered pass each, and the sup as
    max |F1·n2 − F2·n1| (cross-multiplied — no float CDFs); D in ppm by a
    positive floor division, plus the smallest value attaining it. The
    cross-multiplications run in int128 (Spark DECIMAL(38,0) ≡ DuckDB
    HUGEINT): f1·n2 and n1·n2 overflow int64 once n1·n2 > 9.2e18 — a few
    billion rows per side, reachable at the 100 TB design point."""
    o = _t(spark, sf_dir, "orders")
    c = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
        ).otherwise(F.lit(0)).alias("grp"),
    )
    g = c.groupBy("cents").agg(
        F.sum("grp").cast("long").alias("c1"),
        F.sum(F.lit(1) - F.col("grp")).cast("long").alias("c2"),
    )
    t = g.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    from hpmr_spark.functions.ranking import global_order_multi

    cum = global_order_multi(
        g,
        ["cents"],
        running=[("c1", "sum", False, "f1"), ("c2", "sum", False, "f2")],
    )
    d = cum.crossJoin(F.broadcast(t)).select(
        "cents",
        F.expr(
            "ABS(CAST(f1 AS DECIMAL(38,0)) * n2 - CAST(f2 AS DECIMAL(38,0)) * n1)"
        ).alias("dnum"),
    )
    mx = d.agg(F.max("dnum").alias("max_dnum"))
    at = (
        d.join(F.broadcast(mx), F.col("dnum") == F.col("max_dnum"))
        .agg(F.min("cents").alias("at_cents"))
    )
    return (
        t.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(at))
        .select(
            "n1",
            "n2",
            F.expr(
                "max_dnum * 1000000 div (CAST(n1 AS DECIMAL(38,0)) * n2)"
            ).cast("long").alias("ks_d_ppm"),
            F.col("at_cents").cast("long").alias("at_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (tie-corrected average ranks) between customer
# order frequency and revenue.
# ---------------------------------------------------------------------------
_SPEAR_BASE_SQL = """
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS freq,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
"""


@register(
    "spearman_freq_revenue",
    f"""
    WITH w AS ({_SPEAR_BASE_SQL}),
    r AS (
      SELECT 2 * RANK() OVER (ORDER BY freq)
               + COUNT(*) OVER (PARTITION BY freq) - 1 AS rx,
             2 * RANK() OVER (ORDER BY cents)
               + COUNT(*) OVER (PARTITION BY cents) - 1 AS ry
      FROM w
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(rx) AS BIGINT) AS sx,
                 CAST(SUM(ry) AS BIGINT) AS sy,
                 CAST(SUM(rx * rx) AS BIGINT) AS sxx,
                 CAST(SUM(ry * ry) AS BIGINT) AS syy,
                 CAST(SUM(rx * ry) AS BIGINT) AS sxy
          FROM r)
    SELECT n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS spearman_rho
    FROM m
    """,
)
def spearman_freq_revenue(spark, sf_dir):
    """Spearman rank correlation between a customer's order count and
    revenue, with proper TIE handling: each value's doubled average rank
    rank2 = 2·prefix_lt + cnt + 1 comes from a per-value grouped frame +
    two-pass bucketed strict prefix sum (the AUC machinery) — doubling
    keeps every rank integral, and ρ is scale-invariant so rank2 gives the
    same value. ρ itself is ONE final double expression over six exact
    BIGINT moments (identical text both engines — bit-equal, the libm/
    moment parity commitment). Moments stay in BIGINT to n ≈ 1e6 rows
    (rank2 ≤ 2n); beyond that, lift the moment sums to DECIMAL(38,0) like
    gini_wealth_coefficient.

    Round-4 shuffle diet (was the registry-max 17 shuffles, now 7): the
    freq side's histogram is TINY (distinct order-counts are physically
    bounded), so its strict prefix is a broadcast non-equi self-join with
    IDENTICAL projections both sides (one exchange, reused — the bucketed
    machinery would cost four), and rx broadcasts back onto the user frame
    — no shuffle join; the cents side then needs no join at all: one
    groupBy(cents) over the rx-tagged user frame carries (cnt, Σrx, Σrx²)
    per value class, the strict prefix pass tags ry IN PLACE, and every
    moment falls out of one final aggregate over the class frame
    (Σrow rx·ry = Σclass ry·Σrx etc.)."""
    w = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        )
    )
    hf = w.groupBy("freq").agg(F.count(F.lit(1)).cast("long").alias("_fcnt"))
    ha = hf.select(F.col("freq").alias("_af"), F.col("_fcnt").alias("_ac"))
    hb = hf.select(F.col("freq").alias("_bf"), F.col("_fcnt").alias("_bc"))
    rx_f = (
        ha.join(F.broadcast(hb), F.col("_bf") < F.col("_af"), "left")
        .groupBy("_af", "_ac")
        .agg(F.coalesce(F.sum("_bc"), F.lit(0)).alias("_plt"))
        .select(
            F.col("_af").alias("freq"),
            (F.lit(2) * F.col("_plt") + F.col("_ac") + 1).cast("long").alias("rx"),
        )
    )
    wx = w.join(F.broadcast(rx_f), "freq")
    cc = wx.groupBy("cents").agg(
        F.count(F.lit(1)).cast("long").alias("_ccnt"),
        F.sum("rx").cast("long").alias("_srx"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("_srx2"),
    )
    ccr = global_running(
        cc, ["cents"], "_ccnt", kind="sum", strict=True, out="_plt"
    ).withColumn(
        "ry",
        (
            F.lit(2) * F.coalesce(F.col("_plt"), F.lit(0)) + F.col("_ccnt") + 1
        ).cast("long"),
    )
    m = ccr.agg(
        F.sum("_ccnt").cast("long").alias("n"),
        F.sum("_srx").cast("long").alias("sx"),
        F.sum(F.col("_ccnt") * F.col("ry")).cast("long").alias("sy"),
        F.sum("_srx2").cast("long").alias("sxx"),
        F.sum(F.col("_ccnt") * F.col("ry") * F.col("ry")).cast("long").alias("syy"),
        F.sum(F.col("ry") * F.col("_srx")).cast("long").alias("sxy"),
    )
    return m.select(
        "n",
        F.expr(
            "CAST(n * sxy - sx * sy AS DOUBLE)"
            " / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))"
            " * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))"
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# 10% trimmed mean of order value.
# ---------------------------------------------------------------------------
@register(
    "trimmed_mean_10pct",
    """
    WITH c AS (SELECT o_orderkey,
                      CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
    r AS (SELECT cents,
                 row_number() OVER (ORDER BY cents, o_orderkey) AS rn
          FROM c)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(cents) AS BIGINT) AS kept_cents,
           CAST(CAST(SUM(cents) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_cents
    FROM r, t WHERE rn > n // 10 AND rn <= n - n // 10
    """,
)
def trimmed_mean_10pct(spark, sf_dir):
    """Exact 10%-trimmed mean of order value: drop the ⌊n/10⌋ smallest and
    ⌊n/10⌋ largest by RANK (two-pass bucketed row_number with a full
    tie-break — value-based trimming would drop unpredictable tie masses),
    then an exact integer sum and floor-division mean. The robust location
    estimate for monitoring corpus value drift without outlier noise."""
    c = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    t = c.agg(F.count(F.lit(1)).alias("n"))
    r = global_row_number(c, ["cents", "o_orderkey"], out="rn")
    kept = r.crossJoin(F.broadcast(t)).where(
        F.expr("rn > n div 10 AND rn <= n - n div 10")
    )
    return kept.agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("cents").cast("long").alias("kept_cents"),
    ).select(
        "n_kept",
        "kept_cents",
        F.expr("kept_cents div n_kept").cast("long").alias("mean_cents"),
    )


# ---------------------------------------------------------------------------
# Percentile lookup table (11 points) by cumulative-count selection.
# ---------------------------------------------------------------------------
@register(
    "quantile_table_11pt",
    """
    WITH c AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
    d AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM c GROUP BY cents),
    cum AS (SELECT cents,
                   CAST(SUM(cnt) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cm
            FROM d),
    p AS (SELECT CAST(10 * i AS BIGINT) AS pct FROM range(0, 11) r(i))
    SELECT p.pct,
           CAST(MIN(cum.cents) AS BIGINT) AS value_cents
    FROM p CROSS JOIN t JOIN cum
      ON cum.cm >= GREATEST(1, (p.pct * t.n + 99) // 100)
    GROUP BY p.pct
    """,
)
def quantile_table_11pt(spark, sf_dir):
    """Exact percentile lookup table (p0, p10, …, p100) of order value: the
    k-th order statistic is the least value whose cumulative count reaches
    k = max(1, ⌈pct·n/100⌉) — integer ceil division, no float quantile
    semantics to disagree over. One grouped frame, ONE two-pass bucketed
    prefix sum, then an 11-way broadcast threshold join — the multi-point
    generalization of winsorize/MAD's rank selection (a CDF table a CBO or
    drift monitor consumes directly)."""
    c = _t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    t = c.agg(F.count(F.lit(1)).alias("n"))
    d = c.groupBy("cents").agg(F.count(F.lit(1)).alias("cnt"))
    cum = global_running(d, ["cents"], "cnt", kind="sum", out="cm")
    p = spark.range(0, 11).select((F.col("id") * 10).cast("long").alias("pct"))
    thresholds = p.crossJoin(F.broadcast(t)).select(
        "pct",
        F.expr("GREATEST(1, (pct * n + 99) div 100)").cast("long").alias("k"),
    )
    return (
        cum.join(F.broadcast(thresholds), F.col("cm") >= F.col("k"))
        .groupBy("pct")
        .agg(F.min("cents").cast("long").alias("value_cents"))
    )


# ---------------------------------------------------------------------------
# Cohen's kappa between two deterministic raters.
# ---------------------------------------------------------------------------
_RATER_A = f"CAST(({sql_hash60('CAST(vec_id AS VARCHAR)')} % 100 < 50 + 30 * (label % 2)) AS BIGINT)"
_RATER_B = f"CAST(({sql_hash60(chr(39) + 'b:' + chr(39) + ' || CAST(vec_id AS VARCHAR)')} % 100 < 40 + 40 * (label % 2)) AS BIGINT)"


@register(
    "cohens_kappa_raters",
    f"""
    WITH p AS (
      SELECT {_RATER_A} AS a, {_RATER_B} AS b
      FROM embeddings
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree,
                 CAST(SUM(a) AS BIGINT) AS na1,
                 CAST(SUM(b) AS BIGINT) AS nb1
          FROM p),
    e AS (SELECT n, agree, na1, nb1,
                 CAST(na1 AS HUGEINT) * nb1
                   + (CAST(n AS HUGEINT) - na1) * (n - nb1)
                   AS chance_x_n2_over_n
          FROM m)
    SELECT n, agree, na1, nb1,
           CAST(CASE WHEN CAST(agree AS HUGEINT) * n - chance_x_n2_over_n >= 0
                THEN (CAST(agree AS HUGEINT) * n - chance_x_n2_over_n) * 1000000
                     // (CAST(n AS HUGEINT) * n - chance_x_n2_over_n)
                ELSE 0 - ((0 - (CAST(agree AS HUGEINT) * n - chance_x_n2_over_n)) * 1000000
                     // (CAST(n AS HUGEINT) * n - chance_x_n2_over_n)) END AS BIGINT) AS kappa_ppm
    FROM e
    """,
)
def cohens_kappa_raters(spark, sf_dir):
    """Cohen's kappa between two committed hash-derived binary raters (both
    correlated with the label, with different noise rates — the
    inter-annotator agreement check run over double-labeled corpus slices).
    κ = (pₒ − pₑ)/(1 − pₑ) cleared of denominators:
    (agree·n − Σ marginal products)·1e6 // (n² − Σ marginal products), with
    the SIGN-SPLIT floor division (CLAUDE.md rule: negative-operand integer
    division never crosses engines intact — κ < 0 is possible for
    worse-than-chance raters). All cross-multiplications in int128 (Spark
    DECIMAL(38,0) ≡ DuckDB HUGEINT): agree·n and n² pass int64 at n > 3e9
    rows. One scan, one 1-row aggregate."""
    e = _t(spark, sf_dir, "embeddings")
    a = (
        hash60(F.col("vec_id").cast("string")) % 100
        < F.lit(50) + 30 * (F.col("label") % 2)
    ).cast("long")
    b = (
        hash60(F.concat(F.lit("b:"), F.col("vec_id").cast("string"))) % 100
        < F.lit(40) + 40 * (F.col("label") % 2)
    ).cast("long")
    p = e.select(a.alias("a"), b.alias("b"))
    m = p.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0)).cast("long").alias("agree"),
        F.sum("a").cast("long").alias("na1"),
        F.sum("b").cast("long").alias("nb1"),
    )
    ch = (
        "CAST(na1 AS DECIMAL(38,0)) * nb1"
        " + (CAST(n AS DECIMAL(38,0)) - na1) * (n - nb1)"
    )
    po = "CAST(agree AS DECIMAL(38,0)) * n"
    pd = "CAST(n AS DECIMAL(38,0)) * n"
    return m.select(
        "n",
        "agree",
        "na1",
        "nb1",
        F.expr(
            f"CAST(CASE WHEN {po} - ({ch}) >= 0"
            f" THEN ({po} - ({ch})) * 1000000 div ({pd} - ({ch}))"
            f" ELSE 0 - ((0 - ({po} - ({ch}))) * 1000000 div ({pd} - ({ch})))"
            f" END AS BIGINT)"
        ).alias("kappa_ppm"),
    )


# ---------------------------------------------------------------------------
# Stratified 5-fold cross-validation assignment with balance audit.
# ---------------------------------------------------------------------------
@register(
    "stratified_fold_balance",
    f"""
    WITH a AS (
      SELECT c_mktsegment AS segment,
             {sql_hash60("'fold:' || CAST(c_custkey AS VARCHAR)")} % 5 AS fold
      FROM customer
    ),
    cell AS (SELECT segment, CAST(fold AS BIGINT) AS fold,
                    CAST(COUNT(*) AS BIGINT) AS n
             FROM a GROUP BY segment, fold),
    seg AS (SELECT segment, CAST(SUM(n) AS BIGINT) AS seg_n FROM cell GROUP BY segment)
    SELECT cell.segment, cell.fold, cell.n,
           CAST(cell.n * 5000000 // seg.seg_n AS BIGINT) AS fold_share_x5_ppm
    FROM cell JOIN seg ON cell.segment = seg.segment
    """,
)
def stratified_fold_balance(spark, sf_dir):
    """Deterministic 5-fold CV assignment (content-addressed: fold =
    hash(custkey) % 5 — survives retries and re-runs, the split hygiene a
    100 TB pipeline needs) with a per-stratum balance audit: each
    (segment, fold) cell's share ×5 in ppm — 1e6 means perfectly balanced.
    Pure keyed aggregation; the assignment column is reusable as-is for
    leakage-free train/eval splits."""
    c = _t(spark, sf_dir, "customer")
    a = c.select(
        F.col("c_mktsegment").alias("segment"),
        (hash60(F.concat(F.lit("fold:"), F.col("c_custkey").cast("string"))) % 5)
        .alias("fold"),
    )
    cell = a.groupBy("segment", F.col("fold").cast("long").alias("fold")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    seg = cell.groupBy("segment").agg(F.sum("n").cast("long").alias("seg_n"))
    return cell.join(seg, "segment").select(
        "segment",
        "fold",
        "n",
        F.expr("n * 5000000 div seg_n").cast("long").alias("fold_share_x5_ppm"),
    )


# ---------------------------------------------------------------------------
# Geometric mean of document length per language (LN/EXP parity).
# ---------------------------------------------------------------------------
@register(
    "geometric_mean_doclen",
    """
    WITH t AS (
      SELECT lang,
             CAST(FLOOR(LN(CAST(GREATEST(n_chars, 1) AS DOUBLE)) * 1000000000)
                  AS BIGINT) AS ln_nano
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ln_nano) AS BIGINT) AS sum_ln_nano,
           CAST(FLOOR(EXP(CAST(SUM(ln_nano) // COUNT(*) AS DOUBLE) / 1e9) * 1000)
                AS BIGINT) AS geo_mean_mchars
    FROM t GROUP BY lang
    """,
)
def geometric_mean_doclen(spark, sf_dir):
    """Geometric mean document length per language — the right average for
    a log-normal-ish size distribution (the arithmetic mean is dragged by
    outliers a curriculum planner already handles separately). Log-domain
    discipline end to end: per-row ln floored to integer NANOS (the LN
    parity commitment), exact BIGINT sum, integer floor-divided by the
    count, ONE final EXP (EXP parity) floored to milli-chars. Deterministic
    under any partitioning."""
    d = _t(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        F.expr(
            "CAST(FLOOR(LN(CAST(GREATEST(n_chars, 1) AS DOUBLE)) * 1000000000)"
            " AS BIGINT)"
        ).alias("ln_nano"),
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ln_nano").cast("long").alias("sum_ln_nano"),
        F.expr(
            "CAST(FLOOR(EXP(CAST(sum(ln_nano) div count(1) AS DOUBLE) / 1e9)"
            " * 1000) AS BIGINT)"
        ).alias("geo_mean_mchars"),
    )


# ---------------------------------------------------------------------------
# Theil T inequality index of customer revenue (completes gini/lorenz).
# ---------------------------------------------------------------------------
@register(
    "theil_index_revenue",
    f"""
    WITH w AS ({_WEALTH_SQL}),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(cents) AS BIGINT) AS s FROM w),
    term AS (
      -- x/X * ln(x*n/X) per customer, floored to integer nanos, SIGN-SPLIT
      -- (below-average customers contribute negative terms)
      SELECT CASE WHEN cents * t.n >= t.s
               THEN cents * CAST(FLOOR(LN(CAST(cents AS DOUBLE) * t.n / t.s)
                    * 1000000000) AS BIGINT) // t.s
               ELSE 0 - ((cents * CAST(FLOOR(LN(CAST(t.s AS DOUBLE)
                    / (CAST(cents AS DOUBLE) * t.n)) * 1000000000) AS BIGINT)
                    + t.s - 1) // t.s)
             END AS term_nano
      FROM w, t WHERE cents > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(term_nano) AS BIGINT) AS theil_t_nano
    FROM term
    """,
)
def theil_index_revenue(spark, sf_dir):
    """Theil T index of per-customer revenue — the DECOMPOSABLE inequality
    measure (unlike Gini it splits exactly into within-group + between-group
    components, which is why mixture auditors prefer it). Each customer's
    term (x/X)·ln(x·n/X) is floored to integer nanos with the sign-split
    rule (below-average revenue gives negative terms; the mirrored ceiling
    form keeps floor semantics across engines) and summed exactly. T=0 ⟺
    perfect equality; ≤ ln(n)."""
    w = _wealth(spark, sf_dir)
    t = w.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    term = (
        w.crossJoin(F.broadcast(t))
        .where(F.col("cents") > 0)
        .select(
            F.expr(
                "CASE WHEN cents * n >= s"
                " THEN cents * CAST(FLOOR(LN(CAST(cents AS DOUBLE) * n / s)"
                " * 1000000000) AS BIGINT) div s"
                " ELSE 0 - ((cents * CAST(FLOOR(LN(CAST(s AS DOUBLE)"
                " / (CAST(cents AS DOUBLE) * n)) * 1000000000) AS BIGINT)"
                " + s - 1) div s)"
                " END"
            ).alias("term_nano")
        )
    )
    return term.agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("term_nano").cast("long").alias("theil_t_nano"),
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection over hourly event rates.
# ---------------------------------------------------------------------------
@register(
    "cusum_changepoint_hours",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY date_trunc('hour', ts)
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
          FROM hourly),
    r AS (SELECT hr, x,
                 row_number() OVER (ORDER BY hr) AS i,
                 CAST(SUM(x) OVER (ORDER BY hr ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) AS si
          FROM hourly),
    dev AS (SELECT hr, i,
                   ABS(CAST(si AS HUGEINT) * t.n - CAST(i AS HUGEINT) * t.s)
                     AS dnum
            FROM r, t),
    mx AS (SELECT MAX(dnum) AS max_dnum FROM dev)
    SELECT t.n AS n_hours,
           CAST(mx.max_dnum * 1000000 // (CAST(t.n AS HUGEINT) * t.s) AS BIGINT)
             AS max_dev_ppm,
           (SELECT MIN(hr) FROM dev WHERE dnum = mx.max_dnum)
             AS changepoint_hr
    FROM t, mx
    """,
)
def cusum_changepoint_hours(spark, sf_dir):
    """CUSUM change-point detection on the hourly event rate: the hour
    where the cumulative count deviates most from the uniform-rate line —
    max |S_i·n − i·S_n| (cross-multiplied, no float means), deviation in
    ppm of total mass, argmax hour tie-broken to the earliest. The prefix
    sum and index run as ONE fused two-pass bucketed pass
    (functions/ranking.global_order_multi) — no window; the detector every
    rate monitor runs after an incident."""
    from hpmr_spark.functions.ranking import global_order_multi
    from hpmr_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("x")
    )
    t = hourly.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    r = global_order_multi(
        hourly.withColumn("hr_us", F.unix_micros(F.col("hr").cast("timestamp"))),
        ["hr_us"],
        rn_out="i",
        running=[("x", "sum", False, "si")],
    )
    dev = r.crossJoin(F.broadcast(t)).select(
        "hr",
        F.expr(
            "ABS(CAST(si AS DECIMAL(38,0)) * n - CAST(i AS DECIMAL(38,0)) * s)"
        ).alias("dnum"),
    )
    mx = dev.agg(F.max("dnum").alias("max_dnum"))
    at = dev.join(F.broadcast(mx), F.col("dnum") == F.col("max_dnum")).agg(
        F.min("hr").alias("changepoint_hr")
    )
    return (
        t.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(at))
        .select(
            F.col("n").alias("n_hours"),
            F.expr(
                "max_dnum * 1000000 div (CAST(n AS DECIMAL(38,0)) * s)"
            ).cast("long").alias("max_dev_ppm"),
            "changepoint_hr",
        )
    )


# ---------------------------------------------------------------------------
# Hellinger / Bhattacharyya distance between corpus halves (sqrt parity).
# ---------------------------------------------------------------------------
@register(
    "label_drift_hellinger_nano",
    """
    WITH h AS (
      SELECT CAST(label AS BIGINT) AS label,
             CAST(vec_id % 2 AS BIGINT) AS half
      FROM embeddings
    ),
    c AS (SELECT label,
                 CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                 CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
          FROM h GROUP BY label),
    t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM c),
    term AS (
      SELECT CAST(FLOOR(sqrt(CAST(c1 AS DOUBLE) * c2
                        / (CAST(t.n1 AS DOUBLE) * t.n2)) * 1000000000) AS BIGINT)
               AS bc_nano
      FROM c, t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_labels,
           CAST(SUM(bc_nano) AS BIGINT) AS bhattacharyya_nano,
           CAST(1000000000 - SUM(bc_nano) AS BIGINT) AS hellinger_sq_nano
    FROM term
    """,
)
def label_drift_hellinger_nano(spark, sf_dir):
    """Bhattacharyya coefficient / squared Hellinger distance between the
    vec_id-parity halves — the sqrt-family drift metric (BC = Σ√(p₁p₂),
    H² = 1 − BC, always in [0,1]): per-label √ terms are IEEE-correctly-
    rounded sqrt over exact integer ratios (sqrt IS portable across
    engines, unlike acos/cos), floored to nanos elementwise before the
    exact sum — deterministic everywhere, ALL terms non-negative (no
    sign-split needed, unlike KL/PSI). Completes the drift suite:
    KS (sup), PSI (per-bin log), JS (symmetric log), Hellinger (sqrt)."""
    e = _t(spark, sf_dir, "embeddings")
    h = e.select(
        F.col("label").cast("long").alias("label"),
        (F.col("vec_id") % 2).cast("long").alias("half"),
    )
    c = h.groupBy("label").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long").alias("c2"),
    )
    t = c.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    term = c.crossJoin(F.broadcast(t)).select(
        F.expr(
            "CAST(FLOOR(sqrt(CAST(c1 AS DOUBLE) * c2"
            " / (CAST(n1 AS DOUBLE) * n2)) * 1000000000) AS BIGINT)"
        ).alias("bc_nano")
    )
    return term.agg(
        F.count(F.lit(1)).cast("long").alias("n_labels"),
        F.sum("bc_nano").cast("long").alias("bhattacharyya_nano"),
        (F.lit(1000000000) - F.sum("bc_nano")).cast("long").alias("hellinger_sq_nano"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U gate between order-value segments (rank-sum test).
# ---------------------------------------------------------------------------
@register(
    "mann_whitney_u_gate",
    """
    WITH c AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS grp
      FROM orders
    ),
    g AS (SELECT cents,
                 CAST(SUM(grp) AS BIGINT) AS c1,
                 CAST(SUM(1 - grp) AS BIGINT) AS c2
          FROM c GROUP BY cents),
    t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                 CAST(SUM(c2) AS BIGINT) AS n2 FROM g),
    cum AS (SELECT cents, c1, c2,
                   CAST(COALESCE(SUM(c1 + c2) OVER (ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS plt
            FROM g),
    r AS (SELECT CAST(SUM(c1 * (2 * plt + (c1 + c2) + 1)) AS BIGINT) AS r2_1
          FROM cum)
    SELECT t.n1, t.n2,
           CAST((r.r2_1 - t.n1 * (t.n1 + 1)) // 2 AS BIGINT) AS u1,
           -- two-sided z^2 > 3.8416 gate by integer cross-multiplication:
           -- z^2 = (U - n1n2/2)^2 / (n1n2(n1+n2+1)/12)
           -- <=> 12 * (2U - n1n2)^2 * 10000 > 4 * 38416 * n1n2(n1+n2+1)
           (CAST(12 AS HUGEINT) * CAST((r.r2_1 - t.n1 * (t.n1 + 1)) - t.n1 * t.n2 AS HUGEINT)
              * CAST((r.r2_1 - t.n1 * (t.n1 + 1)) - t.n1 * t.n2 AS HUGEINT) * 10000
            > CAST(4 AS HUGEINT) * 38416 * CAST(t.n1 AS HUGEINT) * t.n2
              * (t.n1 + t.n2 + 1)) AS significant_95
    FROM r, t
    """,
)
def mann_whitney_u_gate(spark, sf_dir):
    """Mann-Whitney U test between urgent and normal order values — the
    nonparametric two-sample location gate (the hypothesis-test sibling of
    ks_two_sample_prices' distribution distance). U₁ from the tie-averaged
    doubled rank-sum (the AUC rank2 machinery over the per-value grouped
    frame; 2·U₁ − n₁n₂ = r2₁ − n₁(n₁+1) − n₁n₂ stays integral, so the
    normal-approximation z² > 3.8416 decision is an exact int128
    cross-multiplication — no float variance, no ties correction needed at
    this corpus's tie density for the 95% decision). Prefix sums run as
    the fused two-pass bucketed pass."""
    from hpmr_spark.functions.ranking import global_running

    o = _t(spark, sf_dir, "orders")
    c = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
        ).otherwise(F.lit(0)).alias("grp"),
    )
    g = c.groupBy("cents").agg(
        F.sum("grp").cast("long").alias("c1"),
        F.sum(F.lit(1) - F.col("grp")).cast("long").alias("c2"),
    )
    t = g.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    cum = global_running(
        g.withColumn("both", F.col("c1") + F.col("c2")),
        ["cents"],
        "both",
        kind="sum",
        strict=True,
        out="plt",
    ).withColumn("plt", F.coalesce(F.col("plt"), F.lit(0)))
    r = cum.agg(
        F.sum(
            F.col("c1") * (2 * F.col("plt") + F.col("c1") + F.col("c2") + 1)
        ).cast("long").alias("r2_1")
    )
    return r.crossJoin(F.broadcast(t)).select(
        "n1",
        "n2",
        F.expr("(r2_1 - n1 * (n1 + 1)) div 2").cast("long").alias("u1"),
        F.expr(
            "CAST(12 AS DECIMAL(38,0))"
            " * CAST((r2_1 - n1 * (n1 + 1)) - n1 * n2 AS DECIMAL(38,0))"
            " * CAST((r2_1 - n1 * (n1 + 1)) - n1 * n2 AS DECIMAL(38,0)) * 10000"
            " > CAST(4 AS DECIMAL(38,0)) * 38416 * CAST(n1 AS DECIMAL(38,0)) * n2"
            " * (n1 + n2 + 1)"
        ).alias("significant_95"),
    )
