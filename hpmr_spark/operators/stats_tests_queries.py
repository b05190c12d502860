"""Hypothesis-testing batch: chi-square independence test and a
two-proportion z-test significance gate — release-gate statistics for
experiment analysis and drift detection over event streams.

Determinism: all observed/marginal counts are exact BIGINTs. The chi-square
statistic is summed as per-cell integer ppm contributions (each cell's term
is ONE double expression over exact integers — multiplication and division
are exact IEEE ops — floored before the sum). The z-test is decided purely
by integer cross-multiplication: no float ever gates significance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register
from hpmr_spark.functions.hashing import hash60, sql_hash60
from hpmr_spark.sources.tables import load_events

# ---------------------------------------------------------------------------
# Chi-square test of independence: event_type x weekday.
# ---------------------------------------------------------------------------
# Per-cell contribution in ppm: (o*N - r*c)^2 / (r*c*N) * 1e6, with the
# residual d = o*N - r*c computed exactly in BIGINT (|d| < 2^40 here) and
# the ratio as one double expression, floored elementwise.
_CHI2_TERM = (
    "CAST(FLOOR(CAST(d AS DOUBLE) * CAST(d AS DOUBLE)"
    " / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) * CAST(n AS DOUBLE))"
    " * 1000000) AS BIGINT)"
)


@register(
    "chi_square_independence",
    f"""
    WITH o AS (
      SELECT event_type, dayofweek(ts) AS wd, CAST(COUNT(*) AS BIGINT) AS obs
      FROM events GROUP BY event_type, wd
    ),
    r AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS r FROM o GROUP BY event_type),
    c AS (SELECT wd, CAST(SUM(obs) AS BIGINT) AS c FROM o GROUP BY wd),
    n AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM o),
    cells AS (
      SELECT o.obs * n.n - r.r * c.c AS d, r.r, c.c, n.n
      FROM o JOIN r USING (event_type) JOIN c USING (wd) CROSS JOIN n
    ),
    terms AS (SELECT {_CHI2_TERM} AS term_ppm, n FROM cells)
    SELECT CAST(SUM(term_ppm) AS BIGINT) AS chi2_ppm,
           CAST((SELECT (COUNT(*) - 1) FROM r)
                * (SELECT (COUNT(*) - 1) FROM c) AS BIGINT) AS dof,
           CAST(MAX(n) AS BIGINT) AS n
    FROM terms
    """,
)
def chi_square_independence(spark, sf_dir):
    """Pearson chi-square independence test over the event_type × weekday
    contingency table. Observed and marginal counts are exact; each cell's
    (O-E)²/E contribution is computed from the exact integer residual
    d = obs·N - row·col (scale-free — no rational expected value is ever
    materialized) as one double ratio floored to ppm, and only integers are
    summed. Plan: one (type, weekday) groupBy collapses the corpus to ≤35
    cells; marginals and the total are re-aggregations of that tiny frame,
    so the test costs exactly one shuffle at any scale."""
    ev = load_events(spark, sf_dir)
    o = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("wd")
    ).agg(F.count(F.lit(1)).cast("long").alias("obs"))
    o = o.persist()
    r = o.groupBy("event_type").agg(F.sum("obs").cast("long").alias("r"))
    c = o.groupBy("wd").agg(F.sum("obs").cast("long").alias("c"))
    n = o.agg(F.sum("obs").cast("long").alias("n"))
    cells = (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "wd")
        .crossJoin(F.broadcast(n))
        .select(
            (F.col("obs") * F.col("n") - F.col("r") * F.col("c")).alias("d"),
            "r",
            "c",
            "n",
        )
    )
    terms = cells.select(F.expr(_CHI2_TERM).alias("term_ppm"), "n")
    dof = (
        r.agg((F.count(F.lit(1)) - 1).alias("dr"))
        .crossJoin(c.agg((F.count(F.lit(1)) - 1).alias("dc")))
        .select((F.col("dr") * F.col("dc")).cast("long").alias("dof"))
    )
    return (
        terms.agg(
            F.sum("term_ppm").cast("long").alias("chi2_ppm"),
            F.max("n").cast("long").alias("n"),
        )
        .crossJoin(F.broadcast(dof))
        .select("chi2_ppm", "dof", "n")
    )


# ---------------------------------------------------------------------------
# Two-proportion z-test gate on a hash-bucketed A/B split, decided in
# integers: z^2 > 3.8416 (95%) via cross-multiplication.
# ---------------------------------------------------------------------------
@register(
    "ab_test_z2_gate",
    f"""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN {sql_hash60("'ab2:' || CAST(user_id AS VARCHAR)")} % 2 = 0
                  THEN 'A' ELSE 'B' END AS variant,
             CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS converted
      FROM events GROUP BY user_id
    ),
    v AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(converted) AS BIGINT) AS x
      FROM assign GROUP BY variant
    ),
    w AS (
      SELECT MAX(CASE WHEN variant = 'A' THEN n END) AS n1,
             MAX(CASE WHEN variant = 'A' THEN x END) AS x1,
             MAX(CASE WHEN variant = 'B' THEN n END) AS n2,
             MAX(CASE WHEN variant = 'B' THEN x END) AS x2
      FROM v
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(x1 AS BIGINT) AS x1,
           CAST(n2 AS BIGINT) AS n2, CAST(x2 AS BIGINT) AS x2,
           CAST(x1 * 1000000 // n1 AS BIGINT) AS p1_ppm,
           CAST(x2 * 1000000 // n2 AS BIGINT) AS p2_ppm,
           -- z² > 3.8416  <=>  (p1-p2)² > 3.8416·p·(1-p)·(1/n1+1/n2)
           -- with pooled p = (x1+x2)/(n1+n2), cross-multiplied to integers
           -- (all operands non-negative). Computed in int128 (HUGEINT /
           -- Spark DECIMAL(38,0)) so the ~N⁴·10⁴ magnitude is exact for
           -- cohorts up to ~1e7 users (BIGINT overflowed at ~1e5).
           (10000 * CAST(x1 * n2 - x2 * n1 AS HUGEINT)
                  * CAST(x1 * n2 - x2 * n1 AS HUGEINT)
                  * CAST(n1 + n2 AS HUGEINT)
            > 38416 * CAST(x1 + x2 AS HUGEINT)
                    * CAST(n1 + n2 - x1 - x2 AS HUGEINT)
                    * CAST(n1 AS HUGEINT) * CAST(n2 AS HUGEINT))
             AS significant_95
    FROM w
    """,
)
def ab_test_z2_gate(spark, sf_dir):
    """Two-proportion z-test on a deterministic hash-bucketed A/B split of
    users (conversion = any purchase event): the 95% significance decision
    is made entirely in integers by cross-multiplying the pooled-variance
    z² inequality — (p1-p2)² > 3.8416·p̄(1-p̄)(1/n1+1/n2) becomes
    10000·(x1n2-x2n1)²·(n1+n2) > 38416·(x1+x2)(N-x1-x2)·n1·n2, with both
    sides in exact int128 (Spark DECIMAL(38,0) ≡ DuckDB HUGEINT): the
    ~N⁴·10⁴ magnitude stays exact to cohorts of ~1e7 users, and ANSI mode
    fails loudly (not wrongly) beyond — pre-scale by a common power of ten
    if experiments ever exceed that. One groupBy(user) for
    assignment+conversion, one 2-row rollup."""
    ev = load_events(spark, sf_dir)
    assign = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("long").alias("converted")
    ).select(
        F.when(
            hash60(F.concat(F.lit("ab2:"), F.col("user_id").cast("string"))) % 2 == 0,
            F.lit("A"),
        ).otherwise(F.lit("B")).alias("variant"),
        "converted",
    )
    v = assign.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("converted").cast("long").alias("x"),
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == "A", F.col("x"))).alias("x1"),
        F.max(F.when(F.col("variant") == "B", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("variant") == "B", F.col("x"))).alias("x2"),
    )
    return w.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("x1").cast("long").alias("x1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("x2").cast("long").alias("x2"),
        F.expr("x1 * 1000000 div n1").cast("long").alias("p1_ppm"),
        F.expr("x2 * 1000000 div n2").cast("long").alias("p2_ppm"),
        F.expr(
            "10000 * CAST(x1 * n2 - x2 * n1 AS DECIMAL(38,0))"
            "      * CAST(x1 * n2 - x2 * n1 AS DECIMAL(38,0))"
            "      * CAST(n1 + n2 AS DECIMAL(38,0))"
            " > 38416 * CAST(x1 + x2 AS DECIMAL(38,0))"
            "         * CAST(n1 + n2 - x1 - x2 AS DECIMAL(38,0))"
            "         * CAST(n1 AS DECIMAL(38,0)) * CAST(n2 AS DECIMAL(38,0))"
        ).alias("significant_95"),
    )
