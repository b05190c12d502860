"""Scalable bootstrap (Poisson resampling) with deterministic resample
weights — confidence intervals at 100 TB without ever materializing a
resample.

The classic bootstrap draws n rows with replacement B times — impossible at
scale. The Poisson bootstrap (Chamandy et al., Google 2012) replaces the
multinomial with independent per-row Poisson(1) weights, so ONE scan
computes all B resample totals as weighted sums. Here the weights are
committed md5-derived draws from a discretized Poisson(1) (thresholds on
hash%1000: P(0)=368, P(1)=368, P(2)=184, P(3)=61, P(4)=15, P(5)=4 — the
per-mille rounding of e^-1/k!), so both engines draw the SAME resamples and
the interval itself is oracle-checked — a property randomized bootstraps
cannot have. Money stays integer cents throughout; the CI bounds are order
statistics of the 32 replicate totals (rank selection, tie-safe).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.hashing import hash60, sql_hash60
from hpmr_spark.functions.ranking import bounded_rank

_B = 32  # replicates

# discretized Poisson(1) from a uniform hash in [0, 1000)
_POIS_CASE = """
    CASE WHEN u < 368 THEN 0
         WHEN u < 736 THEN 1
         WHEN u < 920 THEN 2
         WHEN u < 981 THEN 3
         WHEN u < 996 THEN 4
         ELSE 5 END
"""


@register(
    "bootstrap_ci_poisson",
    f"""
    WITH base AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    reps AS (
      SELECT b.b, base.o_orderkey, base.cents,
             ({sql_hash60("CAST(o_orderkey AS VARCHAR) || ':' || CAST(b.b AS VARCHAR)")}
              % 1000) AS u
      FROM base CROSS JOIN (SELECT UNNEST(range({_B})) AS b) b
    ),
    w AS (SELECT b, cents, {_POIS_CASE} AS wt FROM reps),
    tot AS (
      SELECT b,
             CAST(SUM(wt * cents) AS BIGINT) AS t_cents,
             CAST(SUM(wt) AS BIGINT) AS n_eff
      FROM w GROUP BY b
    ),
    means AS (
      SELECT b, CAST(t_cents // n_eff AS BIGINT) AS mean_cents FROM tot
    ),
    r AS (
      SELECT mean_cents, ROW_NUMBER() OVER (ORDER BY mean_cents, b) AS rn
      FROM means
    ),
    pt AS (
      SELECT CAST(SUM(cents) // COUNT(*) AS BIGINT) AS point_mean_cents,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM base
    )
    SELECT pt.point_mean_cents, pt.n,
           CAST(MAX(CASE WHEN rn = 2 THEN mean_cents END) AS BIGINT) AS ci_lo_cents,
           CAST(MAX(CASE WHEN rn = {_B - 1} THEN mean_cents END) AS BIGINT) AS ci_hi_cents
    FROM r CROSS JOIN pt
    GROUP BY pt.point_mean_cents, pt.n
    """,
)
def bootstrap_ci_poisson(spark, sf_dir):
    """~94% CI for mean order value by the Poisson bootstrap: each row
    contributes a committed hash-derived Poisson(1) weight to each of 32
    replicates, so one scan (exploded ×32) yields every replicate's
    weighted total and effective n; replicate means are exact integer
    floor divisions, and the CI bounds are the 2nd/31st order statistics
    (rank-selected, full (mean, b) tie-break). Plan: explode to (row, b),
    ONE groupBy(b) with map-side combine into 32 cells, a 32-row window,
    and a broadcast of the 1-row point estimate. At 100 TB this is the
    only bootstrap that works — B passes become one pass, state is B
    accumulators — and determinism makes the interval itself testable."""
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    reps = base.crossJoin(
        F.broadcast(
            spark.range(_B).select(F.col("id").cast("long").alias("b"))
        )
    ).select(
        "b",
        "cents",
        (
            hash60(
                F.concat(
                    F.col("o_orderkey").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            )
            % 1000
        ).alias("u"),
    )
    w = reps.select("b", "cents", F.expr(_POIS_CASE).alias("wt"))
    tot = w.groupBy("b").agg(
        F.sum(F.col("wt") * F.col("cents")).cast("long").alias("t_cents"),
        F.sum("wt").cast("long").alias("n_eff"),
    )
    means = tot.select("b", F.expr("t_cents div n_eff").cast("long").alias("mean_cents"))
    # B=200 replica rows by construction: rank them with the broadcast
    # non-equi join instead of a partition-less window
    r = bounded_rank(
        means.select("mean_cents", "b"), "mean_cents", "b",
        primary_desc=False, out="rn",
    ).select("mean_cents", "rn")
    pt = base.agg(
        F.expr("SUM(cents) div COUNT(1)").cast("long").alias("point_mean_cents"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return (
        r.crossJoin(F.broadcast(pt))
        .groupBy("point_mean_cents", "n")
        .agg(
            F.max(F.when(F.col("rn") == 2, F.col("mean_cents")))
            .cast("long")
            .alias("ci_lo_cents"),
            F.max(F.when(F.col("rn") == _B - 1, F.col("mean_cents")))
            .cast("long")
            .alias("ci_hi_cents"),
        )
        .select("point_mean_cents", "n", "ci_lo_cents", "ci_hi_cents")
    )
