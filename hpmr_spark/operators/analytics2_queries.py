"""Dominance/layout analytics: 2-D skyline (Pareto front) via value-range
windows, and deterministic equi-depth histograms via fully tie-broken
ntile — both single-shuffle shapes.

Skyline semantics (committed): an order is on the skyline of (maximize
totalprice, minimize orderdate) iff no other order has (cents > its cents
and date <= its date) or (cents >= its cents and date < its date). The
sweep realizes this with two windows instead of the O(n^2) anti-join.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.ranking import exact_ntile, global_row_number, global_running

# ---------------------------------------------------------------------------
# Skyline / Pareto front of orders: high price, early date.
# ---------------------------------------------------------------------------
@register(
    "skyline_price_date",
    """
    WITH o AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d_days
      FROM orders
    ),
    w AS (
      SELECT o_orderkey, cents, d_days,
             MIN(d_days) OVER (ORDER BY cents
               RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS min_d_gt,
             MIN(d_days) OVER (PARTITION BY cents) AS min_d_eq
      FROM o
    )
    SELECT o_orderkey, cents, d_days
    FROM w
    WHERE (min_d_gt IS NULL OR d_days < min_d_gt) AND d_days = min_d_eq
    """,
)
def skyline_price_date(spark, sf_dir):
    """Pareto front over (maximize price, minimize order date) without the
    quadratic NOT EXISTS and without a single-partition window: min_d_gt —
    the earliest date among all STRICTLY more expensive orders — is a
    two-pass value-bucketed suffix-min over the per-cents aggregated
    frame (functions/ranking.global_running, cents DESC, strict frame);
    min_d_eq resolves ties within a price level. Every stage parallel;
    oracle keeps the value-RANGE window form, proving equivalence."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.unix_date(F.col("o_orderdate").cast("date")).cast("long").alias("d_days"),
    )
    # per-price minimum date (keyed agg), then the strictly-greater-price
    # suffix-min as a two-pass running min in cents-DESC order over the
    # aggregated per-cents frame — no single-partition window anywhere
    per = o.groupBy("cents").agg(F.min("d_days").alias("min_d_eq"))
    suf = global_running(
        per, ["cents"], "min_d_eq", kind="min", strict=True, descending=True,
        out="min_d_gt",
    )
    w = o.join(suf, "cents")
    return w.where(
        (F.col("min_d_gt").isNull() | (F.col("d_days") < F.col("min_d_gt")))
        & (F.col("d_days") == F.col("min_d_eq"))
    ).select("o_orderkey", "cents", "d_days")


# ---------------------------------------------------------------------------
# Equi-depth histogram (10 buckets) with a full tie-break so bucket
# assignment is deterministic.
# ---------------------------------------------------------------------------
@register(
    "histogram_equidepth_cents",
    """
    WITH c AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    b AS (
      SELECT cents,
             NTILE(10) OVER (ORDER BY cents, o_orderkey) AS bucket
      FROM c
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(cents) AS BIGINT) AS lo_cents,
           CAST(MAX(cents) AS BIGINT) AS hi_cents
    FROM b GROUP BY bucket
    """,
)
def histogram_equidepth_cents(spark, sf_dir):
    """Equi-depth (equal-count) histogram of order value: ntile(10) over a
    FULLY tie-broken order (cents, orderkey) — without the key tie-break,
    equal values straddling a bucket boundary would land nondeterministically
    and flake any comparison. Complements the existing equi-WIDTH histogram;
    equi-depth boundaries are what optimizers and drift monitors actually
    want. Bucketing = two-pass value-bucketed row_number + the exact
    integer NTILE formula (functions/ranking.py) — no single-partition
    window; the oracle keeps the NTILE window form, proving equivalence."""
    c = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    r = global_row_number(c, ["cents", "o_orderkey"], out="rn")
    t = c.agg(F.count(F.lit(1)).alias("n"))
    b = r.crossJoin(F.broadcast(t)).select(
        "cents",
        exact_ntile(F.col("rn"), F.col("n"), 10).alias("bucket"),
    )
    return b.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("cents").cast("long").alias("lo_cents"),
        F.max("cents").cast("long").alias("hi_cents"),
    )
