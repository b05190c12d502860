"""Sampling batch 2 (round 6): Neyman-optimal stratified allocation —
the statistically-optimal "how many samples per stratum" answer
(n_h ∝ N_h·σ_h) the existing proportional/hash samplers don't cover.

Exactness discipline: the Neyman weight N_h·σ_h = √(N_h·Q_h − S_h²)
needs ONE sqrt. The int128 argument is floor-divided by 2²⁰ FIRST so the
integer→double conversion is exact (< 2⁵³ for any n·q−s² < 2⁷³ — beyond
any real corpus at cents scale); sqrt is IEEE-correctly-rounded on both
engines, so the floored weight is engine-identical with NO reliance on
int128→double rounding behavior. The 1000-unit budget is then Hamilton-
apportioned over the integer weights (base = ⌊B·w/W⌋, leftovers to
largest remainders with a full (rem DESC, nation ASC) tie-break ranked
by a broadcast non-equi self-join — the corpus_mix_apportionment
pattern, no global window). Σ alloc ≡ 1000 exactly.

Scale: one dimension-sized grouped-moment aggregate; everything after
runs on the 25-row stratum frame.

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's analytics axis.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register

_BUDGET = 1000
_SCALE_DOWN = 1 << 20  # keeps the sqrt argument exactly double-representable

_NEYMAN_ORACLE = f"""
    WITH m AS (
      SELECT c_nationkey,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS HUGEINT) AS s,
             CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
                      * CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS HUGEINT)
               AS q
      FROM customer GROUP BY c_nationkey
    ),
    w AS (
      SELECT c_nationkey, CAST(n AS BIGINT) AS n_h,
             CAST(FLOOR(SQRT(CAST((n * q - s * s) // {_SCALE_DOWN}
                                  AS DOUBLE))) AS BIGINT) AS wt
      FROM m
    ),
    tot AS (SELECT CAST(SUM(wt) AS BIGINT) AS tw FROM w),
    base AS (
      SELECT w.c_nationkey, w.n_h, w.wt,
             CASE WHEN t.tw > 0
                  THEN CAST(CAST(w.wt AS HUGEINT) * {_BUDGET} // t.tw
                       AS BIGINT) ELSE 0 END AS b,
             CASE WHEN t.tw > 0
                  THEN CAST(CAST(w.wt AS HUGEINT) * {_BUDGET} % t.tw
                       AS BIGINT) ELSE 0 END AS rem
      FROM w, tot t
    ),
    lo AS (SELECT CAST({_BUDGET} - SUM(b) AS BIGINT) AS leftover FROM base),
    rk AS (
      SELECT c_nationkey, n_h, wt, b,
             ROW_NUMBER() OVER (ORDER BY rem DESC, c_nationkey ASC) AS r
      FROM base
    )
    SELECT CAST(rk.c_nationkey AS BIGINT) AS nationkey, rk.n_h,
           rk.wt AS neyman_weight, rk.b AS base_quota,
           CAST(rk.b + CASE WHEN rk.r <= lo.leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM rk, lo
    ORDER BY nationkey
"""


@register("neyman_allocation_sample", _NEYMAN_ORACLE)
def neyman_allocation_sample(spark, sf_dir):
    """Neyman allocation of a 1000-sample budget across nation strata of
    the customer table, n_h ∝ N_h·σ_h(acctbal) — see module docstring
    for the exactness construction. Output: per stratum its size, the
    integer Neyman weight, the base quota, and the final allocation
    (Σ = 1000 exactly)."""
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    m = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_h"),
            F.sum(cents.cast("decimal(38,0)")).alias("s"),
            F.sum(cents.cast("decimal(38,0)") * cents).alias("q"),
        )
    )
    w = m.select(
        "c_nationkey",
        "n_h",
        F.expr(
            f"CAST(FLOOR(SQRT(CAST((CAST(n_h AS DECIMAL(38,0)) * q - s * s)"
            f" div {_SCALE_DOWN} AS DOUBLE))) AS BIGINT)"
        ).alias("wt"),
    )
    tot = w.agg(F.sum("wt").cast("long").alias("tw"))
    base = w.crossJoin(F.broadcast(tot)).select(
        "c_nationkey",
        "n_h",
        "wt",
        F.expr(
            f"CASE WHEN tw > 0 THEN CAST(CAST(wt AS DECIMAL(38,0))"
            f" * {_BUDGET} div tw AS BIGINT) ELSE 0 END"
        ).alias("b"),
        F.expr(
            f"CASE WHEN tw > 0 THEN CAST(CAST(wt AS DECIMAL(38,0))"
            f" * {_BUDGET} % tw AS BIGINT) ELSE 0 END"
        ).alias("rem"),
    )
    lo = base.agg((F.lit(_BUDGET) - F.sum("b")).cast("long").alias("leftover"))
    a = base.select(
        F.col("c_nationkey").alias("_ak"),
        F.col("n_h").alias("_an"),
        F.col("wt").alias("_aw"),
        F.col("b").alias("_ab"),
        F.col("rem").alias("_ar"),
    )
    b = base.select(
        F.col("c_nationkey").alias("_bk"),
        F.col("n_h").alias("_bn"),
        F.col("wt").alias("_bw"),
        F.col("b").alias("_bb"),
        F.col("rem").alias("_br"),
    )
    rk = (
        a.join(
            F.broadcast(b),
            (F.col("_br") > F.col("_ar"))
            | ((F.col("_br") == F.col("_ar")) & (F.col("_bk") < F.col("_ak"))),
            "left",
        )
        .groupBy("_ak", "_an", "_aw", "_ab")
        .agg((F.lit(1) + F.count("_bk")).cast("long").alias("r"))
    )
    return (
        rk.crossJoin(F.broadcast(lo))
        .select(
            F.col("_ak").cast("long").alias("nationkey"),
            F.col("_an").alias("n_h"),
            F.col("_aw").alias("neyman_weight"),
            F.col("_ab").alias("base_quota"),
            (
                F.col("_ab")
                + F.when(F.col("r") <= F.col("leftover"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("alloc"),
        )
        .orderBy("nationkey")
    )
