"""Computational-geometry / embedding-geometry operators (round 6):

- convex_hull_upper_qty_price: the upper convex hull of the 50-point
  (quantity, max price-cents) profile. Membership is decided by the
  O(n³) exact-integer criterion on the BOUNDED point set: p is NOT on
  the upper hull iff some segment (a, b) with a.x < p.x < b.x passes
  strictly above it — cross-product (yb−ya)(xp−xa) − (yp−ya)(xb−xa) > 0,
  pure BIGINT. The hull is what a price-frontier / pareto-envelope
  query returns; on 50 points the cubic check is the honest,
  branch-free distributed form (a monotone-chain scan is sequential).
- jl_distortion_audit: Johnson-Lindenstrauss distortion audit of a
  committed ±1 random projection (64 → 16 dims; sign matrix generated
  from a fixed seed and embedded as LITERAL arrays in both engines).
  Inputs are quantized to integer millis per dimension FIRST, so every
  projection coordinate and both squared distances are EXACT integers
  (order-invariant sums); the per-pair distortion ratio is one int128
  floor div (1e6·d²_proj) div (16·d²_orig) — E[d²_proj] = 16·d²_orig
  for unnormalized ±1 signs — over 64 hash-selected vector pairs,
  reported as a decile histogram (bucket 10 ≡ distortion 1.0x).

Scale notes (100 TB): the hull works on a resolution-bounded profile;
the JL audit touches each sampled vector once — the projection is the
same broadcast-literal expression a full-corpus projection would use.

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's similarity axis.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.hashing import hash60, sql_hash60
from hpmr_spark.functions.ranking import bounded_rank

# ---------------------------------------------------------------------------
# Upper convex hull of (quantity, max cents).
# ---------------------------------------------------------------------------

_HULL_ORACLE = """
    WITH pts AS MATERIALIZED (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(MAX(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS y
      FROM lineitem GROUP BY 1
    )
    SELECT p.x, p.y FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts a, pts b
      WHERE a.x < p.x AND p.x < b.x
        AND (b.y - a.y) * (p.x - a.x) - (p.y - a.y) * (b.x - a.x) > 0
    )
"""


@register("convex_hull_upper_qty_price", _HULL_ORACLE)
def convex_hull_upper_qty_price(spark, sf_dir):
    """Upper convex hull of the (quantity, max price) profile — see
    module docstring. Output: hull points (x, y)."""
    li = _t(spark, sf_dir, "lineitem")
    pts = li.groupBy(F.col("l_quantity").cast("long").alias("x")).agg(
        F.max(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    a = pts.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = pts.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    below = (
        pts.join(F.broadcast(a), F.col("xa") < F.col("x"))
        .join(F.broadcast(b), F.col("x") < F.col("xb"))
        .where(
            (F.col("yb") - F.col("ya")) * (F.col("x") - F.col("xa"))
            - (F.col("y") - F.col("ya")) * (F.col("xb") - F.col("xa"))
            > 0
        )
        .select("x", "y")
        .distinct()
    )
    return pts.join(below, ["x", "y"], "left_anti")


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss distortion audit (64 -> 16 dims, ±1 signs).
# ---------------------------------------------------------------------------

_JL_IN = 64
_JL_OUT = 16
_JL_PAIRS = 64
_rng = random.Random(0x51DEC0DE)
_JL_SIGNS = [
    [_rng.choice((-1, 1)) for _ in range(_JL_IN)] for _ in range(_JL_OUT)
]


def _spark_proj(k: int) -> str:
    arr = ", ".join(str(s) for s in _JL_SIGNS[k])
    return (
        f"aggregate(zip_with(embedding, array({arr}),"
        " (x, s) -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT) * s),"
        " CAST(0 AS BIGINT), (acc, t) -> acc + t)"
    )


def _duck_proj(k: int, tbl: str) -> str:
    arr = ", ".join(str(s) for s in _JL_SIGNS[k])
    return (
        f"list_sum(list_transform(generate_series(1, {_JL_IN}),"
        f" _ji -> CAST(FLOOR(CAST({tbl}.embedding[_ji] AS DOUBLE) * 1000)"
        f" AS BIGINT) * ([{arr}][_ji])))"
    )


_JL_ORACLE = f"""
    WITH h AS (
      SELECT vec_id, embedding,
             ROW_NUMBER() OVER (
               ORDER BY {sql_hash60("CAST(vec_id AS VARCHAR)")}, vec_id
             ) AS rn
      FROM embeddings
    ),
    pr AS MATERIALIZED (
      SELECT rn,
             list_transform(generate_series(1, {_JL_IN}),
               _jq -> CAST(FLOOR(CAST(h.embedding[_jq] AS DOUBLE) * 1000)
                           AS BIGINT)) AS q,
             [{", ".join(f"CAST(({_duck_proj(k, 'h')}) AS BIGINT)"
                         for k in range(_JL_OUT))}] AS p
      FROM h WHERE rn <= {2 * _JL_PAIRS}
    ),
    pairs AS (
      SELECT a.rn AS ci,
             CAST(list_sum(list_transform(generate_series(1, {_JL_IN}),
               _jd -> (a.q[_jd] - b.q[_jd]) * (a.q[_jd] - b.q[_jd])))
               AS BIGINT) AS d_orig,
             CAST(list_sum(list_transform(generate_series(1, {_JL_OUT}),
               _jp -> (a.p[_jp] - b.p[_jp]) * (a.p[_jp] - b.p[_jp])))
               AS BIGINT) AS d_proj
      FROM pr a JOIN pr b ON b.rn = a.rn + {_JL_PAIRS}
      WHERE a.rn <= {_JL_PAIRS}
    ),
    r AS (
      SELECT CAST(CAST(d_proj AS HUGEINT) * 1000000
                  // (CAST(d_orig AS HUGEINT) * {_JL_OUT}) AS BIGINT)
               AS ratio_ppm
      FROM pairs WHERE d_orig > 0
    )
    SELECT ratio_ppm // 100000 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(ratio_ppm) AS BIGINT) AS sum_ratio_ppm
    FROM r GROUP BY 1
"""


@register("jl_distortion_audit", _JL_ORACLE)
def jl_distortion_audit(spark, sf_dir):
    """JL distortion decile histogram over 64 hash-selected pairs — see
    module docstring. Output: (bucket, n_pairs, sum_ratio_ppm)."""
    emb = _t(spark, sf_dir, "embeddings")
    seeds = (
        emb.withColumn("h", hash60(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(2 * _JL_PAIRS)
    )
    ranked = bounded_rank(seeds, "h", "vec_id", primary_desc=False, out="rn")
    pr = ranked.select(
        "rn",
        F.expr(
            "transform(embedding,"
            " x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
        ).alias("q"),
        F.expr(
            "array(" + ", ".join(_spark_proj(k) for k in range(_JL_OUT)) + ")"
        ).alias("p"),
    )
    a = pr.select(F.col("rn").alias("ci"), F.col("q").alias("qa"), F.col("p").alias("pa"))
    b = pr.select(
        (F.col("rn") - _JL_PAIRS).alias("ci"),
        F.col("q").alias("qb"),
        F.col("p").alias("pb"),
    ).where(F.col("ci") >= 1)
    pairs = a.where(F.col("ci") <= _JL_PAIRS).join(F.broadcast(b), "ci").select(
        F.expr(
            "aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)),"
            " CAST(0 AS BIGINT), (acc, t) -> acc + t)"
        ).alias("d_orig"),
        F.expr(
            "aggregate(zip_with(pa, pb, (x, y) -> (x - y) * (x - y)),"
            " CAST(0 AS BIGINT), (acc, t) -> acc + t)"
        ).alias("d_proj"),
    )
    r = pairs.where(F.col("d_orig") > 0).select(
        F.expr(
            f"CAST(CAST(d_proj AS DECIMAL(38,0)) * 1000000"
            f" div (CAST(d_orig AS DECIMAL(38,0)) * {_JL_OUT}) AS BIGINT)"
        ).alias("ratio_ppm")
    )
    return r.groupBy(F.expr("ratio_ppm div 100000").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("ratio_ppm").cast("long").alias("sum_ratio_ppm"),
    )
