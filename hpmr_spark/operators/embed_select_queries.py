"""Embedding feature selection (round 6, wave 6).

fisher_discriminant_dims: per-dimension Fisher discriminant ratio for
the one-vs-rest split of label 1 in the embeddings table — the classic
filter-method feature selector. Values are quantized to integer
millis per dimension FIRST (elementwise floor — the established
float-array discipline), so all class moments (n, Σx, Σx²) are exact
BIGINTs; the ratio

  F_d = (μ1 − μ0)² / (σ0² + σ1²)    (MLE variances)

is ONE double expression over the six exact integer moments, floored
to nano, and the top-8 dimensions are selected by (f_nano DESC, dim
ASC) — a bounded 64-row re-rank (broadcast non-equi, no global
window). Output: 8 rows (dim, n0, n1, f_nano).

Scale notes (100 TB): one posexplode pass into a 64×2-group rollup;
everything after is bounded by the dimensionality.

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's similarity axis.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.ranking import bounded_rank

# One double expression over exact integer moments — identical text both
# engines (m0* = class-0 moments, m1* = class-1).
_FISHER = (
    "CAST(FLOOR(("
    " (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    "  - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    " * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    "  - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    ") / ("
    " (CAST(q0 AS DOUBLE) / CAST(n0 AS DOUBLE)"
    "  - (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    "    * (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)))"
    " + (CAST(q1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    "  - (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
    "    * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)))"
    ") * 1000000000) AS BIGINT)"
)

_FISHER_ORACLE = f"""
    WITH v AS (
      SELECT CASE WHEN label = 1 THEN 1 ELSE 0 END AS cls,
             generate_subscripts(embedding, 1) AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT)
               AS x
      FROM embeddings
    ),
    m AS (
      SELECT dim,
             CAST(SUM(CASE WHEN cls = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN cls = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN cls = 0 THEN x ELSE 0 END) AS BIGINT) AS s0,
             CAST(SUM(CASE WHEN cls = 1 THEN x ELSE 0 END) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN cls = 0 THEN x * x ELSE 0 END) AS BIGINT) AS q0,
             CAST(SUM(CASE WHEN cls = 1 THEN x * x ELSE 0 END) AS BIGINT) AS q1
      FROM v GROUP BY dim
    ),
    f AS (
      SELECT CAST(dim AS BIGINT) AS dim, n0, n1, {_FISHER} AS f_nano
      FROM m WHERE n0 > 0 AND n1 > 0
    )
    SELECT dim, n0, n1, f_nano FROM f
    ORDER BY f_nano DESC, dim ASC LIMIT 8
"""


@register("fisher_discriminant_dims", _FISHER_ORACLE)
def fisher_discriminant_dims(spark, sf_dir):
    """Top-8 embedding dimensions by Fisher discriminant ratio (label 1
    vs rest) — see module docstring. Output: 8 rows (dim, n0, n1,
    f_nano)."""
    emb = _t(spark, sf_dir, "embeddings")
    v = emb.select(
        F.when(F.col("label") == 1, 1).otherwise(0).alias("cls"),
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
            )
        ).alias("dim0", "x"),
    ).select("cls", (F.col("dim0") + 1).cast("long").alias("dim"), "x")
    m = v.groupBy("dim").agg(
        F.sum(F.when(F.col("cls") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("cls") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("cls") == 0, F.col("x")).otherwise(0))
        .cast("long")
        .alias("s0"),
        F.sum(F.when(F.col("cls") == 1, F.col("x")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("cls") == 0, F.expr("x * x")).otherwise(0))
        .cast("long")
        .alias("q0"),
        F.sum(F.when(F.col("cls") == 1, F.expr("x * x")).otherwise(0))
        .cast("long")
        .alias("q1"),
    )
    f = m.where((F.col("n0") > 0) & (F.col("n1") > 0)).select(
        "dim", "n0", "n1", F.expr(_FISHER).alias("f_nano")
    )
    top = f.orderBy(F.col("f_nano").desc(), F.col("dim")).limit(8)
    return top.select("dim", "n0", "n1", "f_nano")
