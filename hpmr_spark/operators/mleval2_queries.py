"""ML ranking/calibration metrics batch 2 (round 6): average precision
(PR-AUC) and the Murphy decomposition of the Brier score — completing
the ranking-metric family (ROC-AUC / MRR / nDCG / calibration bins).

Both reuse the committed deterministic scored frame from mleval_queries
(hash noise + label bump) and the integer disciplines: every rational
term floors ELEMENTWISE to nanos via int128 cross-multiplication before
any sum; suffix sums come from the two-pass bucketed
functions/ranking builder, never a partition-less window.

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's ML-eval axis.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register
from hpmr_spark.functions.ranking import global_order_multi
from hpmr_spark.operators.mleval_queries import _SCORED_SQL, _scored

# ---------------------------------------------------------------------------
# Average precision (tie-grouped: one term per distinct score).
# ---------------------------------------------------------------------------
_AP_ORACLE = f"""
    WITH s AS ({_SCORED_SQL}),
    g AS (
      SELECT score_ppm, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM s GROUP BY score_ppm
    ),
    r AS (
      SELECT score_ppm, cnt, pos,
             CAST(SUM(cnt) OVER (ORDER BY score_ppm DESC
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cnt_ge,
             CAST(SUM(pos) OVER (ORDER BY score_ppm DESC
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS pos_ge
      FROM g
    ),
    terms AS (
      SELECT CAST(SUM(CAST(CAST(pos AS HUGEINT) * pos_ge * 1000000000
                           // cnt_ge AS BIGINT)) AS BIGINT) AS t_sum,
             CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(cnt) AS BIGINT) AS n
      FROM r
    )
    SELECT n, n_pos,
           CAST(t_sum // n_pos AS BIGINT) AS avg_precision_nano
    FROM terms
"""


@register("average_precision_ppm", _AP_ORACLE)
def average_precision_ppm(spark, sf_dir):
    """Average precision (area under the PR curve, tie-grouped): at each
    distinct score threshold s (descending), precision = pos_ge/cnt_ge;
    AP = Σ pos(s)·precision(s) / n_pos. Each term floors to integer
    nanos via int128 cross-multiplication (pos·pos_ge·1e9 div cnt_ge)
    BEFORE the sum — the elementwise-floor discipline. Suffix sums over
    the score histogram come from the bucketed two-pass builder (one
    scan → keyed histogram → suffix pass → one aggregate; no global
    window at any scale)."""
    s = _scored(spark, sf_dir)
    g = s.groupBy("score_ppm").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("y").cast("long").alias("pos"),
    )
    r = global_order_multi(
        g,
        ["score_ppm"],
        running=[("cnt", "sum", False, "cnt_ge"), ("pos", "sum", False, "pos_ge")],
        descending=True,
    )
    terms = r.agg(
        F.sum(
            F.expr(
                "CAST(CAST(pos AS DECIMAL(38,0)) * pos_ge * 1000000000"
                " div cnt_ge AS BIGINT)"
            )
        )
        .cast("long")
        .alias("t_sum"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("cnt").cast("long").alias("n"),
    )
    return terms.select(
        "n",
        "n_pos",
        F.expr("CAST(t_sum div n_pos AS BIGINT)").alias("avg_precision_nano"),
    )


# ---------------------------------------------------------------------------
# Brier score + Murphy decomposition (10 probability bins).
# ---------------------------------------------------------------------------
_BRIER_ORACLE = f"""
    WITH s AS ({_SCORED_SQL}),
    b AS (
      SELECT score_ppm, y, score_ppm // 100000 AS bin,
             (score_ppm - 1000000 * y) AS e
      FROM s
    ),
    bins AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_b,
             CAST(SUM(score_ppm) AS BIGINT) AS sp_b,
             CAST(SUM(y) AS BIGINT) AS sy_b
      FROM b GROUP BY bin
    ),
    tot AS (
      SELECT CAST(SUM(n_b) AS BIGINT) AS n, CAST(SUM(sy_b) AS BIGINT) AS sy,
             CAST((SELECT SUM(CAST(e AS HUGEINT) * e) FROM b) AS HUGEINT)
               AS sse
      FROM bins
    )
    SELECT t.n, t.sy AS n_pos,
           CAST(t.sse * 1000000000 // (CAST(t.n AS HUGEINT) * 1000000000000)
                AS BIGINT) AS brier_nano,
           CAST(SUM(CAST((CAST(sp_b AS HUGEINT) - 1000000 * sy_b)
                         * (CAST(sp_b AS HUGEINT) - 1000000 * sy_b)
                         * 1000000000
                         // (CAST(n_b AS HUGEINT) * t.n * 1000000000000)
                         AS BIGINT)) AS BIGINT) AS reliability_nano,
           CAST(SUM(CAST((CAST(t.n AS HUGEINT) * sy_b
                          - CAST(n_b AS HUGEINT) * t.sy)
                         * (CAST(t.n AS HUGEINT) * sy_b
                            - CAST(n_b AS HUGEINT) * t.sy)
                         * 1000000000
                         // (CAST(n_b AS HUGEINT) * t.n * t.n * t.n)
                         AS BIGINT)) AS BIGINT) AS resolution_nano,
           CAST(CAST(t.sy AS HUGEINT) * (t.n - t.sy) * 1000000000
                // (CAST(t.n AS HUGEINT) * t.n) AS BIGINT)
             AS uncertainty_nano
    FROM bins, tot t
    GROUP BY t.n, t.sy, t.sse
"""


@register("brier_decomposition_nano", _BRIER_ORACLE)
def brier_decomposition_nano(spark, sf_dir):
    """Brier score with the Murphy decomposition (reliability −
    resolution + uncertainty) over 10 probability-decile bins, all in
    exact integer nanos: per-bin terms clear of divisions via common
    denominators ((Sp−1e6·Sy)²/n_b etc.), floor ONCE per bin (int128
    numerators, DECIMAL(38,0) ≡ HUGEINT), then sum — so the decomposition
    identity holds up to the documented per-bin floor slack, and the
    exact SSE-based Brier is reported beside it. One scan → 10-bin
    rollup → one aggregate."""
    s = _scored(spark, sf_dir)
    b = s.select(
        "score_ppm",
        "y",
        F.expr("score_ppm div 100000").alias("bin"),
        (F.col("score_ppm") - F.lit(1000000) * F.col("y")).alias("e"),
    )
    bins = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum("score_ppm").cast("long").alias("sp_b"),
        F.sum("y").cast("long").alias("sy_b"),
    )
    sse = b.agg(
        F.sum(F.expr("CAST(e AS DECIMAL(38,0)) * e")).alias("sse")
    )
    tot = bins.agg(
        F.sum("n_b").cast("long").alias("n"),
        F.sum("sy_b").cast("long").alias("sy"),
    ).crossJoin(F.broadcast(sse))
    rel = (
        "CAST((CAST(sp_b AS DECIMAL(38,0)) - 1000000 * sy_b)"
        " * (CAST(sp_b AS DECIMAL(38,0)) - 1000000 * sy_b)"
        " * 1000000000"
        " div (CAST(n_b AS DECIMAL(38,0)) * n * 1000000000000) AS BIGINT)"
    )
    res = (
        "CAST((CAST(n AS DECIMAL(38,0)) * sy_b - CAST(n_b AS DECIMAL(38,0)) * sy)"
        " * (CAST(n AS DECIMAL(38,0)) * sy_b - CAST(n_b AS DECIMAL(38,0)) * sy)"
        " * 1000000000"
        " div (CAST(n_b AS DECIMAL(38,0)) * n * n * n) AS BIGINT)"
    )
    return (
        bins.crossJoin(F.broadcast(tot))
        .groupBy("n", "sy", "sse")
        .agg(
            F.sum(F.expr(rel)).cast("long").alias("reliability_nano"),
            F.sum(F.expr(res)).cast("long").alias("resolution_nano"),
        )
        .select(
            "n",
            F.col("sy").alias("n_pos"),
            F.expr(
                "CAST(sse * 1000000000"
                " div (CAST(n AS DECIMAL(38,0)) * 1000000000000) AS BIGINT)"
            ).alias("brier_nano"),
            "reliability_nano",
            "resolution_nano",
            F.expr(
                "CAST(CAST(sy AS DECIMAL(38,0)) * (n - sy) * 1000000000"
                " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
            ).alias("uncertainty_nano"),
        )
    )
