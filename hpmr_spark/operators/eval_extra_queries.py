"""Round-12 wave 5: evaluation-curve operators —

- brevity_penalty_census: the BLEU brevity penalty (Papineni et al.
  ACL 2002): BP = 1 if c > r else e^(1−r/c) — the EXP-parity commitment,
  floored to nanos PER PAIR before any sum (the elementwise-floor
  discipline), censused per lang over the (even=candidate, odd=reference)
  doc pairs.
- roc_convex_hull: the ROC convex hull (Provost & Fawcett ML 2001 —
  the set of potentially-optimal operating points under ANY cost/class
  skew): cumulative (FP, TP) operating points over a committed 64-bucket
  threshold grid, hull membership by the exact-integer cross-product
  criterion on the BOUNDED point set (the convex_hull_upper idiom).

Scale: brevity is one token-length agg + pair join; ROC points are one
histogram agg + a bounded prefix pass — the hull test runs on ≤65 rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register

# ---------------------------------------------------------- brevity penalty

_BP_ORACLE = """
    WITH lens AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
               AS BIGINT) AS n_tok
      FROM documents
    ),
    pairs AS (
      SELECT c.lang, c.n_tok AS c_len, r.n_tok AS r_len,
             CASE WHEN c.n_tok = 0 THEN 0
                  WHEN c.n_tok > r.n_tok THEN 1000000000
                  ELSE CAST(FLOOR(exp(1.0e0 - CAST(r.n_tok AS DOUBLE)
                         / CAST(c.n_tok AS DOUBLE)) * 1000000000.0e0)
                       AS BIGINT) END AS bp_nano
      FROM lens c JOIN lens r ON r.doc_id = c.doc_id + 1
      WHERE c.doc_id % 2 = 0
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(bp_nano) AS BIGINT) AS sum_bp_nano,
           CAST(MIN(bp_nano) AS BIGINT) AS min_bp_nano,
           CAST(SUM(CASE WHEN bp_nano = 1000000000 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_unpenalized
    FROM pairs GROUP BY lang
"""


@register("brevity_penalty_census", _BP_ORACLE)
def brevity_penalty_census(spark, sf_dir):
    """BLEU brevity penalty (Papineni et al. 2002, eq. 11) for each
    (even doc_id = candidate, doc_id+1 = reference) pair: BP = 1 when
    c > r, else e^(1−r/c). The exponential uses the pinned cross-engine
    EXP commitment and floors to integer nanos PER PAIR, so the per-lang
    sums are exact integer aggregations (no order-sensitive float sum).
    Zero-length candidates emit 0 (committed sentinel). One length agg +
    one adjacent-id join."""
    d = _t(spark, sf_dir, "documents")
    lens = d.select(
        "doc_id",
        "lang",
        F.expr(
            "CAST(size(filter(split(text, ' '), w -> w <> '')) AS BIGINT)"
        ).alias("n_tok"),
    )
    c = lens.where(F.col("doc_id") % 2 == 0).select(
        "doc_id", "lang", F.col("n_tok").alias("c_len")
    )
    r = lens.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("n_tok").alias("r_len")
    )
    pairs = c.join(r, "doc_id").select(
        "lang",
        F.expr(
            "CASE WHEN c_len = 0 THEN 0"
            " WHEN c_len > r_len THEN 1000000000"
            " ELSE CAST(FLOOR(exp(1.0e0 - CAST(r_len AS DOUBLE)"
            " / CAST(c_len AS DOUBLE)) * 1000000000.0e0) AS BIGINT) END"
        ).alias("bp_nano"),
    )
    return pairs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("bp_nano").cast("long").alias("sum_bp_nano"),
        F.min("bp_nano").cast("long").alias("min_bp_nano"),
        F.sum(F.expr("CASE WHEN bp_nano = 1000000000 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_unpenalized"),
    )


# ------------------------------------------------------------- ROC hull

_ROC_BUCKETS = 64  # committed threshold grid


def _roc_oracle() -> str:
    from hpmr_spark.operators.mleval_queries import _SCORED_SQL

    return f"""
    WITH s AS ({_SCORED_SQL}),
    b AS (
      SELECT score_ppm * {_ROC_BUCKETS} // 1000000 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(y) AS BIGINT) AS pos
      FROM s GROUP BY 1
    ),
    cum AS (
      SELECT b.bucket,
             CAST(SUM(b2.pos) AS BIGINT) AS tp,
             CAST(SUM(b2.cnt - b2.pos) AS BIGINT) AS fp
      FROM b JOIN b b2 ON b2.bucket >= b.bucket
      GROUP BY b.bucket
    ),
    pts AS MATERIALIZED (
      SELECT fp AS x, tp AS y FROM cum
      UNION SELECT 0 AS x, 0 AS y
    )
    SELECT p.x AS fp, p.y AS tp FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts a, pts b
      WHERE a.x < p.x AND p.x < b.x
        AND (b.y - a.y) * (p.x - a.x) - (p.y - a.y) * (b.x - a.x) > 0
    )
    AND NOT EXISTS (
      SELECT 1 FROM pts c WHERE c.x = p.x AND c.y > p.y
    )
"""


@register("roc_convex_hull", _roc_oracle())
def roc_convex_hull(spark, sf_dir):
    """ROC convex hull (Provost & Fawcett 2001): the operating points
    that are optimal under SOME cost/skew. Points = cumulative (FP, TP)
    counts at a committed {_ROC_BUCKETS}-bucket score-threshold grid
    (descending thresholds → cumulative sums over buckets ≥ t, computed
    as a bounded non-equi self-join on the ≤{_ROC_BUCKETS}-row
    histogram) plus the (0,0) reject-all point. Hull membership by the
    exact-integer cross-product criterion on the bounded point set — a
    point is OFF the hull iff some segment passes strictly above it
    (the convex_hull_upper idiom; no floats anywhere)."""
    from hpmr_spark.operators.mleval_queries import _scored

    s = _scored(spark, sf_dir)
    b = s.groupBy(
        F.expr(f"score_ppm * {_ROC_BUCKETS} div 1000000").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("y").cast("long").alias("pos"),
    )
    b2 = b.select(
        F.col("bucket").alias("b2"),
        F.col("cnt").alias("cnt2"),
        F.col("pos").alias("pos2"),
    )
    cum = (
        b.join(F.broadcast(b2), F.col("b2") >= F.col("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum("pos2").cast("long").alias("tp"),
            F.sum(F.col("cnt2") - F.col("pos2")).cast("long").alias("fp"),
        )
    )
    pts = (
        cum.select(F.col("fp").alias("x"), F.col("tp").alias("y"))
        .union(
            cum.sparkSession.range(1).select(
                F.lit(0).cast("long").alias("x"), F.lit(0).cast("long").alias("y")
            )
        )
        .distinct()
    )
    a = pts.select(F.col("x").alias("ax"), F.col("y").alias("ay"))
    bb = pts.select(F.col("x").alias("bx"), F.col("y").alias("by"))
    dominated = (
        pts.join(F.broadcast(a), F.col("ax") < F.col("x"))
        .join(
            F.broadcast(bb),
            (F.col("bx") > F.col("x"))
            & (
                (F.col("by") - F.col("ay")) * (F.col("x") - F.col("ax"))
                - (F.col("y") - F.col("ay")) * (F.col("bx") - F.col("ax"))
                > 0
            ),
        )
        .select("x", "y")
        .distinct()
    )
    # equal-x dominance (ADVICE r10): a point with the same FP count but a
    # strictly higher TP count dominates outright — the straddling-segment
    # test (strict ax < x < bx) cannot see vertical dominance, so score
    # buckets containing only positives would otherwise leave a dominated
    # point (same fp, lower tp) on the "hull".
    c = pts.select(F.col("x").alias("cx"), F.col("y").alias("cy"))
    same_x_dom = (
        pts.join(
            F.broadcast(c),
            (F.col("cx") == F.col("x")) & (F.col("cy") > F.col("y")),
        )
        .select("x", "y")
        .distinct()
    )
    return (
        pts.join(dominated, ["x", "y"], "left_anti")
        .join(same_x_dom, ["x", "y"], "left_anti")
        .select(F.col("x").alias("fp"), F.col("y").alias("tp"))
    )


roc_convex_hull.__doc__ = roc_convex_hull.__doc__.replace(
    "{_ROC_BUCKETS}", str(_ROC_BUCKETS)
)
