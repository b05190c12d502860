"""Pipeline / evaluation operators, third batch (round 6, wave 6):

- randomized_response_estimate: Warner randomized response with a
  COMMITTED hash coin (report truth iff hash60(user)%4 < 3, i.e.
  p = 3/4): the unbiased estimate of the true proportion is
  π = 2·P(yes) − 1/2, computed exactly as
  (4·n_yes − n)·1e6 div (2n) in int128 — the local-DP collection
  pipeline with a deterministic, oracle-checkable coin.
- lead_summary_rouge1: ROUGE-1 recall of each document's 16-token
  "lead summary" against its body (multiset overlap via Σ min(counts)),
  per-document ppm floors aggregated per language. Documents with ≤ 16
  tokens are excluded on BOTH engines.
- correlated_sample_fk: join-preserving (FK-correlated) 10% sampling —
  sample CUSTOMERS by hash60 % 10 = 0 and take all their orders, so
  foreign keys stay complete inside the sample; report the
  scale-up revenue estimate against the exact total and its signed
  error in ppm (int128). The training-data-subsetting primitive: row
  sampling breaks entities, entity sampling doesn't.
- spiegelhalter_z_nano: Spiegelhalter's calibration Z for the committed
  score p = quantity/50 predicting returnflag = 'R'. Both the numerator
  Σ(y−p)(1−2p) and variance Σ(1−2p)²p(1−p) are EXACT integer sums
  after clearing denominators (50² and 50⁴); Z is one final double
  expression over the two ints (sqrt IEEE — portable).

Scale notes (100 TB): all four are single fact passes into 1-row /
per-language rollups; the sampling query is two passes (sampled +
exact) sharing the scan.

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's pipeline axis.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.hashing import hash60, sql_hash60
from hpmr_spark.sources.tables import load_events

# ---------------------------------------------------------------------------
# Warner randomized response with a committed hash coin.
# ---------------------------------------------------------------------------

_RR_COIN = "CAST(user_id AS STRING)"
_RR_COIN_SQL = "CAST(user_id AS VARCHAR)"

_RR_ORACLE = f"""
    WITH u AS (
      SELECT user_id,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       > 0 THEN 1 ELSE 0 END AS truth,
             CASE WHEN {sql_hash60("'rr1|' || " + _RR_COIN_SQL)} % 4 < 3
                  THEN 1 ELSE 0 END AS honest
      FROM events GROUP BY user_id
    ),
    rep AS (
      SELECT user_id, truth,
             CASE WHEN honest = 1 THEN truth ELSE 1 - truth END AS said
      FROM u
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(truth) AS BIGINT) AS n_true,
           CAST(SUM(said) AS BIGINT) AS n_yes,
           CAST((4 * CAST(SUM(said) AS HUGEINT) - COUNT(*)) * 1000000
                // (2 * CAST(COUNT(*) AS HUGEINT)) AS BIGINT) AS pi_est_ppm,
           CAST(CAST(SUM(truth) AS HUGEINT) * 1000000
                // CAST(COUNT(*) AS HUGEINT) AS BIGINT) AS pi_true_ppm
    FROM rep
"""


@register("randomized_response_estimate", _RR_ORACLE)
def randomized_response_estimate(spark, sf_dir):
    """Warner randomized response with a committed coin — see module
    docstring. Output: one row (n_users, n_true, n_yes, pi_est_ppm,
    pi_true_ppm)."""
    ev = load_events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.when(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) > 0, 1
        )
        .otherwise(0)
        .alias("truth"),
    ).withColumn(
        "honest",
        F.when(
            hash60(F.concat(F.lit("rr1|"), F.col("user_id").cast("string"))) % 4 < 3,
            1,
        ).otherwise(0),
    )
    rep = u.select(
        "truth",
        F.when(F.col("honest") == 1, F.col("truth"))
        .otherwise(1 - F.col("truth"))
        .alias("said"),
    )
    return rep.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("truth").cast("long").alias("n_true"),
        F.sum("said").cast("long").alias("n_yes"),
        F.expr(
            "CAST((4 * CAST(SUM(said) AS DECIMAL(38,0)) - COUNT(*)) * 1000000"
            " div (2 * CAST(COUNT(*) AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("pi_est_ppm"),
        F.expr(
            "CAST(CAST(SUM(truth) AS DECIMAL(38,0)) * 1000000"
            " div CAST(COUNT(*) AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("pi_true_ppm"),
    )


# ---------------------------------------------------------------------------
# ROUGE-1 recall of the 16-token lead vs the body, per language.
# ---------------------------------------------------------------------------

_ROUGE_ORACLE = """
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split(text, ' ')) AS w,
             generate_subscripts(string_split(text, ' '), 1) AS i,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ),
    ft AS (SELECT * FROM tok WHERE n_tok > 16),
    c AS (
      SELECT doc_id, lang, w,
             CAST(SUM(CASE WHEN i <= 16 THEN 1 ELSE 0 END) AS BIGINT) AS cs,
             CAST(SUM(CASE WHEN i > 16 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM ft GROUP BY doc_id, lang, w
    ),
    d AS (
      SELECT doc_id, lang,
             CAST(SUM(LEAST(cs, cb)) AS BIGINT) AS inter,
             CAST(SUM(cb) AS BIGINT) AS body_n
      FROM c GROUP BY doc_id, lang
    ),
    r AS (
      SELECT lang,
             CAST(CAST(inter AS HUGEINT) * 1000000 // body_n AS BIGINT)
               AS rouge_ppm
      FROM d WHERE body_n > 0
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(CAST(SUM(rouge_ppm) AS HUGEINT) // COUNT(*) AS BIGINT)
             AS mean_rouge1_recall_ppm
    FROM r GROUP BY lang
"""


@register("lead_summary_rouge1", _ROUGE_ORACLE)
def lead_summary_rouge1(spark, sf_dir):
    """ROUGE-1 recall of the 16-token lead vs the body per language —
    see module docstring. Output: (lang, n_docs,
    mean_rouge1_recall_ppm)."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.posexplode(F.split("text", " ")).alias("i0", "w"),
    ).select(
        "doc_id", "lang", "n_tok", (F.col("i0") + 1).alias("i"), "w"
    ).where(F.col("n_tok") > 16)
    c = tok.groupBy("doc_id", "lang", "w").agg(
        F.sum(F.when(F.col("i") <= 16, 1).otherwise(0)).cast("long").alias("cs"),
        F.sum(F.when(F.col("i") > 16, 1).otherwise(0)).cast("long").alias("cb"),
    )
    d = c.groupBy("doc_id", "lang").agg(
        F.sum(F.least("cs", "cb")).cast("long").alias("inter"),
        F.sum("cb").cast("long").alias("body_n"),
    )
    r = d.where(F.col("body_n") > 0).select(
        "lang",
        F.expr(
            "CAST(CAST(inter AS DECIMAL(38,0)) * 1000000 div body_n AS BIGINT)"
        ).alias("rouge_ppm"),
    )
    return r.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("CAST(SUM(rouge_ppm) div COUNT(*) AS BIGINT)").alias(
            "mean_rouge1_recall_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# FK-correlated 10% sampling with the scale-up estimator.
# ---------------------------------------------------------------------------

_FKS_ORACLE = f"""
    WITH samp AS (
      SELECT c_custkey FROM customer
      WHERE {sql_hash60("'fks|' || CAST(c_custkey AS VARCHAR)")} % 10 = 0
    ),
    so AS (
      SELECT o.o_orderkey, CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN samp s ON s.c_custkey = o.o_custkey
    ),
    agg AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM samp) AS n_cust_sampled,
             CAST(COUNT(*) AS BIGINT) AS n_orders_sampled,
             CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS revenue_sampled_cents
      FROM so
    ),
    ex AS (
      SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS exact_cents
      FROM orders
    )
    SELECT a.n_cust_sampled, a.n_orders_sampled, a.revenue_sampled_cents,
           CAST(a.revenue_sampled_cents * 10 AS BIGINT) AS estimate_cents,
           ex.exact_cents,
           CAST((CAST(a.revenue_sampled_cents AS HUGEINT) * 10
                 - ex.exact_cents) * 1000000
                // CAST(ex.exact_cents AS HUGEINT) AS BIGINT) AS err_ppm
    FROM agg a, ex
"""


@register("correlated_sample_fk", _FKS_ORACLE)
def correlated_sample_fk(spark, sf_dir):
    """FK-correlated 10% customer sample + scale-up revenue estimate —
    see module docstring. Output: one row."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    samp = c.where(
        hash60(F.concat(F.lit("fks|"), F.col("c_custkey").cast("string"))) % 10 == 0
    ).select("c_custkey")
    ns = samp.agg(F.count(F.lit(1)).cast("long").alias("n_cust_sampled"))
    so = o.join(samp, o["o_custkey"] == samp["c_custkey"]).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    agg = so.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders_sampled"),
        F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias(
            "revenue_sampled_cents"
        ),
    )
    ex = o.agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("exact_cents")
    )
    return (
        agg.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(ex))
        .select(
            "n_cust_sampled",
            "n_orders_sampled",
            "revenue_sampled_cents",
            (F.col("revenue_sampled_cents") * 10).cast("long").alias(
                "estimate_cents"
            ),
            "exact_cents",
            F.expr(
                "CAST((CAST(revenue_sampled_cents AS DECIMAL(38,0)) * 10"
                " - exact_cents) * 1000000"
                " div CAST(exact_cents AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("err_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Spiegelhalter calibration Z for p = quantity/50 predicting flag 'R'.
# ---------------------------------------------------------------------------

_SPG_Z = (
    "(CAST(num AS DOUBLE) / 2500.0)"
    " / SQRT(CAST(den AS DOUBLE) / 6250000.0)"
)

_SPG_ORACLE = f"""
    WITH r AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM((50 * y - q) * (50 - 2 * q)) AS BIGINT) AS num,
             CAST(SUM((50 - 2 * q) * (50 - 2 * q) * q * (50 - q)) AS BIGINT)
               AS den
      FROM r
    )
    SELECT n, num, den, {_SPG_Z} AS spiegelhalter_z
    FROM m
"""


@register("spiegelhalter_z_nano", _SPG_ORACLE)
def spiegelhalter_z_nano(spark, sf_dir):
    """Spiegelhalter calibration Z for p = q/50 vs returnflag 'R' — see
    module docstring. Output: one row (n, num, den, spiegelhalter_z)."""
    li = _t(spark, sf_dir, "lineitem")
    r = li.select(
        F.col("l_quantity").cast("long").alias("q"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    m = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("(50 * y - q) * (50 - 2 * q)")).cast("long").alias("num"),
        F.sum(F.expr("(50 - 2 * q) * (50 - 2 * q) * q * (50 - q)"))
        .cast("long")
        .alias("den"),
    )
    return m.select("n", "num", "den", F.expr(_SPG_Z).alias("spiegelhalter_z"))
