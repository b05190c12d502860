"""LLM / pipeline evaluation operators (round 6, wave 6):

- pass_at_k_estimate: the unbiased pass@k estimator
  (1 − C(n−c, k)/C(n, k)) over per-user event "trials" (n = events,
  c = successes = purchases), for k ∈ {1, 5, 10}. The combinatorial
  ratio is the product of ≤ 10 exact-integer fractions evaluated in
  DOUBLE (only * and / — IEEE-identical across engines) and floored to
  ppm PER TASK; per-k aggregates are exact BIGINT sums over the floored
  values. Tasks with n < k are excluded; tasks with n − c < k pass with
  probability 1 (ratio 0) by the CASE guard — the descending-sequence
  rule's combinatorial cousin.
- blocking_quality_metrics: pair completeness and reduction ratio of
  8-token-prefix blocking, evaluated against the EXACT 3-gram-Jaccard
  ≥ 90% near-duplicate truth (the dedup_ngram_jaccard definition). The
  candidate count is Σ C(block_size, 2) computed from block sizes —
  candidates are never materialized — and completeness joins the truth
  pairs to the two block keys. Integer cross-multiplication everywhere;
  ratios in ppm via int128 floor div.

Scale notes (100 TB): pass@k is one events pass into a per-task
rollup; blocking metrics reuse the prefix-filtered SSJoin (the scaled
dedup path) plus one doc-keyed blocking pass — Σ C(s,2) costs nothing.

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's LLM-pipeline axis.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.dedup.ngram import ngram_jaccard_pairs
from hpmr_spark.dedup.shingles import SQL_SHINGLE_CTE
from hpmr_spark.functions.hashing import hash60, sql_hash60

# ---------------------------------------------------------------------------
# pass@k over per-user purchase trials.
# ---------------------------------------------------------------------------

_KS = (1, 5, 10)


def _ratio_expr(k: int) -> str:
    prod = " * ".join(
        f"(CAST(n - c - {i} AS DOUBLE) / CAST(n - {i} AS DOUBLE))"
        for i in range(k)
    )
    return (
        f"CASE WHEN n - c >= {k}"
        f" THEN CAST(FLOOR(({prod}) * 1000000) AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END"
    )


def _pass_struct(k: int) -> str:
    return (
        f"named_struct('k', CAST({k} AS BIGINT),"
        f" 'pass_ppm', 1000000 - ({_ratio_expr(k)}))"
    )


_PASSK_ORACLE = f"""
    WITH t AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    stacked AS (
      {" UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS k,"
        f" 1000000 - ({_ratio_expr(k)}) AS pass_ppm"
        f" FROM t WHERE n >= {k}" for k in _KS)}
    )
    SELECT k,
           CAST(COUNT(*) AS BIGINT) AS n_tasks,
           CAST(SUM(pass_ppm) AS BIGINT) AS sum_pass_ppm,
           CAST(CAST(SUM(pass_ppm) AS BIGINT) // COUNT(*) AS BIGINT)
             AS mean_pass_ppm
    FROM stacked GROUP BY k
"""


@register("pass_at_k_estimate", _PASSK_ORACLE)
def pass_at_k_estimate(spark, sf_dir):
    """Unbiased pass@k over per-user purchase trials — see module
    docstring. Output: 3 rows (k, n_tasks, sum_pass_ppm, mean_pass_ppm)."""
    ev = _t(spark, sf_dir, "events")
    t = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("c"),
    )
    stacked = t.select(
        "n",
        F.explode(
            F.expr(f"array({', '.join(_pass_struct(k) for k in _KS)})")
        ).alias("s"),
    ).where(F.col("n") >= F.col("s.k")).select("s.k", "s.pass_ppm")
    return stacked.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_tasks"),
        F.sum("pass_ppm").cast("long").alias("sum_pass_ppm"),
        F.expr("CAST(SUM(pass_ppm) div COUNT(*) AS BIGINT)").alias(
            "mean_pass_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Blocking quality vs exact near-dup truth.
# ---------------------------------------------------------------------------

_BLOCK_KEY_SPARK = None  # built inline below
_BLOCK_KEY_SQL = (
    "array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+')[1:8], ' ')"
)

_BLOCKQ_ORACLE = f"""
    WITH {SQL_SHINGLE_CTE},
    truth AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM shingled a, shingled b
      WHERE a.doc_id < b.doc_id
        AND 100 * len(list_intersect(a.sh, b.sh))
            >= 90 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
    ),
    keys AS (
      SELECT doc_id, {sql_hash60(_BLOCK_KEY_SQL)} AS bk FROM documents
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM keys),
    sizes AS (
      SELECT bk, CAST(COUNT(*) AS BIGINT) AS s FROM keys GROUP BY bk
    ),
    cand AS (
      SELECT CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS n_cand FROM sizes
    ),
    cov AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
             CAST(SUM(CASE WHEN ka.bk = kb.bk THEN 1 ELSE 0 END) AS BIGINT)
               AS n_covered
      FROM truth
      JOIN keys ka ON ka.doc_id = truth.doc_a
      JOIN keys kb ON kb.doc_id = truth.doc_b
    )
    SELECT cov.n_true, cov.n_covered, cand.n_cand,
           CAST(nn.n * (nn.n - 1) // 2 AS BIGINT) AS n_all_pairs,
           CAST(CAST(cov.n_covered AS HUGEINT) * 1000000
                // GREATEST(cov.n_true, 1) AS BIGINT) AS completeness_ppm,
           CAST(1000000 - CAST(cand.n_cand AS HUGEINT) * 1000000
                // (CAST(nn.n AS HUGEINT) * (nn.n - 1) // 2) AS BIGINT)
             AS reduction_ppm
    FROM cov, cand, nn
"""


@register("blocking_quality_metrics", _BLOCKQ_ORACLE)
def blocking_quality_metrics(spark, sf_dir):
    """Pair completeness + reduction ratio of 8-token-prefix blocking vs
    exact Jaccard-90 truth — see module docstring. Output: one row."""
    docs = _t(spark, sf_dir, "documents")
    truth = ngram_jaccard_pairs(docs, threshold_pct=90).select("doc_a", "doc_b")
    bk = hash60(
        F.array_join(
            F.slice(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0)
                ),
                1,
                8,
            ),
            " ",
        )
    )
    keys = docs.select("doc_id", bk.alias("bk"))
    nn = keys.agg(F.count(F.lit(1)).cast("long").alias("n"))
    sizes = keys.groupBy("bk").agg(F.count(F.lit(1)).cast("long").alias("s"))
    cand = sizes.agg(
        F.sum(F.expr("s * (s - 1) div 2")).cast("long").alias("n_cand")
    )
    ka = keys.select(F.col("doc_id").alias("doc_a"), F.col("bk").alias("bka"))
    kb = keys.select(F.col("doc_id").alias("doc_b"), F.col("bk").alias("bkb"))
    cov = (
        truth.join(ka, "doc_a")
        .join(kb, "doc_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_true"),
            F.sum(F.when(F.col("bka") == F.col("bkb"), 1).otherwise(0))
            .cast("long")
            .alias("n_covered"),
        )
    )
    return (
        cov.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(nn))
        .select(
            "n_true",
            "n_covered",
            "n_cand",
            F.expr("CAST(n * (n - 1) div 2 AS BIGINT)").alias("n_all_pairs"),
            F.expr(
                "CAST(CAST(n_covered AS DECIMAL(38,0)) * 1000000"
                " div GREATEST(n_true, 1) AS BIGINT)"
            ).alias("completeness_ppm"),
            F.expr(
                "CAST(1000000 - CAST(n_cand AS DECIMAL(38,0)) * 1000000"
                " div (CAST(n AS DECIMAL(38,0)) * (n - 1) div 2) AS BIGINT)"
            ).alias("reduction_ppm"),
        )
    )
