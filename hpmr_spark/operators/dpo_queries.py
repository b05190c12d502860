"""Round-13 wave C: dpo_implicit_reward_margins — the DPO implicit-reward
eval census (Rafailov et al., NeurIPS 2023): for preference pairs
(chosen, rejected), the implicit reward margin is
β·[(logπ(c) − logπ_ref(c)) − (logπ(r) − logπ_ref(r))]; the fraction of
pairs with positive margin is the "implicit reward accuracy" tracked
during RLHF/DPO training, and the per-language margin mass locates
domains where the policy diverged from its reference.

Pairs: consecutive documents within a language (row_number over
(lang, doc_id), odd paired with even — a partitioned window, never
global). Log-probabilities are COMMITTED integer-micro pseudo-scores
from md5 arithmetic (the r8 synthetic-corpus discipline; swapping in
real model logprobs changes only the two score columns), with a planted
hash-gated policy boost on ~70% of chosen documents so the win rate is
structurally non-vacuous. β = 1 — every number stays an exact integer;
the mean margin uses truncating integer division (identical toward-zero
semantics in both engines, CLAUDE.md r5).

Scale: one scan + one per-lang window + one agg — linear.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.hashing import spark_sql_hash60, sql_hash60


def _lp(hash60_fn, salt: str, doc: str) -> str:
    """Committed pseudo-logprob in integer micro units (≤ 0)."""
    h = hash60_fn(f"'{salt}:' || CAST({doc} AS STRING)")
    return f"(0 - {h} % 20000000)"


def _boost(hash60_fn, doc: str) -> str:
    """Hash-gated policy boost on the CHOSEN side (~70% of pairs)."""
    h = hash60_fn(f"'dpob:' || CAST({doc} AS STRING)")
    return f"(CASE WHEN {h} % 10 < 7 THEN 5000000 ELSE 0 END)"


_DPO_ORACLE = f"""
    WITH r AS (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents
    ),
    p AS (
      SELECT a.lang, a.doc_id AS c_doc, b.doc_id AS r_doc
      FROM r a JOIN r b
        ON a.lang = b.lang AND b.rn = a.rn + 1
      WHERE a.rn % 2 = 1
    ),
    m AS (
      SELECT lang,
             ({_lp(sql_hash60, 'dpop', 'c_doc')}
              + {_boost(sql_hash60, 'c_doc')}
              - {_lp(sql_hash60, 'dpor', 'c_doc')})
             - ({_lp(sql_hash60, 'dpop', 'r_doc')}
                - {_lp(sql_hash60, 'dpor', 'r_doc')}) AS margin
      FROM p
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN margin > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_wins,
           CAST(CAST(SUM(CASE WHEN margin > 0 THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000 // CAST(COUNT(*) AS BIGINT) AS BIGINT) AS win_ppm,
           CAST(SUM(margin) AS BIGINT) AS sum_margin_micro,
           CAST(CASE WHEN SUM(margin) >= 0
                THEN CAST(SUM(margin) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
                ELSE 0 - ((0 - CAST(SUM(margin) AS BIGINT))
                          // CAST(COUNT(*) AS BIGINT)) END AS BIGINT)
             AS mean_margin_micro
    FROM m GROUP BY lang
"""


@register("dpo_implicit_reward_margins", _DPO_ORACLE)
def dpo_implicit_reward_margins(spark, sf_dir):
    """DPO implicit-reward margin census per language — see the module
    docstring. The mean margin sign-splits its integer division so a
    negative margin mass floors identically in both engines (the
    committed toward-zero // ≡ div identity holds, but the sign-split
    keeps the text self-evidently exact)."""
    d = _t(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy("doc_id")
    r = d.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
    a = r.where(F.col("rn") % 2 == 1).select(
        "lang", F.col("doc_id").alias("c_doc"), F.col("rn").alias("rn_a")
    )
    b = r.select(
        F.col("lang").alias("lang_b"),
        F.col("doc_id").alias("r_doc"),
        F.col("rn").alias("rn_b"),
    )
    p = a.join(
        b,
        (F.col("lang") == F.col("lang_b"))
        & (F.col("rn_b") == F.col("rn_a") + 1),
    )
    m = p.select(
        "lang",
        F.expr(
            f"({_lp(spark_sql_hash60, 'dpop', 'c_doc')}"
            f" + {_boost(spark_sql_hash60, 'c_doc')}"
            f" - {_lp(spark_sql_hash60, 'dpor', 'c_doc')})"
            f" - ({_lp(spark_sql_hash60, 'dpop', 'r_doc')}"
            f" - {_lp(spark_sql_hash60, 'dpor', 'r_doc')})"
        ).alias("margin"),
    )
    return m.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.expr("CASE WHEN margin > 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_wins"),
        F.expr(
            "CAST(CAST(SUM(CASE WHEN margin > 0 THEN 1 ELSE 0 END)"
            " AS BIGINT) * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("win_ppm"),
        F.sum("margin").cast("long").alias("sum_margin_micro"),
        F.expr(
            "CAST(CASE WHEN SUM(margin) >= 0"
            " THEN CAST(SUM(margin) AS BIGINT) div COUNT(*)"
            " ELSE 0 - ((0 - CAST(SUM(margin) AS BIGINT)) div COUNT(*))"
            " END AS BIGINT)"
        ).alias("mean_margin_micro"),
    )
