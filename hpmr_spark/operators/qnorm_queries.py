"""Quantile normalization across sources (round 6): map each source's
doc-length distribution onto the POOLED corpus distribution — the batch-
effect-removal transform (normalize lengths so every source contributes
the same length profile to a training mix) next to the existing robust
scaling / rank-normalize operators.

Committed transform: within each source, rank documents by the total
order (n_chars, doc_id); a document at rank r of N_s maps to the pooled
⌈r·N/N_s⌉-th smallest value under the same total order. Exact integers
throughout (the ceiling is an int128 cross-multiplication div).

Engine shape: source ranks are a source-PARTITIONED window; the pooled
rank uses functions/ranking.global_row_number (deterministic two-pass
bucketed builder — never a partition-less window); the lookup is one
equi-join on the ceiling rank. One fact-keyed shuffle per rank pass at
any scale.

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's ML-prep axis.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.ranking import global_row_number

_QNORM_ORACLE = """
    WITH d AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
      FROM documents
    ),
    src AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS src_rank,
             COUNT(*) OVER (PARTITION BY source) AS n_s
      FROM d
    ),
    pooled AS (
      SELECT n_chars AS pooled_chars,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS prn
      FROM d
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d)
    SELECT s.doc_id, s.source, s.n_chars,
           CAST(s.src_rank AS BIGINT) AS src_rank,
           CAST((CAST(s.src_rank AS HUGEINT) * t.n + s.n_s - 1) // s.n_s
                AS BIGINT) AS pooled_k,
           CAST(p.pooled_chars AS BIGINT) AS norm_chars
    FROM src s, tot t
    JOIN pooled p
      ON p.prn = (CAST(s.src_rank AS HUGEINT) * t.n + s.n_s - 1) // s.n_s
    ORDER BY s.doc_id
"""


@register("quantile_normalize_doclen", _QNORM_ORACLE)
def quantile_normalize_doclen(spark, sf_dir):
    """Quantile-normalize n_chars across sources — see module docstring.
    Output: per doc its source rank, the pooled target rank, and the
    normalized length (the pooled value at that rank)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )
    w_src = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    w_cnt = Window.partitionBy("source")
    src = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w_src).cast("long").alias("src_rank"),
        F.count(F.lit(1)).over(w_cnt).cast("long").alias("n_s"),
    )
    pooled = global_row_number(
        d.select(F.col("n_chars").alias("pooled_chars"), F.col("doc_id").alias("pid")),
        ["pooled_chars", "pid"],
        out="prn",
    ).select("pooled_chars", F.col("prn").cast("long").alias("prn"))
    tot = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    k = F.expr(
        "CAST((CAST(src_rank AS DECIMAL(38,0)) * n + n_s - 1) div n_s"
        " AS BIGINT)"
    )
    return (
        src.crossJoin(F.broadcast(tot))
        .withColumn("pooled_k", k)
        .join(pooled, F.col("pooled_k") == F.col("prn"))
        .select(
            "doc_id",
            "source",
            "n_chars",
            "src_rank",
            "pooled_k",
            F.col("pooled_chars").cast("long").alias("norm_chars"),
        )
        .orderBy("doc_id")
    )
