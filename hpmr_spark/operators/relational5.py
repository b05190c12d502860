"""Batch 5: non-equi (theta) join, global n-gram top-k, dedup resolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t
from hpmr_spark.dedup.ngram import ngram_jaccard_pairs
from hpmr_spark.dedup.shingles import SQL_SHINGLE_CTE, shingle_sets


@register(
    "nonequi_band_join",
    """
    WITH bands AS (
      SELECT i AS band_id, 900 + i * 10 AS lo, 900 + (i + 1) * 10 AS hi
      FROM range(0, 10) t(i))
    SELECT band_id, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band_id
    """,
)
def nonequi_band_join(spark, sf_dir):
    """Theta join: parts bucketed into price bands via BETWEEN-style
    predicates. The tiny band table broadcasts → BroadcastNestedLoopJoin,
    the only sane physical plan for non-equi conditions at scale."""
    p = _t(spark, sf_dir, "part")
    bands = spark.range(0, 10).select(
        F.col("id").alias("band_id"),
        (900 + F.col("id") * 10).cast("double").alias("lo"),
        (900 + (F.col("id") + 1) * 10).cast("double").alias("hi"),
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= F.col("lo")) & (p.p_retailprice < F.col("hi")),
        )
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.round(F.col("p_retailprice") * 100).cast("long")).alias(
                "sum_price_cents"
            ),
        )
    )


@register(
    "text_top_ngrams",
    f"""
    WITH {SQL_SHINGLE_CTE}
    SELECT g AS ngram, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM shingled, unnest(sh) AS t(g)
    GROUP BY g
    ORDER BY n_docs DESC, ngram LIMIT 20
    """,
)
def text_top_ngrams(spark, sf_dir):
    """Corpus-level top-20 3-grams by document frequency (explode →
    groupBy → TakeOrdered top-k; per-doc shingles are distinct so count =
    doc frequency)."""
    sh = shingle_sets(_t(spark, sf_dir, "documents"))
    return (
        sh.select(F.explode("sh").alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("ngram"))
        .limit(20)
    )


@register(
    "dedup_resolution_keep_docs",
    f"""
    WITH {SQL_SHINGLE_CTE},
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM shingled a, shingled b
      WHERE a.doc_id < b.doc_id
        AND 100 * len(list_intersect(a.sh, b.sh))
            >= 90 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))))
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
    """,
)
def dedup_resolution_keep_docs(spark, sf_dir):
    """Dedup RESOLUTION (the pipeline deliverable): drop every doc that
    near-duplicates a lower-id doc (greedy min-id representative via
    anti-join on the verified pair set); keep the rest."""
    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold_pct=90)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return docs.select("doc_id").join(losers, "doc_id", "left_anti")
