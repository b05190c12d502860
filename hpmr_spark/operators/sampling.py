"""Deterministic sampling + dataset splitting — training-data pipeline staples.

All splits are content-hash based (md5-derived hash60), never RNG: the same
row lands in the same split on any engine, any partition layout, any rerun —
the property that makes 100 TB pipeline runs reproducible and incremental
(new data doesn't reshuffle old assignments). `df.sample()` is unsuitable:
seed-dependent per-partition RNG changes with partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t
from hpmr_spark.functions.hashing import hash60, sql_hash60
from hpmr_spark.functions.text import quality_score_ppm


def hash_sample(df: DataFrame, key_col: str, pct: int) -> DataFrame:
    """Keep rows whose content hash falls in the first pct% of hash space."""
    return df.where(hash60(F.col(key_col).cast("string")) % 100 < pct)


def train_test_split(df: DataFrame, key_col: str, test_pct: int = 10) -> DataFrame:
    """Adds a 'split' column: 'test' for test_pct% of keys, else 'train'."""
    bucket = hash60(F.col(key_col).cast("string")) % 100
    return df.withColumn(
        "split", F.when(bucket < test_pct, "test").otherwise("train")
    )


@register(
    "sample_deterministic_10pct",
    f"""
    SELECT doc_id, n_chars FROM documents
    WHERE ({sql_hash60("CAST(doc_id AS VARCHAR)")}) % 100 < 10
    """,
)
def sample_deterministic_10pct(spark, sf_dir):
    """10% hash sample of documents — identical membership in any engine."""
    d = _t(spark, sf_dir, "documents")
    return hash_sample(d, "doc_id", 10).select("doc_id", "n_chars")


@register(
    "train_test_split_counts",
    f"""
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (SELECT n_chars,
                 CASE WHEN ({sql_hash60("CAST(doc_id AS VARCHAR)")}) % 100 < 10
                      THEN 'test' ELSE 'train' END AS split
          FROM documents)
    GROUP BY split
    """,
)
def train_test_split_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return train_test_split(d, "doc_id", 10).groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@register(
    "stratified_sample_per_lang",
    f"""
    SELECT lang, doc_id FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY ({sql_hash60("CAST(doc_id AS VARCHAR)")}), doc_id) AS rn
      FROM documents)
    WHERE rn <= 20
    """,
)
def stratified_sample_per_lang(spark, sf_dir):
    """Stratified sampling: 20 docs per language, chosen by hash order —
    a deterministic pseudo-random pick per stratum."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        hash60(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .select("lang", "doc_id")
    )


# ------------------------------------------------------- end-to-end pipeline

from hpmr_spark.dedup.shingles import SQL_SHINGLE_CTE  # noqa: E402


@register(
    "pipeline_corpus_filter",
    f"""
    WITH {SQL_SHINGLE_CTE},
    pairs AS (
      SELECT b.doc_id AS doc_b
      FROM shingled a, shingled b
      WHERE a.doc_id < b.doc_id
        AND 100 * len(list_intersect(a.sh, b.sh))
            >= 90 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))),
    q AS (
      SELECT doc_id, lang,
             floor(500000 * least(n_tok, 64) / 64)
           + floor(300000 * least(4 * n_sw, n_tok) / greatest(n_tok, 1))
           + floor(200000 * (n_chars - least(4 * n_punct, n_chars)) / greatest(n_chars, 1))
             AS quality_ppm
      FROM (SELECT doc_id, lang,
                   len(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tok,
                   length(text) AS n_chars,
                   len(list_filter(regexp_extract_all(lower(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'),
                                   x -> x IN ('the','a','and','of','is','in','to','it'))) AS n_sw,
                   length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS n_punct
            FROM documents))
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM q
    WHERE quality_ppm >= 500000
      AND doc_id NOT IN (SELECT doc_b FROM pairs)
    GROUP BY lang
    """,
)
def pipeline_corpus_filter(spark, sf_dir):
    """The composed pipeline: quality-filter → near-dup-drop → per-lang
    counts. One declarative plan across text scoring + dedup join — what a
    real corpus-curation run executes nightly at 100 TB."""
    from hpmr_spark.dedup.ngram import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    scored = d.select("doc_id", "lang", quality_score_ppm(F.col("text")).alias("q"))
    losers = (
        ngram_jaccard_pairs(d, threshold_pct=90)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = scored.where(F.col("q") >= 500000).join(losers, "doc_id", "left_anti")
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
