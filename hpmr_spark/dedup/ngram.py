"""Exact n-gram Jaccard near-dedup via inverted-index pair join.

Algorithm (all DataFrame ops, one plan):
  1. shingle_sets → (doc_id, sh[])
  2. explode → inverted index (shingle → doc_id)
  3. self-join on shingle, count common shingles per (a, b) pair  = |A∩B|
  4. join per-doc set sizes, |A∪B| = |A|+|B|−|A∩B|
  5. threshold as EXACT INTEGER comparison: 100·inter ≥ pct·union
     (no float ratio → engine-invariant boundary behavior)

Scale notes: step 3's shuffle is keyed by shingle; high-document-frequency
shingles are the skew risk (a shingle in d docs contributes d² pair rows).
`df_cap` drops shingles with document frequency above a cap — at near-dup
thresholds (≥80%) a pair loses at most the capped shingles from the
intersection, so the cap is a recall/cost knob for planet-scale corpora;
the oracle-checked query runs uncapped (exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hpmr_spark.dedup.shingles import shingle_sets


def ngram_jaccard_pairs(
    docs: DataFrame, threshold_pct: int = 90, df_cap: int | None = None
) -> DataFrame:
    sh = shingle_sets(docs)
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    inv = sh.select("doc_id", F.explode("sh").alias("shingle"))
    if df_cap is not None:
        freq = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        inv = inv.join(freq.where(F.col("df") <= df_cap), on="shingle", how="left_semi")
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_union", F.col("na") + F.col("nb") - F.col("n_common"))
        .where(F.lit(100) * F.col("n_common") >= F.lit(threshold_pct) * F.col("n_union"))
        .select("doc_a", "doc_b", "n_common", F.col("n_union").cast("long").alias("n_union"))
    )
