"""Similarity search over an embedding column — exact baselines.

cosine_topk: for a (small, broadcast) set of query vectors, scan the corpus
once, compute cosine via JVM higher-order functions, rank per query with a
window. Linear in corpus size — the correct exact baseline at any scale
(queries broadcast; corpus never shuffles except the final per-query top-k,
which Spark executes as partial top-k per partition).

threshold_pairs: all corpus pairs with cosine ≥ τ — exact but O(n²); the
scale path is hpmr_spark.similarity.lsh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hpmr_spark.functions.vectors import cosine


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank 1..k) by descending cosine; deterministic
    tie-break on neighbor id. Cosine values are intentionally NOT in the
    output schema (cross-engine float repr noise); ranks are stable because
    adjacent similarities differ ≫ float error."""
    from hpmr_spark.functions.vectors import dot, norm

    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            norm(F.col(vec_col)).alias("q_nrm"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_nrm"),
    )
    scored = q.crossJoin(c).where(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_nrm") * F.col("c_nrm"))).alias(
            "sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def threshold_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold (id_a < id_b). O(n²) — baseline /
    verification oracle; use LSH-bucketed variant at scale."""
    from hpmr_spark.functions.vectors import dot, norm

    c = corpus.withColumn("_nrm", norm(F.col(vec_col)))
    a = c.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("_nrm").alias("na"))
    b = c.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("_nrm").alias("nb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .where(dot(F.col("va"), F.col("vb")) >= F.lit(threshold) * F.col("na") * F.col("nb"))
        .select("id_a", "id_b")
    )
