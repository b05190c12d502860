"""Incremental-dedup epochs, numpy-path similarity, range-frame windows."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t
from hpmr_spark.dedup.incremental import incremental_dedup


@register(
    "dedup_incremental_epochs",
    """
    WITH batch1 AS (SELECT doc_id, text FROM documents WHERE doc_id < 250),
    batch2 AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= 250
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 250),
    fp1 AS (SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
            FROM batch1),
    accepted2 AS (
      SELECT b.doc_id FROM (
        SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM batch2) b
      JOIN (SELECT fp, MIN(doc_id) AS keeper FROM (
              SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
              FROM batch2) GROUP BY fp) w
        ON b.fp = w.fp AND b.doc_id = w.keeper
      WHERE b.fp NOT IN (SELECT fp FROM fp1))
    SELECT 'epoch1' AS epoch, CAST((SELECT COUNT(*) FROM batch1) AS BIGINT) AS n_accepted
    UNION ALL
    SELECT 'epoch2' AS epoch, CAST((SELECT COUNT(*) FROM accepted2) AS BIGINT) AS n_accepted
    """,
)
def dedup_incremental_epochs(spark, sf_dir):
    """Two-epoch incremental dedup: epoch 2 re-submits epoch 1's texts under
    new ids (synthetic cross-epoch dups) — state filtering must reject all of
    them and accept only genuinely new docs."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    b1 = docs.where(F.col("doc_id") < 250)
    clones = docs.where(F.col("doc_id") < 250).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    b2 = docs.where(F.col("doc_id") >= 250).unionByName(clones)
    acc1, state = incremental_dedup(None, b1)
    acc2, _ = incremental_dedup(state, b2)
    spark_df = acc1.agg(F.count(F.lit(1)).alias("n_accepted")).select(
        F.lit("epoch1").alias("epoch"), "n_accepted"
    ).unionByName(
        acc2.agg(F.count(F.lit(1)).alias("n_accepted")).select(
            F.lit("epoch2").alias("epoch"), "n_accepted"
        )
    )
    return spark_df


def _numpy_gate_oracle() -> str:
    from hpmr_spark.functions.vectors import sql_cosine

    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
               WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, embedding FROM embeddings)
    SELECT query_id, neighbor_id, rank, TRUE AS numpy_rank_equal FROM (
      SELECT q.query_id, c.neighbor_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY {sql_cosine('q.embedding', 'c.embedding', 64)} DESC,
                        c.neighbor_id
             ) AS BIGINT) AS rank
      FROM q, c WHERE q.query_id != c.neighbor_id)
    WHERE rank <= 10
    """


@register("similarity_topk_numpy", _numpy_gate_oracle())
def similarity_topk_numpy(spark, sf_dir):
    """Arrow→numpy GEMM top-k (the production dense-vector path), gated
    (VERDICT r8 item 2): the hashed VALUES are the exact JVM path's
    (query_id, neighbor_id, rank) — SQL-reproducible — plus a boolean
    asserting the numpy GEMM produced the identical neighbor at that rank.
    GEMM summation order can differ from the sequential fold in the last
    ulp, so rank equality is a committed property of THIS corpus (adjacent
    sims differ ≫ float error; also pytest-asserted) — a regression flips
    the boolean and the value hash goes red."""
    from hpmr_spark.similarity.brute_force import cosine_topk
    from hpmr_spark.similarity.vectorized import cosine_topk_numpy

    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    exact = cosine_topk(e, q, k=10)
    np_tk = cosine_topk_numpy(e, q, k=10).withColumnRenamed(
        "neighbor_id", "np_neighbor"
    )
    return exact.join(np_tk, ["query_id", "rank"], "left").select(
        "query_id",
        "neighbor_id",
        "rank",
        F.coalesce(
            F.col("np_neighbor") == F.col("neighbor_id"), F.lit(False)
        ).alias("numpy_rank_equal"),
    )


@register(
    "window_range_30day_spend",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS BIGINT)
             AS spend_30d_cents
    FROM orders
    """,
)
def window_range_30day_spend(spark, sf_dir):
    """RANGE frame (value-based, not row-based): per customer, trailing
    30-day spend. Peers at equal order dates aggregate together — identical
    semantics to DuckDB's interval RANGE frame."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-30 * 86400 * 1_000_000, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .over(w)
        .alias("spend_30d_cents"),
    )
