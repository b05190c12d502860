"""Arrow-native and grouped-pandas operator surface: mapInArrow (zero-copy
RecordBatch transform) and applyInPandas (grouped map — the full-group UDF).

Reference parity: these are the remaining UDF shapes from SURVEY.md §2.3's
UDF/UDAF/UDTF row — the reference's `for_each` handler and mapper lambdas
(src/concurrent_map.h:58, src/dist_map.h:48-50) generalized to batch
(Arrow) and per-group (pandas) execution. Python is the slow path: both
queries keep the Python work O(rows) with exact integer outputs so the
DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t


# ---------------------------------------------------------------------------
# mapInArrow: per-vector exact integer squared-norm from Arrow batches.
# ---------------------------------------------------------------------------
@register(
    "mapinarrow_embedding_norms",
    """
    SELECT vec_id,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
             AS BIGINT) AS norm_micros,
           CAST(len(embedding) AS BIGINT) AS n_dims
    FROM embeddings
    """,
)
def mapinarrow_embedding_norms(spark, sf_dir):
    """mapInArrow: the lowest-overhead Python path — RecordBatches cross the
    JVM↔Python boundary zero-copy, numpy does the math, no pandas object
    conversion at all. Per-element floor(x²·1e6) keeps every output an exact
    integer (float32→float64 widening is exact; both engines run the same
    IEEE double ops). At scale this is the template for any custom
    vectorized kernel Spark lacks natively."""
    import numpy as np
    import pyarrow as pa

    def norms(batches):
        for batch in batches:
            vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            embs = batch.column("embedding")
            out_norm = np.empty(len(vec_ids), dtype=np.int64)
            out_dims = np.empty(len(vec_ids), dtype=np.int64)
            for i in range(len(vec_ids)):
                x = np.asarray(embs[i].as_py(), dtype=np.float64)
                out_norm[i] = int(np.floor(x * x * 1000000.0).sum())
                out_dims[i] = x.size
            yield pa.RecordBatch.from_pydict(
                {"vec_id": vec_ids, "norm_micros": out_norm, "n_dims": out_dims}
            )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.mapInArrow(norms, "vec_id long, norm_micros long, n_dims long")


# ---------------------------------------------------------------------------
# applyInPandas: per-language corpus stats needing the whole group in memory.
# ---------------------------------------------------------------------------
@register(
    "grouped_map_lang_stats",
    """
    WITH r AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT lang,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS BIGINT)
             AS median_chars
    FROM r GROUP BY lang
    """,
)
def grouped_map_lang_stats(spark, sf_dir):
    """applyInPandas (grouped map): the whole group arrives as one pandas
    DataFrame — required for holistic stats like an exact median that no
    distributive aggregate expresses. Lower-median (element at (n+1)//2 of
    the sorted values) keeps the result an exact integer. Scale note: group
    cardinality (languages) is small but per-group size is unbounded — at
    100 TB pre-aggregate per (lang, shard) first or switch to
    percentile_approx; the grouped-map shape itself shuffles each group to
    one task, which is the documented cost of holistic UDAFs."""
    import pandas as pd

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["n_chars"].sort_values().to_numpy()
        n = len(v)
        return pd.DataFrame(
            [
                {
                    "lang": pdf["lang"].iloc[0],
                    "n_docs": n,
                    "sum_chars": int(v.sum()),
                    "min_chars": int(v[0]),
                    "max_chars": int(v[-1]),
                    "median_chars": int(v[(n + 1) // 2 - 1]),
                }
            ]
        )

    docs = _t(spark, sf_dir, "documents").select("lang", "n_chars")
    return docs.groupBy("lang").applyInPandas(
        stats,
        "lang string, n_docs long, sum_chars long, min_chars long, "
        "max_chars long, median_chars long",
    )


# ---------------------------------------------------------------------------
# zip_with: pairwise combine of two arrays (exact integer dot product).
# ---------------------------------------------------------------------------
@register(
    "hof_zipwith_dot_product",
    """
    SELECT a.vec_id,
           CAST(list_sum(list_transform(generate_series(1, len(a.embedding)),
                i -> CAST(FLOOR(CAST(a.embedding[i] AS DOUBLE)
                               * CAST(b.embedding[i] AS DOUBLE) * 1000000) AS BIGINT)))
             AS BIGINT) AS dot_micros
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    """,
)
def hof_zipwith_dot_product(spark, sf_dir):
    """zip_with: element-aligned combine of two array columns — the dot
    product of each vector with its successor, floored per term to exact
    integer micros (float32→float64 widening exact, identical IEEE ops both
    engines). zip_with + aggregate stays entirely in codegen: the join
    shuffles only (vec_id, embedding), no explode blow-up of dim× rows."""
    emb = _t(spark, sf_dir, "embeddings")
    a = emb.select("vec_id", F.col("embedding").alias("ea"))
    b = emb.select((F.col("vec_id") - 1).alias("vec_id"), F.col("embedding").alias("eb"))
    terms = F.zip_with(
        "ea",
        "eb",
        lambda x, y: F.floor(x.cast("double") * y.cast("double") * F.lit(1000000)).cast(
            "long"
        ),
    )
    dot = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, t: acc + t)
    return a.join(b, "vec_id").select("vec_id", dot.alias("dot_micros"))


# ---------------------------------------------------------------------------
# FILTER (WHERE) aggregate clause — per-aggregate predicates, one pass.
# ---------------------------------------------------------------------------
_FILTER_AGG_SQL = """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_all,
           CAST(COUNT(*) FILTER (WHERE l_quantity >= 25) AS BIGINT) AS n_bulk,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                FILTER (WHERE l_discount > 0.05) AS BIGINT) AS discounted_cents
    FROM lineitem
    GROUP BY l_returnflag
"""


@register("filter_clause_aggregates", _FILTER_AGG_SQL)
def filter_clause_aggregates(spark, sf_dir):
    """ANSI FILTER (WHERE) per-aggregate predicates — three differently-
    filtered aggregates in ONE scan + one shuffle (vs three self-joined
    subqueries); same SQL text planned by both engines."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_FILTER_AGG_SQL)
