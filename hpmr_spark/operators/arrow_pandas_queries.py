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
