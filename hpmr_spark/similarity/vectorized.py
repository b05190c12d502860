"""Arrow-vectorized similarity — the numpy/BLAS path for dense vector math.

The JVM higher-order-function path (brute_force.py) keeps everything in
Catalyst; for dense linear algebra at production scale the winning layout is
Arrow batches → numpy matmul (one BLAS GEMM per ~10K-row batch instead of
per-row expression folds). This module is that path: queries broadcast as a
numpy matrix, corpus streams through mapInPandas.

Approximation note: float32 BLAS accumulation differs from the JVM's double
fold in the last bits, so this path is registered rows-only; rank agreement
with the exact path is asserted in tests (identical on this corpus — gaps
between neighbors ≫ float32 noise).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cosine_topk_numpy(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine via per-batch GEMM: sims = Q_norm @ C_norm.T."""
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([r[1] for r in q_rows], dtype=np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)

    spark = corpus.sparkSession
    bq_ids = spark.sparkContext.broadcast(q_ids)
    bQ = spark.sparkContext.broadcast(Q)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Qm, ids = bQ.value, bq_ids.value
        for pdf in batches:
            C = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            C /= np.linalg.norm(C, axis=1, keepdims=True)
            sims = Qm @ C.T  # (n_queries, batch)
            n_q, n_c = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, n_c),
                    "neighbor_id": np.tile(pdf[id_col].to_numpy(), n_q),
                    "sim": sims.ravel(),
                }
            )

    scored = (
        corpus.select(id_col, vec_col)
        .mapInPandas(score, "query_id long, neighbor_id long, sim double")
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
