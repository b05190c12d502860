"""IVF-PQ composed end-to-end (VERDICT r5 item 6): the billion-vector ANN
index shape — coarse IVF cell routing (trained k-means centroids), product
quantization of the RESIDUAL vectors inside each cell, ADC (asymmetric
distance) scoring against per-query lookup tables, and an exact re-rank of
the ADC shortlist (the Faiss "IVFPQ + refine" topology).

Why this survives 100 TB / 10^9 vectors:
  * the corpus is scanned ONCE to assign cells and encode residuals into
    M small codes (8 nibbles here = 4 bytes/vector instead of 256 — the
    compression that keeps the index RAM-resident);
  * queries probe only their n_probe nearest cells, so the ADC join
    grazes ~n_probe/n_cells of the CODES (never the float vectors);
  * the only fact-scale shuffle-free join is codes ⋈ broadcast(LUT);
    the exact refine touches just |queries| × shortlist rows.

Determinism (CLAUDE.md disciplines): centroid training is the committed
hash60-seeded k-means from similarity/lsh.py (floats only STEER the index);
residuals quantize to integer micros elementwise (the committed
float→floor(·1e6) parity rule); code assignment and ADC sums are exact
integers with (d2, code) / (adc_d2, id) tie-breaks; the final ranking is
an EXACT cosine re-score of the shortlist, so approximation never corrupts
an emitted score. Approximate by design → registered rows-only; recall ≥
0.9 vs exact top-k is gated on the clustered fixture
(tests/test_dedup.py::test_ivfpq_recall_clustered).

Reference parity: extends the engine past the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the similarity-search axis the
brief makes first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hpmr_spark.functions.hashing import hash60
from hpmr_spark.functions.vectors import cosine
from hpmr_spark.similarity.lsh import (
    nearest_cell,
    nearest_cells,
    train_centroids,
)

M_SUB = 8  # PQ subspaces
D_SUB = 8  # dims per subspace (64-dim embeddings)
K_CODES = 16  # centroids per subspace (4-bit codes)


def _residual_micros(vcol, cents: list[list[float]], cell_col) -> "F.Column":
    """floor((vec - centroid[cell]) * 1e6) as array<bigint> — the exact
    integer image of the residual (elementwise, the committed parity
    discipline). The centroid is selected by a fold over literal arrays
    (n_cells branches, linear — never a chained running best)."""
    cent_arr = F.element_at(
        F.array(
            *[F.array(*[F.lit(float(x)) for x in cv]) for cv in cents]
        ),
        cell_col + 1,
    )
    return F.zip_with(
        vcol.cast("array<double>"),
        cent_arr,
        lambda a, b: F.floor((a - b) * F.lit(1_000_000.0)).cast("long"),
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    train_iters: int = 2,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ approximate top-k with exact refine.

    Index build (one corpus scan + broadcast constants):
      cell  = nearest trained coarse centroid (cosine),
      codes = per-subspace argmin_code ‖residual_sub − codebook_sub‖²
              (exact integer micros; codebook = residual subvectors of the
              K_CODES lowest-committed-hash corpus vectors).
    Search: per query, LUT[s][code] = d2(query residual sub, codebook) for
    its n_probe cells; ADC score = Σ_s LUT[s][codes[s]] via one
    codes ⋈ broadcast(LUT) join on cell; top `shortlist` by (adc_d2, id)
    per query are re-scored with EXACT cosine and the final (query_id,
    neighbor_id, rank ≤ k) emitted. The default refine factor is 10×k:
    inside a tight cluster the PQ residual codes are nearly constant, so
    ADC cannot order in-cluster neighbors — the shortlist must cover the
    cluster, not just k (recall@10 on the clustered fixture: 0.865 at
    L=4k vs ≥0.9 at L=10k)."""
    L = shortlist or 10 * k
    d = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    cents = train_centroids(d, n_cells=n_cells, train_iters=train_iters, salt="ivfpq:")

    # --- index: cell + residual micros per corpus vector (one scan) ---
    assigned = d.select(
        "id", "vec", nearest_cell(F.col("vec"), cents).alias("cell")
    ).withColumn("r", _residual_micros(F.col("vec"), cents, F.col("cell")))

    # --- PQ codebook: residual subvectors of committed-hash seed vectors ---
    seed_rows = (
        assigned.select(
            "r",
            hash60(F.concat(F.lit("ivfpq-pq:"), F.col("id").cast("string"))).alias(
                "h"
            ),
        )
        .orderBy("h")
        .limit(K_CODES)
        .collect()
    )
    # code id = committed-hash rank (driver-side: K_CODES rows, bounded)
    codebook = [
        [list(r["r"][s * D_SUB : (s + 1) * D_SUB]) for s in range(M_SUB)]
        for r in sorted(seed_rows, key=lambda r: r["h"])
    ]

    def _sub(col, s):
        return F.slice(col, s * D_SUB + 1, D_SUB)

    def _d2(sub_col, code_lits: list[int]) -> "F.Column":
        lit_arr = F.array(*[F.lit(int(x)) for x in code_lits])
        return F.aggregate(
            F.zip_with(sub_col, lit_arr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    def _code_for(sub_col, s: int) -> "F.Column":
        # argmin over K_CODES candidates: array_min over (d2, code) structs
        # (ties break to the LOWEST code id — struct ordering)
        cand = F.array(
            *[
                F.struct(
                    _d2(sub_col, codebook[code][s]).alias("d2"),
                    F.lit(code).alias("code"),
                )
                for code in range(K_CODES)
            ]
        )
        return F.array_min(cand)["code"]

    encoded = assigned.select(
        F.col("id").alias("neighbor_id"),
        "cell",
        F.array(
            *[_code_for(_sub(F.col("r"), s), s) for s in range(M_SUB)]
        ).alias("codes"),
    )

    # --- query side: probe cells + per-(query, cell) LUT ---
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn(
        "cell", F.explode(nearest_cells(F.col("q_vec"), cents, n_probe))
    )
    qr = q.withColumn("qr", _residual_micros(F.col("q_vec"), cents, F.col("cell")))
    # LUT: array over subspaces of array over codes of exact integer d2
    lut_col = F.array(
        *[
            F.array(
                *[
                    _d2(_sub(F.col("qr"), s), codebook[code][s])
                    for code in range(K_CODES)
                ]
            )
            for s in range(M_SUB)
        ]
    )
    qlut = qr.select("query_id", "q_vec", "cell", lut_col.alias("lut"))

    # --- ADC: codes ⋈ broadcast(LUT) on cell; score = Σ_s lut[s][code_s] ---
    adc = (
        encoded.join(F.broadcast(qlut), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "q_vec",
            "neighbor_id",
            F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    F.col("lut"),
                    lambda c, row: F.element_at(row, (c + 1).cast("int")),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("adc_d2"),
        )
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.asc("adc_d2"), F.asc("neighbor_id")
    )
    short = adc.withColumn("_sr", F.row_number().over(w_short)).where(
        F.col("_sr") <= L
    )

    # --- exact refine of the shortlist (|queries|·L rows, broadcast) ---
    refined = F.broadcast(short.select("query_id", "q_vec", "neighbor_id")).join(
        d.select(F.col("id").alias("neighbor_id"), F.col("vec").alias("c_vec")),
        "neighbor_id",
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        refined.select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w_final).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
