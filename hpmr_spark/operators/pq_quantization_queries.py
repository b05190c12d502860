"""Product-quantization batch (round 5): PQ encode — the IVF-PQ
compression step every billion-vector ANN index runs (Faiss/ScaNN style):
split each embedding into M subvectors, assign each to its nearest
codebook centroid, store M small codes instead of the float vector.

Determinism (CLAUDE.md disciplines): vectors quantize to integer micros
elementwise (floor — the committed float32→int parity rule); the
codebook is derived from COMMITTED-HASH seed vectors (bottom-16 by
hash60, the ivf_topk_trained discipline — no RNG); distances are exact
integer squared-L2 with a (d2, code) tie-break; reconstruction SSE
accumulates in int128.

Reference parity: extends the engine surface beyond the reference's kv
kernel (/root/reference/src/hpmr.h:1-10) along the similarity-search
axis the brief makes first-class (ANN at 100 TB needs compressed
residency; PQ is that compression).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.hashing import hash60, sql_hash60

_M_SUB = 8  # subspaces
_D_SUB = 8  # dims per subspace (64-dim embeddings)
_K_CODES = 16  # centroids per subspace

_D2_DUCK = (
    "CAST(list_sum(list_transform(range(1, {d} + 1),"
    " k -> (sv[k] - cv[k]) * (sv[k] - cv[k]))) AS BIGINT)"
).format(d=_D_SUB)

_PQ_ORACLE = f"""
    WITH vi AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
      FROM embeddings
    ),
    seeds AS (
      SELECT vec_id AS seed_id, v,
             ROW_NUMBER() OVER (ORDER BY h) AS code
      FROM (
        SELECT vec_id, v,
               CAST({sql_hash60("'pq:' || CAST(vec_id AS VARCHAR)")} AS BIGINT)
                 AS h
        FROM vi ORDER BY h LIMIT {_K_CODES}
      )
    ),
    cents AS (
      SELECT s.s, code, v[s.s * {_D_SUB} + 1 : s.s * {_D_SUB} + {_D_SUB}] AS cv
      FROM seeds, range(0, {_M_SUB}) s(s)
    ),
    subs AS (
      SELECT vec_id, s.s,
             v[s.s * {_D_SUB} + 1 : s.s * {_D_SUB} + {_D_SUB}] AS sv
      FROM vi, range(0, {_M_SUB}) s(s)
    ),
    cand AS (
      SELECT subs.vec_id, subs.s, cents.code, {_D2_DUCK} AS d2
      FROM subs JOIN cents ON cents.s = subs.s
    ),
    best AS (
      SELECT vec_id, s, code, d2,
             ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                ORDER BY d2, code) AS rn
      FROM cand
    )
    SELECT CAST(s AS BIGINT) AS subspace, CAST(code AS BIGINT) AS code,
           CAST(COUNT(*) AS BIGINT) AS n_assigned,
           CAST(CAST(SUM(CAST(d2 AS HUGEINT)) AS HUGEINT) AS BIGINT)
             AS total_d2
    FROM best WHERE rn = 1
    GROUP BY s, code
"""


@register("pq_encode_subvectors", _PQ_ORACLE)
def pq_encode_subvectors(spark, sf_dir):
    """PQ encoding of the embedding corpus: 8 subspaces × 8 dims, 16
    codes per subspace (64-dim float vector → 8 nibbles = 4 bytes, a 64×
    compression — the memory trick that keeps billion-vector ANN indexes
    RAM-resident). Codebook = subvectors of the 16 committed-hash seed
    vectors (bottom-16 by hash60; rank = code id via bounded_rank — the
    deterministic stand-in for k-means codebook training, same discipline
    as ivf_topk_trained's seeds); assignment is exact integer-micro
    squared-L2 with (d2, code) struct-min tie-break. The report is the
    per-(subspace, code) cell census + reconstruction SSE (int128
    accumulation) — the codebook-balance diagnostic a PQ training loop
    watches. Spark shape: the 128-subvector codebook broadcasts; the
    corpus is scanned ONCE, exploded ×8 subspaces, each probing 16
    candidates via a zip_with fold — no embedding shuffle; the only
    exchanges carry (vec_id, s, code, d2) and the final 128-row cells."""
    from hpmr_spark.functions.ranking import bounded_rank

    e = _t(spark, sf_dir, "embeddings")
    vi = e.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000)"
            " AS BIGINT))"
        ).alias("v"),
    )
    seeded = vi.select(
        "vec_id",
        "v",
        hash60(F.concat(F.lit("pq:"), F.col("vec_id").cast("string"))).alias("h"),
    )
    seeds16 = seeded.orderBy("h").limit(_K_CODES)
    seeds = bounded_rank(seeds16, "h", "vec_id", primary_desc=False, out="code")
    sgrid = spark.range(0, _M_SUB).select(F.col("id").cast("int").alias("s"))
    cents = seeds.crossJoin(F.broadcast(sgrid)).select(
        "s",
        F.col("code").cast("int").alias("code"),
        F.expr(f"slice(v, s * {_D_SUB} + 1, {_D_SUB})").alias("cv"),
    )
    subs = vi.crossJoin(F.broadcast(sgrid)).select(
        "vec_id",
        "s",
        F.expr(f"slice(v, s * {_D_SUB} + 1, {_D_SUB})").alias("sv"),
    )
    cand = subs.join(F.broadcast(cents), "s").select(
        "vec_id",
        "s",
        "code",
        F.expr(
            "aggregate(zip_with(sv, cv, (a, b) -> (a - b) * (a - b)),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ).alias("d2"),
    )
    best = cand.groupBy("vec_id", "s").agg(
        F.min(F.struct("d2", "code")).alias("m")
    )
    return best.groupBy(
        F.col("s").cast("long").alias("subspace"),
        F.col("m.code").cast("long").alias("code"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_assigned"),
        F.expr("CAST(SUM(CAST(m.d2 AS DECIMAL(38,0))) AS BIGINT)").alias(
            "total_d2"
        ),
    )
