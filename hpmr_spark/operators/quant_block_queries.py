"""Round-12 wave 3: block quantization formats over the embedding corpus —
the storage-side arithmetic a vector pipeline audits before committing to
a format, all in exact integer algebra (the committed float→floor(·1e6)
micros image, then pure BIGINT):

- absmax_int8_block_quant: symmetric per-block absmax int8 (the
  LLM.int8() / bitsandbytes vector-wise scheme, Dettmers et al. 2022):
  q = v·127 div A with round-toward-zero (Spark `div` ≡ DuckDB `//` on
  BIGINT — both truncate toward zero, CLAUDE.md round-5 fact), exact
  reconstruction-error census in the 127·A integer scale.
- msfp_block_float_census: shared-exponent block floating point (MSFP,
  Darvish Rouhani et al. NeurIPS 2020): per-block exponent
  E = max(bitlen(absmax) − 7, 0) via the cross-engine exact
  ⌊log₂⌋ = length(bin(x)) − 1 identity (CLAUDE.md round-2 fact), signed
  7-bit-magnitude mantissas q = v div 2^E, exact L1 reconstruction error
  + flush-to-zero census.

Scale shape: posexplode → per-(vec, block) absmax agg → join back → final
agg — two shuffles, linear in corpus size, no windows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register

_VMIC_SPARK = (
    "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000)"
    " AS BIGINT))"
)
_VMIC_DUCK = (
    "list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000)"
    " AS BIGINT))"
)


def _explode_duck(block: int) -> str:
    return f"""
      SELECT vec_id, v, (i - 1) // {block} AS block
      FROM (SELECT vec_id,
                   unnest({_VMIC_DUCK}) AS v,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
    """


# -------------------------------------------------------- absmax int8

_I8_BLOCK = 16  # dims per quantization block (committed)

_I8_ORACLE = f"""
    WITH vi AS ({_explode_duck(_I8_BLOCK)}),
    bm AS (
      SELECT vec_id, block, CAST(MAX(abs(v)) AS BIGINT) AS a
      FROM vi GROUP BY vec_id, block
    ),
    q AS (
      SELECT vi.vec_id, vi.block, bm.a, vi.v,
             CASE WHEN bm.a = 0 THEN 0 ELSE (vi.v * 127) // bm.a END AS qq
      FROM vi JOIN bm ON vi.vec_id = bm.vec_id AND vi.block = bm.block
    )
    SELECT vec_id, CAST(block AS BIGINT) AS block,
           CAST(MAX(a) AS BIGINT) AS absmax_micro,
           CAST(SUM(abs(127 * v - qq * a)) AS BIGINT) AS err_l1_scaled,
           CAST(SUM(CASE WHEN abs(qq) = 127 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_saturated
    FROM q GROUP BY vec_id, block
"""


@register("absmax_int8_block_quant", _I8_ORACLE)
def absmax_int8_block_quant(spark, sf_dir):
    """Symmetric absmax int8 block quantization (LLM.int8(), Dettmers et
    al. 2022) over {_I8_BLOCK}-dim blocks of the integer-micros embedding
    image: q = v·127 div absmax (round-toward-zero — identical truncation
    in both engines), per-block reconstruction error Σ|127·v − q·A| kept
    in the exact 127·A integer scale (no float division anywhere), plus
    the saturated-element census. All-zero blocks quantize to 0 with zero
    error (committed)."""
    e = _t(spark, sf_dir, "embeddings")
    vi = e.select(
        "vec_id", F.posexplode(F.expr(_VMIC_SPARK)).alias("dim0", "v")
    ).select(
        "vec_id", "v", (F.col("dim0") / _I8_BLOCK).cast("long").alias("block")
    )
    bm = vi.groupBy("vec_id", "block").agg(
        F.max(F.abs("v")).cast("long").alias("a")
    )
    q = vi.join(bm, ["vec_id", "block"]).select(
        "vec_id",
        "block",
        "a",
        "v",
        F.expr(
            "CASE WHEN a = 0 THEN 0 ELSE (v * 127) div a END"
        ).alias("qq"),
    )
    return q.groupBy("vec_id", "block").agg(
        F.max("a").cast("long").alias("absmax_micro"),
        F.sum(F.expr("abs(127 * v - qq * a)")).cast("long").alias(
            "err_l1_scaled"
        ),
        F.sum(F.expr("CASE WHEN abs(qq) = 127 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_saturated"),
    )


absmax_int8_block_quant.__doc__ = absmax_int8_block_quant.__doc__.replace(
    "{_I8_BLOCK}", str(_I8_BLOCK)
)


# ----------------------------------------------------- MSFP block float

_MS_BLOCK = 8  # dims per shared-exponent block (committed)
# 2^E lookup, E in 0..56: bitlen(a) ≤ 63 for ANY BIGINT micros image, so
# e2 = bitlen − 7 ≤ 56 and the table can never be out-indexed (ADVICE r10:
# the old 16-entry table threw in ANSI Spark / NULLed in DuckDB if absmax
# micros ever exceeded 2^22). Every entry fits int64 (2^56 < 2^63).
_P2 = ",".join(str(1 << b) for b in range(57))

_MS_ORACLE = f"""
    WITH vi AS ({_explode_duck(_MS_BLOCK)}),
    bm AS (
      SELECT vec_id, block, CAST(MAX(abs(v)) AS BIGINT) AS a
      FROM vi GROUP BY vec_id, block
    ),
    be AS (
      SELECT vec_id, block, a,
             CASE WHEN a = 0 THEN 0
                  WHEN length(bin(a)) - 7 > 0 THEN length(bin(a)) - 7
                  ELSE 0 END AS e2
      FROM bm
    ),
    q AS (
      SELECT vi.vec_id, vi.block, be.a, be.e2, vi.v,
             vi.v // list_extract(list_value({_P2}),
                                  CAST(be.e2 + 1 AS INT)) AS qq,
             list_extract(list_value({_P2}), CAST(be.e2 + 1 AS INT)) AS p2
      FROM vi JOIN be ON vi.vec_id = be.vec_id AND vi.block = be.block
    )
    SELECT vec_id, CAST(block AS BIGINT) AS block,
           CAST(MAX(a) AS BIGINT) AS absmax_micro,
           CAST(MAX(e2) AS BIGINT) AS exp2,
           CAST(SUM(abs(v - qq * p2)) AS BIGINT) AS err_l1,
           CAST(SUM(CASE WHEN qq = 0 AND v <> 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_flushed
    FROM q GROUP BY vec_id, block
"""


@register("msfp_block_float_census", _MS_ORACLE)
def msfp_block_float_census(spark, sf_dir):
    """Shared-exponent block floating point (MSFP — Darvish Rouhani et
    al. NeurIPS 2020) over {_MS_BLOCK}-dim blocks: the block exponent is
    E = max(bitlen(absmax) − 7, 0) (so mantissa magnitudes fit 7 bits),
    computed with the exact cross-engine length(bin(x)) identity;
    mantissas are q = v div 2^E (truncation toward zero, identical both
    engines; 2^E via a 57-entry literal power table covering the full
    BIGINT bitlen range, so no input can out-index it — no float pow).
    Emits per-block exponent, exact L1 reconstruction error, and the
    flush-to-zero census (elements whose whole magnitude dies under the
    shared exponent — MSFP's known small-value failure mode)."""
    e = _t(spark, sf_dir, "embeddings")
    vi = e.select(
        "vec_id", F.posexplode(F.expr(_VMIC_SPARK)).alias("dim0", "v")
    ).select(
        "vec_id", "v", (F.col("dim0") / _MS_BLOCK).cast("long").alias("block")
    )
    bm = vi.groupBy("vec_id", "block").agg(
        F.max(F.abs("v")).cast("long").alias("a")
    )
    be = bm.select(
        "vec_id",
        "block",
        "a",
        F.expr(
            "CASE WHEN a = 0 THEN 0"
            " WHEN length(bin(a)) - 7 > 0 THEN length(bin(a)) - 7"
            " ELSE 0 END"
        ).alias("e2"),
    )
    q = vi.join(be, ["vec_id", "block"]).select(
        "vec_id",
        "block",
        "a",
        "e2",
        "v",
        F.expr(
            f"v div element_at(array({_P2}), CAST(e2 + 1 AS INT))"
        ).alias("qq"),
        F.expr(
            f"element_at(array({_P2}), CAST(e2 + 1 AS INT))"
        ).alias("p2"),
    )
    return q.groupBy("vec_id", "block").agg(
        F.max("a").cast("long").alias("absmax_micro"),
        F.max("e2").cast("long").alias("exp2"),
        F.sum(F.expr("abs(v - qq * p2)")).cast("long").alias("err_l1"),
        F.sum(F.expr("CASE WHEN qq = 0 AND v <> 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_flushed"),
    )


msfp_block_float_census.__doc__ = msfp_block_float_census.__doc__.replace(
    "{_MS_BLOCK}", str(_MS_BLOCK)
)
