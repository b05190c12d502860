"""Cross-modal retrieval plumbing: a deterministic text encoder (hash-sign
random projection of the token multiset — the same committed ±1 sign
construction as embedding_random_projection) produces a query vector in
the corpus embedding space; retrieval is then an exact-integer dot-product
top-k against the int8-quantized corpus.

The encoder is a STAND-IN for a real text tower (the container has no
model runtime — same honesty contract as the multimodal decode stub): the
Spark-side plumbing (token explode → signed-sum per dimension → broadcast
query vector → one corpus scan → top-k) is exactly what CLIP-style
text→image retrieval runs at scale, and every number is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.littables import values_df
from hpmr_spark.functions.hashing import hash60, sql_hash60

_QUERY_TERMS = ["join", "filter"]
_DIMS = 64
_Q_SCALE = 200  # corpus quantization, same commitment as similarity_topk_int8

_TERMS_SQL = ", ".join(f"('{t}')" for t in _QUERY_TERMS)


@register(
    "crossmodal_text_to_vec_topk",
    f"""
    WITH dims AS (SELECT UNNEST(range({_DIMS})) AS j),
    terms AS (SELECT * FROM (VALUES {_TERMS_SQL}) t(tok)),
    enc AS (
      SELECT j,
             CAST(SUM(CASE WHEN {sql_hash60("tok || '#' || CAST(j AS VARCHAR)")}
                           % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS qv
      FROM terms CROSS JOIN dims GROUP BY j
    ),
    corpus AS (
      SELECT vec_id,
             u.i - 1 AS j,
             CAST(FLOOR(CAST(u.v AS DOUBLE) * {_Q_SCALE}) AS BIGINT) AS cv
      FROM embeddings,
           LATERAL (SELECT UNNEST(embedding) AS v,
                           generate_subscripts(embedding, 1) AS i) u
    ),
    dots AS (
      SELECT corpus.vec_id, CAST(SUM(corpus.cv * enc.qv) AS BIGINT) AS dot
      FROM corpus JOIN enc ON corpus.j = enc.j
      GROUP BY corpus.vec_id
    ),
    r AS (
      SELECT vec_id, dot,
             ROW_NUMBER() OVER (ORDER BY dot DESC, vec_id) AS rnk
      FROM dots
    )
    SELECT vec_id, dot, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 10
    """,
)
def crossmodal_text_to_vec_topk(spark, sf_dir):
    """Text→embedding retrieval: the committed hash-sign encoder maps the
    query token multiset to a 64-dim integer vector (qv_j = Σ ±1, signs
    content-addressed per (token, dim)); the corpus quantizes to the
    committed int8 scale; scores are EXACT integer dot products via
    zip_with/aggregate against the one-row broadcast query vector, and the
    global top-10 needs only per-partition top-k + a 10-row merge. Swap
    the encoder for a real text tower and nothing else changes — the scan,
    broadcast, and ranking shape is production CLIP retrieval. Oracle
    recomputes encoder, quantization, and ranking relationally."""
    dims = spark.range(_DIMS).select(F.col("id").cast("long").alias("j"))
    terms = values_df(spark, [(t,) for t in _QUERY_TERMS], "tok string")
    enc = (
        terms.crossJoin(dims)
        .select(
            "j",
            F.when(
                hash60(
                    F.concat(F.col("tok"), F.lit("#"), F.col("j").cast("string"))
                )
                % 2
                == 0,
                1,
            )
            .otherwise(-1)
            .alias("s"),
        )
        .groupBy("j")
        .agg(F.sum("s").cast("long").alias("qv"))
        .orderBy("j")
    )
    # collect_list order after a shuffle is unspecified — build the ordered
    # query vector via sort on the (j, qv) struct
    qvec = enc.agg(
        F.expr("transform(array_sort(collect_list(struct(j, qv))), x -> x.qv)").alias(
            "q"
        )
    )
    e = _t(spark, sf_dir, "embeddings")
    corpus = e.select(
        "vec_id",
        F.expr(
            f"transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * {_Q_SCALE}) AS BIGINT))"
        ).alias("c"),
    )
    dots = corpus.crossJoin(F.broadcast(qvec)).select(
        "vec_id",
        F.expr(
            "aggregate(zip_with(c, q, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("dot"),
    )
    # top-10 selection as TakeOrderedAndProject (per-partition heaps over
    # the corpus-scale scored frame); the re-rank window sees 10 rows
    from hpmr_spark.functions.ranking import bounded_rank

    top = dots.orderBy(F.desc("dot"), F.asc("vec_id")).limit(10)
    # 10-row re-rank as a broadcast non-equi join — no window at all
    return bounded_rank(top, "dot", "vec_id", out="rnk").select(
        "vec_id", "dot", "rnk"
    )
