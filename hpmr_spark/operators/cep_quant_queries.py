"""Complex-event-processing emulation (MATCH_RECOGNIZE-style sequence
patterns) and int8-quantized similarity search — two operators Spark has no
native form for, expressed as exact compositions.

- match_recognize_vcp: SQL's MATCH_RECOGNIZE (row-pattern matching) does
  not exist in Spark; the standard emulation collapses each key's ordered
  event sequence into a string (one char per event, full (ts, event_id)
  tie-break) and runs regex/counting on it. Deterministic because the
  sequence string is fully ordered and all ops are exact string ops.
- similarity_topk_int8: the quantized-search trick from vector databases:
  embeddings quantized to small integers with a committed scale, so dot
  products become EXACT integer arithmetic — rank ties and cross-engine
  drift disappear entirely (no float ever decides the top-k).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.sources.tables import load_events

# ---------------------------------------------------------------------------
# MATCH_RECOGNIZE emulation: view -> click -> purchase funnels as row
# patterns over per-user event strings.
# ---------------------------------------------------------------------------
@register(
    "match_recognize_vcp",
    """
    WITH s AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS n_events,
           regexp_matches(seq, 'v.*c.*p') AS has_vcp,
           CAST((length(seq) - length(replace(seq, 'vc', ''))) // 2 AS BIGINT)
             AS n_vc_adjacent,
           CAST(strpos(seq, 'p') AS BIGINT) AS first_purchase_pos
    FROM s
    """,
)
def match_recognize_vcp(spark, sf_dir):
    """Row-pattern matching (the MATCH_RECOGNIZE gap): each user's events
    collapse to a character sequence (v/c/p/s/e, ordered by (ts, event_id)
    — the full tie-break makes the string deterministic), then the pattern
    layer is plain regex and exact string arithmetic: subsequence funnel
    v.*c.*p, count of ADJACENT view→click pairs (length-difference trick /
    2, positive operands so div ≡ //), position of first purchase (0 = no
    match on both engines). One groupBy(user) shuffle; per-user state is
    the sequence string. At 100 TB sequences are session-bounded — the
    same emulation is how Flink-less shops run CEP audits in batch."""
    ev = load_events(spark, sf_dir)
    s = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.unix_micros("ts").alias("t"),
                            F.col("event_id").alias("e"),
                            F.substring("event_type", 1, 1).alias("ch"),
                        )
                    )
                ),
                lambda x: x["ch"],
            ),
            "",
        ).alias("seq")
    )
    return s.select(
        "user_id",
        F.length("seq").cast("long").alias("n_events"),
        F.col("seq").rlike("v.*c.*p").alias("has_vcp"),
        F.expr("(length(seq) - length(replace(seq, 'vc', ''))) div 2")
        .cast("long")
        .alias("n_vc_adjacent"),
        F.instr(F.col("seq"), "p").cast("long").alias("first_purchase_pos"),
    )


# ---------------------------------------------------------------------------
# Int8-quantized top-k similarity search: exact integer dot products.
# ---------------------------------------------------------------------------
_Q_SCALE = 200  # committed: q = floor(v * 200) fits int8 for this corpus
_N_QUERIES = 5  # committed query set: vec_id 0..4
_TOP_K = 10


@register(
    "similarity_topk_int8",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id,
             CAST(FLOOR(CAST(u.v AS DOUBLE) * {_Q_SCALE}) AS BIGINT) AS qv,
             u.i AS pos
      FROM embeddings,
           LATERAL (SELECT UNNEST(embedding) AS v,
                           generate_subscripts(embedding, 1) AS i) u
      WHERE vec_id < {_N_QUERIES}
    ),
    c AS (
      SELECT vec_id,
             CAST(FLOOR(CAST(u.v AS DOUBLE) * {_Q_SCALE}) AS BIGINT) AS cv,
             u.i AS pos
      FROM embeddings,
           LATERAL (SELECT UNNEST(embedding) AS v,
                           generate_subscripts(embedding, 1) AS i) u
      WHERE vec_id >= {_N_QUERIES}
    ),
    dots AS (
      SELECT q.query_id, c.vec_id,
             CAST(SUM(q.qv * c.cv) AS BIGINT) AS dot
      FROM q JOIN c ON q.pos = c.pos
      GROUP BY q.query_id, c.vec_id
    ),
    r AS (
      SELECT query_id, vec_id, dot,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dot DESC, vec_id) AS rnk
      FROM dots
    )
    SELECT query_id, vec_id, dot, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= {_TOP_K}
    """,
)
def similarity_topk_int8(spark, sf_dir):
    """Quantized similarity search: components floor to integers at the
    committed scale (×200 fits int8 on this corpus; float32→float64
    widening is exact, so the floor is bit-deterministic), making every
    dot product EXACT BIGINT arithmetic — ranking cannot drift between
    engines or runs, the property float scores never give. Spark plan:
    zip_with multiplies query/corpus vectors per row against a BROADCAST
    5-vector query set (no posexplode shuffle — the oracle's positional
    join is the relational spelling of the same product), aggregate()
    sums in-row, then one per-query top-k window over the score frame. At
    100 TB this is one corpus scan per query batch; int8 dots are also the
    SIMD-friendly layout a GPU/ANN backend would consume."""
    e = _t(spark, sf_dir, "embeddings")
    qv = F.expr(
        f"transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * {_Q_SCALE}) AS BIGINT))"
    )
    queries = (
        e.where(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), qv.alias("q"))
    )
    corpus = (
        e.where(F.col("vec_id") >= _N_QUERIES)
        .select("vec_id", qv.alias("c"))
    )
    dots = corpus.crossJoin(F.broadcast(queries)).select(
        "query_id",
        "vec_id",
        F.expr(
            "aggregate(zip_with(q, c, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("dot"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("vec_id"))
    return (
        dots.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= _TOP_K)
        .select("query_id", "vec_id", "dot", "rnk")
    )
