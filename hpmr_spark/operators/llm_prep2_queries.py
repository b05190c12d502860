"""LLM data-prep batch 2 (round 6): fill-in-the-middle transform,
preference-pair construction, and binary-embedding Hamming retrieval —
three pipeline steps (code-model FIM corpora, DPO pair building, the
1-bit retrieval baseline) next to the existing packing / contamination /
mixture / dedup families.

Disciplines (CLAUDE.md): all text fingerprints are hash60; empty slices
COALESCE to '' (DuckDB's empty string_agg is NULL — the round-2 trap);
Spark `^` is XOR but DuckDB `^` is POWER (round-5 trap) — the Hamming
kernel is per-engine text (bit_count(a ^ b) vs bit_count(xor(a, b)));
sign masks use 60 bits (dims 1..60) so the BIGINT stays positive; every
top-k emits under a full (distance, neighbor) total order.

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's LLM-pipeline axis.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.hashing import sql_hash60

# ---------------------------------------------------------------------------
# Fill-in-the-middle (PSM) transform.
# ---------------------------------------------------------------------------
_FIM_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents
    ),
    cut AS (
      SELECT doc_id, toks, len(toks) AS n,
             len(toks) // 3 AS p1, (2 * len(toks)) // 3 AS p2
      FROM t
    ),
    parts AS (
      SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
             COALESCE(list_aggregate(toks[1 : p1], 'string_agg', ' '), '')
               AS pre,
             COALESCE(list_aggregate(toks[p1 + 1 : p2], 'string_agg', ' '),
                      '') AS mid,
             COALESCE(list_aggregate(toks[p2 + 1 : n], 'string_agg', ' '),
                      '') AS suf
      FROM cut
    )
    SELECT doc_id, n_tokens,
           {sql_hash60('pre')} AS prefix_fp,
           {sql_hash60('mid')} AS middle_fp,
           {sql_hash60('suf')} AS suffix_fp,
           {sql_hash60(
               "'<PRE>' || pre || '<SUF>' || suf || '<MID>' || mid"
           )} AS psm_fp
    FROM parts ORDER BY doc_id
"""


@register("fim_transform_psm", _FIM_ORACLE)
def fim_transform_psm(spark, sf_dir):
    """Fill-in-the-middle (PSM order) transform: deterministic thirds
    split (p1 = ⌊n/3⌋, p2 = ⌊2n/3⌋), document re-emitted as
    <PRE>prefix<SUF>suffix<MID>middle — the code-model pretraining
    transform. The oracle checks fingerprints of all three parts AND the
    reassembled PSM string, so the reconstruction order is verified.
    Pure per-row expressions — zero shuffle beyond the final sort."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    cut = d.select(
        "doc_id",
        "toks",
        F.size("toks").cast("long").alias("n"),
        (F.size("toks").cast("long") / 3).cast("long").alias("_x"),
    ).select(
        "doc_id",
        "toks",
        "n",
        F.expr("n div 3").alias("p1"),
        F.expr("(2 * n) div 3").alias("p2"),
    )
    part = lambda start, length: F.coalesce(
        F.array_join(
            F.slice(
                F.col("toks"),
                start.cast("int"),
                F.greatest(length, F.lit(0)).cast("int"),
            ),
            " ",
        ),
        F.lit(""),
    )
    parts = cut.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        part(F.lit(1), F.col("p1")).alias("pre"),
        part(F.col("p1") + 1, F.col("p2") - F.col("p1")).alias("mid"),
        part(F.col("p2") + 1, F.col("n") - F.col("p2")).alias("suf"),
    )
    h = lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
    return parts.select(
        "doc_id",
        "n_tokens",
        h(F.col("pre")).alias("prefix_fp"),
        h(F.col("mid")).alias("middle_fp"),
        h(F.col("suf")).alias("suffix_fp"),
        h(
            F.concat(
                F.lit("<PRE>"),
                F.col("pre"),
                F.lit("<SUF>"),
                F.col("suf"),
                F.lit("<MID>"),
                F.col("mid"),
            )
        ).alias("psm_fp"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Preference-pair construction (DPO-style data building).
# ---------------------------------------------------------------------------
_PAIRS_PER_LANG = 10

_PREF_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS score
      FROM documents
    ),
    best AS (
      SELECT lang, doc_id AS chosen_doc, score AS chosen_score,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY score DESC, doc_id ASC) AS i
      FROM d
    ),
    worst AS (
      SELECT lang, doc_id AS rejected_doc, score AS rejected_score,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY score ASC, doc_id DESC) AS i
      FROM d
    )
    SELECT b.lang, CAST(b.i AS BIGINT) AS pair_idx,
           b.chosen_doc, w.rejected_doc,
           CAST(b.chosen_score - w.rejected_score AS BIGINT) AS margin
    FROM best b JOIN worst w ON w.lang = b.lang AND w.i = b.i
    WHERE b.i <= {_PAIRS_PER_LANG}
      AND b.chosen_score > w.rejected_score
      AND b.chosen_doc <> w.rejected_doc
    ORDER BY b.lang, pair_idx
"""


@register("preference_pairs_build", _PREF_ORACLE)
def preference_pairs_build(spark, sf_dir):
    """DPO-style preference-pair construction: per language, pair the
    i-th best-scoring document with the i-th worst (score = n_chars as
    the committed quality proxy; full (score, doc_id) tie-breaks on both
    ends), keeping pairs with a strictly positive margin and distinct
    members. Two lang-partitioned windows + one rank equi-join — the
    standard contrastive-data shape, shuffle-bounded at any scale."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("score")
    )
    w_best = Window.partitionBy("lang").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    w_worst = Window.partitionBy("lang").orderBy(
        F.asc("score"), F.desc("doc_id")
    )
    best = d.select(
        "lang",
        F.col("doc_id").alias("chosen_doc"),
        F.col("score").alias("chosen_score"),
        F.row_number().over(w_best).cast("long").alias("i"),
    ).where(F.col("i") <= _PAIRS_PER_LANG)
    worst = d.select(
        "lang",
        F.col("doc_id").alias("rejected_doc"),
        F.col("score").alias("rejected_score"),
        F.row_number().over(w_worst).cast("long").alias("i"),
    ).where(F.col("i") <= _PAIRS_PER_LANG)
    return (
        best.join(worst, ["lang", "i"])
        .where(
            (F.col("chosen_score") > F.col("rejected_score"))
            & (F.col("chosen_doc") != F.col("rejected_doc"))
        )
        .select(
            "lang",
            F.col("i").alias("pair_idx"),
            "chosen_doc",
            "rejected_doc",
            (F.col("chosen_score") - F.col("rejected_score"))
            .cast("long")
            .alias("margin"),
        )
        .orderBy("lang", "pair_idx")
    )


# ---------------------------------------------------------------------------
# Binary-embedding (sign-bit) Hamming retrieval.
# ---------------------------------------------------------------------------
_SIGN_BITS = 60
_HAM_K = 10

_MASK_DUCK = (
    f"CAST(list_sum(list_transform(range({_SIGN_BITS}), i ->"
    f" CASE WHEN embedding[i + 1] > 0"
    f" THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END))"
    f" AS BIGINT)"
)

_HAM_ORACLE = f"""
    WITH m AS (
      SELECT vec_id, {_MASK_DUCK} AS mask FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, mask AS qmask FROM m
          WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             CAST(bit_count(xor(q.qmask, c.mask)) AS BIGINT) AS hamming,
             ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY bit_count(xor(q.qmask, c.mask)), c.vec_id
             ) AS rk
      FROM q JOIN m c ON c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, hamming, CAST(rk AS BIGINT) AS rank
    FROM scored WHERE rk <= {_HAM_K}
    ORDER BY query_id, rank
"""


@register("embedding_binary_hamming_topk", _HAM_ORACLE)
def embedding_binary_hamming_topk(spark, sf_dir):
    """1-bit binary-embedding retrieval: 60-bit sign mask per vector
    (dims 1..60 — keeps the BIGINT positive), top-10 neighbors per query
    by Hamming distance with a full (distance, neighbor) tie-break — the
    64×-compression retrieval baseline (one BIGINT per vector; the scan
    is bit_count(xor) on packed integers, no floats anywhere). Spark's
    `^` IS xor (DuckDB's is POWER — per-engine kernel text). Broadcast
    query masks ⋈ corpus masks; at 10⁹ vectors the index is 8 GB."""
    e = _t(spark, sf_dir, "embeddings")
    mask = F.expr(
        f"CAST(aggregate(sequence(0, {_SIGN_BITS - 1}),"
        f" CAST(0 AS BIGINT), (acc, i) -> acc +"
        f" CASE WHEN element_at(embedding, CAST(i + 1 AS INT)) > 0"
        f" THEN shiftleft(CAST(1 AS BIGINT), CAST(i AS INT))"
        f" ELSE CAST(0 AS BIGINT) END) AS BIGINT)"
    )
    m = e.select("vec_id", mask.alias("mask"))
    q = m.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("mask").alias("qmask")
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        F.broadcast(q)
        .join(m.select(F.col("vec_id").alias("neighbor_id"), "mask"),
              F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr("CAST(bit_count(qmask ^ mask) AS BIGINT)").alias("hamming"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _HAM_K)
        .orderBy("query_id", "rank")
    )
