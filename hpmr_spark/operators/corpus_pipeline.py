"""Training-corpus pipeline batch 2: sequence packing, vocabulary build +
corpus encoding, benchmark-contamination checks, deterministic source
mixing, int8 embedding quantization, sliding-window chunking, and Z-order
layout diagnostics.

Reference parity: extensions beyond the reference kernel (SURVEY.md §2.3's
LLM-pipeline mandate). The reference stops at keyed shuffle + reduce
(/root/reference/src/dist_map.h:147-210); these are the corpus-preparation
operators a 100 TB pretraining pipeline runs on top of exactly that
primitive — every one of them is a pure Catalyst plan (no Python in the
hot path) whose inner loop IS a keyed aggregation.

Determinism discipline (CLAUDE.md): every decision value is integer
(token counts, ppm rates via `div`, hash60 sampling, floor-scaled
doubles); the only double arithmetic (quantization) follows the verified
float32→float64 widening + identical-IEEE-expression pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t
from hpmr_spark.functions.hashing import hash60, sql_hash60


# ---------------------------------------------------------------------------
# Sequence packing: concat-and-chunk into fixed context windows.
# ---------------------------------------------------------------------------
@register(
    "pack_sequences_ctx512",
    """
    WITH t AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    s AS (
      SELECT doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
      FROM t
    )
    SELECT CAST(start // 512 AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS pack_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM s GROUP BY 1
    """,
)
def pack_sequences_ctx512(spark, sf_dir):
    """GPT-style sequence packing: documents in doc_id order are virtually
    concatenated and cut into 512-token context windows; a doc belongs to
    the pack where it STARTS. Pure integer plan: token count → exclusive
    running sum → `div 512` (operands non-negative, so Spark div ≡ DuckDB
    //). The exclusive running sum over the doc-scale frame is the two-pass
    bucketed prefix sum (functions/ranking.global_running, strict frame) —
    per-bucket token subtotals combine by associativity into broadcast
    offsets, identical output to the window form the oracle keeps, with no
    single-partition window."""
    from hpmr_spark.functions.ranking import global_running

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    s = global_running(
        toks, ["doc_id"], "n_tok", kind="sum", strict=True, out="start"
    ).withColumn("start", F.coalesce(F.col("start"), F.lit(0)))
    return (
        s.withColumn("pack_id", F.expr("start div 512"))
        .groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary build (top-N by document frequency) + corpus encoding / OOV.
# ---------------------------------------------------------------------------
@register(
    "vocab_topn_encode",
    """
    WITH words AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    w AS (SELECT * FROM words WHERE tok <> ''),
    df AS (
      SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM w GROUP BY tok
    ),
    vocab AS (
      SELECT tok, vid FROM (
        SELECT tok, df,
               ROW_NUMBER() OVER (ORDER BY df DESC, tok ASC) AS vid
        FROM df
      ) WHERE vid <= 16
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) - COUNT(v.vid) AS BIGINT) AS n_oov,
           CAST((COUNT(*) - COUNT(v.vid)) * 1000000 // COUNT(*) AS BIGINT)
             AS oov_ppm,
           CAST(COALESCE(SUM(v.vid), 0) AS BIGINT) AS vid_checksum
    FROM w LEFT JOIN vocab v ON w.tok = v.tok
    GROUP BY lang
    """,
)
def vocab_topn_encode(spark, sf_dir):
    """Vocabulary construction + corpus encoding, the tokenizer-fitting
    step: document frequency per token, top-16 vocab with a total ordering
    (df DESC, token ASC — ties broken), dense ids by row_number, then the
    corpus is re-encoded against the vocab and per-language OOV rates are
    reported in integer ppm. vid_checksum pins the exact id assignment.
    Scale: df is one shuffle on token; the top-16 selection is
    TakeOrderedAndProject (per-partition heaps — never a vocab-wide window;
    the re-rank window runs on the 16-row result, a bounded frame), so the
    encode join is a broadcast — the corpus never re-shuffles."""
    d = _t(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    df_ = w.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    from hpmr_spark.functions.ranking import bounded_rank

    top = df_.orderBy(F.desc("df"), F.asc("tok")).limit(16)
    # 16-row re-rank as a broadcast non-equi join — no window at all
    vocab = bounded_rank(top, "df", "tok", out="vid").select("tok", "vid")
    enc = w.join(F.broadcast(vocab), "tok", "left_outer")
    return enc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.count(F.lit(1)) - F.count("vid")).alias("n_oov"),
        F.expr("(count(1) - count(vid)) * 1000000 div count(1)").alias("oov_ppm"),
        F.coalesce(F.sum("vid"), F.lit(0)).alias("vid_checksum"),
    )


# ---------------------------------------------------------------------------
# Benchmark-contamination check: 5-gram overlap against a held-out set.
# ---------------------------------------------------------------------------
_CONTAM_ORACLE = """
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS a FROM documents
    ),
    g AS (
      SELECT doc_id, source,
             {h} AS gh
      FROM t, LATERAL (
        SELECT unnest(generate_series(1, len(a) - 4)) AS i
      ) u
    ),
    bench AS (SELECT DISTINCT gh FROM g WHERE source = 'src0'),
    cand AS (SELECT DISTINCT doc_id, gh FROM g WHERE source <> 'src0')
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shared_5grams
    FROM cand c JOIN bench b ON c.gh = b.gh
    GROUP BY c.doc_id
""".format(h=sql_hash60("array_to_string(a[i:i+4], ' ')"))


@register("contamination_check_5gram", _CONTAM_ORACLE)
def contamination_check_5gram(spark, sf_dir):
    """Benchmark contamination scan: treat source='src0' as the held-out
    eval set; report, per remaining document, how many of its distinct
    word-5-grams also appear anywhere in the eval set. Grams travel as
    60-bit md5 hashes (never strings), the eval-side distinct gram set is
    broadcast (eval benches are small by definition), and each side is
    deduped before the join — at 100 TB the corpus side is one explode +
    one local distinct + a broadcast semi-join, zero corpus shuffles."""
    d = _t(spark, sf_dir, "documents")
    t = d.select("doc_id", "source", F.split("text", " ").alias("a"))
    g = t.select(
        "doc_id",
        "source",
        F.explode(
            # sequence(1, 0) DESCENDS and slice(arr, 0, 5) throws — guard
            # short docs into the empty-array branch (oracle: len(ts) >= 5).
            F.expr("CASE WHEN size(a) >= 5 THEN "
                   "transform(sequence(1, size(a) - 4), "
                   "i -> array_join(slice(a, i, 5), ' ')) ELSE array() END")
        ).alias("gram"),
    ).select("doc_id", "source", hash60(F.col("gram")).alias("gh"))
    bench = g.where(F.col("source") == "src0").select("gh").distinct()
    cand = g.where(F.col("source") != "src0").select("doc_id", "gh").distinct()
    return (
        cand.join(F.broadcast(bench), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_5grams"))
    )


# ---------------------------------------------------------------------------
# Deterministic source mixing: per-source hash-gated sampling rates.
# ---------------------------------------------------------------------------
_MIX_RATE = "150000 + (CAST(substr(source, 4) AS BIGINT) * 37) % 700000"


@register(
    "mixture_weighted_sources",
    f"""
    WITH d AS (
      SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST({_MIX_RATE} AS BIGINT) AS rate_ppm,
             {sql_hash60("CAST(doc_id AS VARCHAR)")} % 1000000 AS u
      FROM documents
    )
    SELECT source,
           CAST(MAX(rate_ppm) AS BIGINT) AS rate_ppm,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN u < rate_ppm THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN u < rate_ppm THEN n_tok ELSE 0 END) AS BIGINT)
             AS kept_tokens
    FROM d GROUP BY source
    """,
)
def mixture_weighted_sources(spark, sf_dir):
    """Training-mixture construction: each source gets a deterministic
    sampling rate (ppm, derived here from the source id; in production a
    broadcast weights table) and rows are kept when hash60(doc_id) mod 1e6
    falls under the rate — the same content-hash gating as
    stratified_sample_per_lang, so the sample is reproducible under any
    partitioning/retry, unlike df.sample(). Reported per source: rate,
    total docs, kept docs, kept token budget. One scan, one agg shuffle."""
    d = _t(spark, sf_dir, "documents")
    dd = d.select(
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        F.expr(_MIX_RATE).cast("long").alias("rate_ppm"),
        (hash60(F.col("doc_id").cast("string")) % 1000000).alias("u"),
    )
    kept = F.col("u") < F.col("rate_ppm")
    return dd.groupBy("source").agg(
        F.max("rate_ppm").alias("rate_ppm"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tok")).otherwise(0)).alias("kept_tokens"),
    )


# ---------------------------------------------------------------------------
# int8 symmetric embedding quantization (max-abs scale per vector).
# ---------------------------------------------------------------------------
@register(
    "embedding_quantize_int8",
    """
    WITH s AS (
      SELECT vec_id, embedding,
             list_aggregate(
               list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max'
             ) AS sc
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, sc,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) / sc * 127.0) AS BIGINT)
             ) AS ql
      FROM s WHERE sc > 0
    )
    SELECT vec_id,
           CAST(list_sum(ql) AS BIGINT) AS q_sum,
           CAST(list_aggregate(ql, 'min') AS BIGINT) AS q_min,
           CAST(list_aggregate(ql, 'max') AS BIGINT) AS q_max,
           CAST(FLOOR(sc * 1000000000) AS BIGINT) AS scale_ppb
    FROM q
    """,
)
def embedding_quantize_int8(spark, sf_dir):
    """Symmetric int8 quantization of the embedding column — the storage/
    bandwidth move every large ANN index makes (4 bytes → 1 byte per dim).
    Per vector: scale = max|x|, q_i = floor(x_i/scale·127) ∈ [-127, 127].
    All arithmetic is the verified cross-engine double discipline
    (float32→float64 widening exact, identical IEEE expression order in
    both engines, floor to integers before any comparison). Row-local HOFs
    only — zero shuffles, parquet-scan speed at any scale. Zero vectors
    are dropped by the sc > 0 guard in both engines."""
    e = _t(spark, sf_dir, "embeddings")
    s = e.withColumn(
        "sc",
        F.expr(
            "aggregate(embedding, CAST(0.0 AS DOUBLE), "
            "(acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"
        ),
    ).where(F.col("sc") > 0)
    q = s.withColumn(
        "ql",
        F.expr(
            "transform(embedding, "
            "x -> CAST(FLOOR(CAST(x AS DOUBLE) / sc * 127.0) AS BIGINT))"
        ),
    )
    return q.select(
        "vec_id",
        F.expr("aggregate(ql, CAST(0 AS BIGINT), (a, x) -> a + x)").alias("q_sum"),
        F.array_min("ql").alias("q_min"),
        F.array_max("ql").alias("q_max"),
        F.floor(F.col("sc") * 1000000000).cast("long").alias("scale_ppb"),
    )


# ---------------------------------------------------------------------------
# Sliding-window chunking with overlap (window 64, stride 48).
# ---------------------------------------------------------------------------
_CHUNK_ORACLE = """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS a FROM documents
    )
    SELECT doc_id,
           CAST((i - 1) // 48 AS BIGINT) AS chunk_idx,
           CAST(len(a[i:i+63]) AS BIGINT) AS n_words,
           {h} AS chunk_fp
    FROM t, LATERAL (
      SELECT unnest(generate_series(1, len(a), 48)) AS i
    ) u
""".format(h=sql_hash60("array_to_string(a[i:i+63], ' ')"))


@register("chunk_sliding_window64", _CHUNK_ORACLE)
def chunk_sliding_window64(spark, sf_dir):
    """RAG-style sliding-window chunking: 64-word windows at stride 48
    (16-word overlap keeps sentences that straddle a boundary retrievable).
    Declarative twin of udtf_chunk_documents: sequence() generates the
    stride offsets, slice() cuts the window, everything stays in
    whole-stage codegen — at 100 TB this is the path (no Python workers).
    Chunks are identified by a 60-bit content fingerprint, not the text,
    so downstream chunk-level dedup joins never move strings."""
    d = _t(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("a"))
    return (
        t.select(
            "doc_id",
            F.explode(F.expr("sequence(1, size(a), 48)")).alias("i"),
            "a",
        )
        .select(
            "doc_id",
            F.expr("(i - 1) div 48").alias("chunk_idx"),
            F.expr("size(slice(a, i, 64))").cast("long").alias("n_words"),
            hash60(F.expr("array_join(slice(a, i, 64), ' ')")).alias("chunk_fp"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order layout diagnostics: bit-interleaved clustering of two keys.
# ---------------------------------------------------------------------------
def _z16_sql(x: str, y: str, shift: str, band: str) -> str:
    """SQL text for an 8+8-bit Morton interleave of x (even bits) and y
    (odd bits), identical syntax in Spark SQL and DuckDB (>> & << all
    shared), then bucketed by the top `band` bits."""
    terms = []
    for i in range(8):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return f"(({' + '.join(terms)}) >> {shift}) % {band}"


_Z_X = "(o_custkey % 256)"
_Z_SPARK_Y = "(datediff(o_orderdate, DATE '1970-01-01') % 256)"
_Z_DUCK_Y = "(datediff('day', DATE '1970-01-01', o_orderdate) % 256)"


@register(
    "zorder_layout_buckets",
    f"""
    SELECT CAST({_z16_sql(_Z_X, _Z_DUCK_Y, "8", "256")} AS BIGINT) AS z_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(o_custkey % 256) - MIN(o_custkey % 256) AS BIGINT)
             AS cust_span,
           CAST(MAX(datediff('day', DATE '1970-01-01', o_orderdate) % 256)
              - MIN(datediff('day', DATE '1970-01-01', o_orderdate) % 256)
              AS BIGINT) AS day_span
    FROM orders GROUP BY 1
    """,
)
def zorder_layout_buckets(spark, sf_dir):
    """Z-order (Morton) layout diagnostics: interleave the low 8 bits of
    customer key and order date into a 16-bit Z-value, bucket by its high
    8 bits, and report each bucket's span in BOTH dimensions — small spans
    in both axes are exactly why Z-ordered files prune on either predicate
    (the Delta/Iceberg OPTIMIZE ZORDER story, built from plain bit
    arithmetic). At scale this expression is the repartitionByRange key for
    the layout write; here it feeds one agg to make the locality claim
    measurable and oracle-checkable."""
    o = _t(spark, sf_dir, "orders")
    zb = F.expr(_z16_sql(_Z_X, _Z_SPARK_Y, "8", "256")).cast("long")
    day = F.expr(f"{_Z_SPARK_Y}").cast("long")
    cust = F.expr(f"{_Z_X}").cast("long")
    return (
        o.select(zb.alias("z_bucket"), cust.alias("c"), day.alias("d"))
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.max("c") - F.min("c")).alias("cust_span"),
            (F.max("d") - F.min("d")).alias("day_span"),
        )
    )
