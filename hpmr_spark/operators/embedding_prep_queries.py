"""Embedding-training prep batch: windowed co-occurrence counts (the
word2vec/GloVe statistic) and train/test split leakage audit.

Reference parity: keyed count aggregation (sync() combine —
/root/reference/src/dist_map.h:147-210) over derived pair/fingerprint keys.

Determinism: pairs canonicalized with least/greatest, association ratios in
integer ppm (floor division, non-negative), split membership by the
committed hash60 — no RNG, no floats in any decision."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t
from hpmr_spark.functions.hashing import hash60, sql_hash60


@register(
    "cooccurrence_window2",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS w,
             generate_subscripts(string_split(text, ' '), 1) AS i
      FROM documents
    ),
    pairs AS (
      SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.i - a.i IN (1, 2)
    ),
    co AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM pairs GROUP BY w1, w2
    ),
    uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY w
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM toks)
    SELECT co.w1, co.w2, co.c12,
           CAST(co.c12 * 1000000 * n.total // (u1.c * u2.c) AS BIGINT)
             AS assoc_ppm
    FROM co
      JOIN uni u1 ON co.w1 = u1.w
      JOIN uni u2 ON co.w2 = u2.w
      CROSS JOIN n
    """,
)
def cooccurrence_window2(spark, sf_dir):
    """Skip-gram co-occurrence counts with window ±2 — the sufficient
    statistic for word2vec/GloVe-style embedding training — plus the
    log-free PMI twin: assoc_ppm = c12·N·10⁶ div (c1·c2) (>10⁶ means
    positively associated). Pairs come from TWO zip_with passes over each
    token array against its offset-1 and offset-2 tails (no positional
    self-join on the Spark side; the oracle uses one), canonicalized
    least/greatest so the pair key is unordered. One shuffle on (w1, w2);
    unigram counts are vocab-sized broadcasts. BIGINT headroom: c12·10⁶·N
    needs N·c12 < 9·10¹² — switch the ratio to DECIMAL beyond ~10-billion-
    token corpora (counts themselves never overflow)."""
    d = _t(spark, sf_dir, "documents").select(F.split("text", " ").alias("a"))
    pair_expr = (
        "explode(concat("
        "zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1), "
        "(x, y) -> struct(least(x, y) AS w1, greatest(x, y) AS w2)), "
        "zip_with(slice(a, 1, size(a) - 2), slice(a, 3, size(a) - 2), "
        "(x, y) -> struct(least(x, y) AS w1, greatest(x, y) AS w2))))"
    )
    pairs = d.select(F.expr(pair_expr).alias("p")).select("p.w1", "p.w2")
    co = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    toks = _t(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("w")
    )
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n = toks.agg(F.count(F.lit(1)).alias("total"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        co.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c12",
            F.expr("c12 * 1000000 * total div (c1 * c2)").alias("assoc_ppm"),
        )
    )


@register(
    "split_leakage_audit",
    f"""
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS f,
             CASE WHEN ({sql_hash60("CAST(doc_id AS VARCHAR)")}) % 100 < 10
                  THEN 'test' ELSE 'train' END AS split
      FROM documents
    ),
    g AS (
      SELECT f,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_test
      FROM fp GROUP BY f
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_fp_groups,
           CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_groups,
           CAST(SUM(CASE WHEN n_test > 0 AND n_test < n_docs THEN 1 ELSE 0
                    END) AS BIGINT) AS n_cross_split_groups,
           CAST(SUM(CASE WHEN n_test > 0 AND n_test < n_docs THEN n_docs
                    ELSE 0 END) AS BIGINT) AS n_docs_at_risk
    FROM g
    """,
)
def split_leakage_audit(spark, sf_dir):
    """Train/test contamination gate: documents sharing a 5-token-prefix
    fingerprint must not straddle the hash-assigned split — a near-dup in
    train with its twin in test inflates eval. Counts fingerprint groups,
    duplicate groups, groups crossing the split boundary, and documents at
    risk. The fingerprint keys the only shuffle; the split decision is the
    same committed hash60 as train_test_split, so the audit reproduces the
    split exactly without materializing it. The release checklist runs
    this next to fk_integrity_audit and k_anonymity_audit."""
    d = _t(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.slice(F.split("text", " "), 1, 5))
        ).alias("f"),
        F.when(
            (hash60(F.col("doc_id").cast("string")) % 100) < 10, "test"
        ).otherwise("train").alias("split"),
    )
    g = fp.groupBy("f").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("n_test"),
    )
    cross = (F.col("n_test") > 0) & (F.col("n_test") < F.col("n_docs"))
    return g.agg(
        F.count(F.lit(1)).alias("n_fp_groups"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias("n_dup_groups"),
        F.sum(F.when(cross, 1).otherwise(0)).alias("n_cross_split_groups"),
        F.sum(F.when(cross, F.col("n_docs")).otherwise(0)).alias("n_docs_at_risk"),
    )


@register(
    "embedding_random_projection",
    f"""
    WITH signs AS (
      SELECT t1.j, t2.i,
             CASE WHEN ({sql_hash60("CAST(t1.j AS VARCHAR) || '_' || CAST(t2.i AS VARCHAR)")})
                       % 2 = 0 THEN 1 ELSE -1 END AS s
      FROM range(16) t1(j), range(64) t2(i)
    ),
    comps AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) - 1 AS i,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
               AS vi_micros
      FROM embeddings
    )
    SELECT c.vec_id, CAST(s.j AS BIGINT) AS j,
           CAST(SUM(c.vi_micros * s.s) AS BIGINT) AS proj_micros
    FROM comps c JOIN signs s ON c.i = s.i
    GROUP BY c.vec_id, s.j
    """,
)
def embedding_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss dimensionality reduction 64→16 with a ±1
    projection matrix derived from the committed hash60 (seedless,
    engine-reproducible, no RNG state to ship to 1000 executors). Each
    input component is floored to integer micros PER ROW (the exact
    float32 discipline), so every projected coordinate is an exact BIGINT
    dot product — associative, partition-invariant. Plan: posexplode →
    broadcast join against the 1024-row sign matrix → one shuffle on
    (vec_id, j); map-side partials collapse the 64× blowup before the
    exchange. The JL step feeds cheaper LSH/IVF indexes downstream."""
    from pyspark.sql import functions as F

    e = _t(spark, sf_dir, "embeddings")
    j = spark.range(16).select(F.col("id").alias("j"))
    i = spark.range(64).select(F.col("id").alias("i"))
    signs = j.crossJoin(i).select(
        "j",
        "i",
        F.when(
            hash60(
                F.concat(
                    F.col("j").cast("string"), F.lit("_"), F.col("i").cast("string")
                )
            )
            % 2
            == 0,
            1,
        )
        .otherwise(-1)
        .alias("s"),
    )
    comps = e.select(
        "vec_id", F.posexplode("embedding").alias("i", "v")
    ).select(
        "vec_id",
        "i",
        F.expr("CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT)").alias(
            "vi_micros"
        ),
    )
    return (
        comps.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("vi_micros") * F.col("s")).alias("proj_micros"))
        .select("vec_id", F.col("j").cast("long").alias("j"), "proj_micros")
    )
