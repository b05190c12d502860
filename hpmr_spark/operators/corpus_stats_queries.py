"""Corpus-statistics batch 3: bigram language-model counts, repetition /
boilerplate signals, percentile-band outlier filtering, and exact-integer
embedding centroids.

Reference parity: all are keyed-aggregation workloads — the reference's
sync() combine loop (/root/reference/src/dist_map.h:147-210) with corpus
keys; re-expressed as single declarative Catalyst plans.

Determinism: conditional probabilities in integer ppm (floor div, operands
non-negative), percentile bands by integer rank cross-multiplication, mean
vectors as exact integer-micros sums (the parallel-float-sum rule), run
lengths by integer window arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t


# ---------------------------------------------------------------------------
# Bigram LM counts: P(w2 | w1) in integer ppm over the whole corpus.
# ---------------------------------------------------------------------------
@register(
    "bigram_lm_counts",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS w,
             generate_subscripts(string_split(text, ' '), 1) AS i
      FROM documents
    ),
    bi AS (
      SELECT a.w AS w1, b.w AS w2
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.i = a.i + 1
    ),
    c AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n FROM bi GROUP BY w1, w2
    )
    SELECT w1, w2, n,
           CAST(n * 1000000 // SUM(n) OVER (PARTITION BY w1) AS BIGINT)
             AS p_ppm
    FROM c
    """,
)
def bigram_lm_counts(spark, sf_dir):
    """Corpus bigram counts with conditional probability P(w2|w1) in
    integer ppm — the n-gram LM / next-token-statistics primitive. The
    Spark side never self-joins: adjacent pairs come from one pass of
    zip_with over the token array against its own tail (arrays_zip of
    slice), then explode → ONE shuffle on (w1, w2); the per-w1 total is a
    window over the already-aggregated bigram frame (vocab² rows, not
    corpus rows). The oracle uses the equivalent positional self-join.
    At 100 TB: state is vocab²-bounded, corpus rows stream through."""
    d = _t(spark, sf_dir, "documents")
    t = d.select(F.split("text", " ").alias("a"))
    pairs = t.select(
        F.explode(
            F.expr(
                "zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1), "
                "(x, y) -> struct(x AS w1, y AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    c = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("w1")
    return c.withColumn("p_ppm", F.expr("n * 1000000 div sum(n) over (partition by w1)"))


# ---------------------------------------------------------------------------
# Repetition / boilerplate signals: max token run length + distinct ratio.
# ---------------------------------------------------------------------------
@register(
    "text_repetition_stats",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS w,
             generate_subscripts(string_split(text, ' '), 1) AS i
      FROM documents
    ),
    runs AS (
      SELECT doc_id, w, i,
             i - ROW_NUMBER() OVER (PARTITION BY doc_id, w ORDER BY i) AS grp
      FROM toks
    ),
    rl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM runs GROUP BY doc_id, w, grp
    ),
    agg AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT t.w) AS BIGINT) AS n_distinct
      FROM toks t GROUP BY t.doc_id
    )
    SELECT a.doc_id, a.n_tokens,
           CAST(m.max_run AS BIGINT) AS max_run,
           CAST(a.n_distinct * 1000000 // a.n_tokens AS BIGINT)
             AS distinct_ppm
    FROM agg a JOIN (
      SELECT doc_id, MAX(run_len) AS max_run FROM rl GROUP BY doc_id
    ) m ON a.doc_id = m.doc_id
    """,
)
def text_repetition_stats(spark, sf_dir):
    """Repetition-based quality signals, the classic pretraining filter
    (Gopher/C4 rules): longest consecutive same-token run and the
    distinct-token ratio (ppm) per document. Run detection is the
    gaps-and-islands trick — position minus per-(doc, token) rank is
    constant within a run — all on integer positions from ONE posexplode.
    Keys are (doc_id, token): partition-count invariant, and per-doc state
    bounds memory at any corpus size (a document ships to one task only
    in the window, the documented holistic cost, then reduces)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i", "w")
    ).withColumn("i", F.col("i") + 1)
    runs = toks.withColumn(
        "grp",
        F.col("i")
        - F.row_number().over(Window.partitionBy("doc_id", "w").orderBy("i")),
    )
    rl = runs.groupBy("doc_id", "w", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    max_run = rl.groupBy("doc_id").agg(F.max("run_len").alias("max_run"))
    agg = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("w").alias("n_distinct"),
    )
    return agg.join(max_run, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.col("max_run").cast("long"),
        F.expr("n_distinct * 1000000 div n_tokens").alias("distinct_ppm"),
    )


# ---------------------------------------------------------------------------
# Percentile-band outlier filter: keep docs inside [p5, p95] of length.
# ---------------------------------------------------------------------------
@register(
    "outlier_filter_length",
    """
    WITH r AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT lang,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rn * 100 > n * 5 AND rn * 100 <= n * 95
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rn * 100 > n * 5 AND rn * 100 <= n * 95
                         THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
    FROM r GROUP BY lang
    """,
)
def outlier_filter_length(spark, sf_dir):
    """Percentile-band corpus filter: within each language, keep documents
    whose length rank falls in (p5, p95] — trimming both tails without ever
    computing a float percentile. The band test is integer
    cross-multiplication (rn·100 > n·5), the engine's no-float-decisions
    rule, with doc_id as rank tie-break so equal lengths resolve
    deterministically. Per-group sort is the honest holistic cost; at
    100 TB swap in approx_percentile bounds with the sketch-gating pattern
    when exactness can be traded."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    r = d.select(
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
    )
    kept = (F.col("rn") * 100 > F.col("n") * 5) & (
        F.col("rn") * 100 <= F.col("n") * 95
    )
    return r.groupBy("lang").agg(
        F.max("n").alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("kept_chars"),
    )


# ---------------------------------------------------------------------------
# Exact-integer embedding centroids (the distributed mean-vector step).
# ---------------------------------------------------------------------------
@register(
    "embedding_centroids_exact",
    """
    WITH e AS (
      SELECT label,
             unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(dim AS BIGINT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
             AS BIGINT) AS sum_micros
    FROM e GROUP BY label, dim
    """,
)
def embedding_centroids_exact(spark, sf_dir):
    """Per-label mean-vector accumulators — the k-means / class-centroid
    update step — with the parallel-float-sum rule applied to vectors:
    each float32 component is floored to integer micros PER ROW (exact
    cross-engine: float32→float64 widening + one IEEE multiply + floor),
    then summed as BIGINT, so the distributed sum is associative and
    partition-invariant. The centroid itself is sum_micros / n_vecs /
    1e6 — one final local division by the consumer. posexplode → one
    shuffle on (label, dim); at 100 TB this is the canonical two-level
    reduce (map-side partial sums collapse each partition to
    labels×dims rows before the exchange)."""
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("dim0", "v")
    ).select(
        F.col("label").cast("long").alias("label"),
        (F.col("dim0") + 1).cast("long").alias("dim"),
        F.expr("CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT)").alias("vi"),
    )
    return ex.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("vi").alias("sum_micros"),
    )
