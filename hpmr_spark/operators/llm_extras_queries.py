"""LLM-pipeline extras: contrastive negative sampling and a BPE merge step.

Reference parity: keyed combine workloads (/root/reference/src/dist_map.h:
147-210) over derived keys (sampled pairs, char bigrams); both extend the
brief's training-data-pipeline surface.

Determinism: negatives come from the committed md5-derived hash60 (identical
on both engines) — no runtime randomness; BPE pair counts are exact BIGINT
weighted sums with fully tie-broken ranking."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t
from hpmr_spark.functions.hashing import hash60, sql_hash60

N_NEG = 4

_NEG_SQL = f"""
    WITH mx AS (SELECT CAST(MAX(doc_id) AS BIGINT) AS max_id FROM documents),
    cand AS (SELECT d.doc_id AS anchor_id, j.j,
                    {sql_hash60("d.doc_id || ':' || j.j")} % (mx.max_id + 1) AS neg_id
             FROM documents d
             CROSS JOIN (SELECT unnest(range(1, {N_NEG + 1})) AS j) j
             CROSS JOIN mx)
    SELECT c.anchor_id, CAST(c.j AS BIGINT) AS j, c.neg_id
    FROM cand c JOIN documents e ON c.neg_id = e.doc_id
    WHERE c.neg_id <> c.anchor_id
"""


@register("negative_sampling_pairs", _NEG_SQL)
def negative_sampling_pairs(spark, sf_dir):
    """Deterministic contrastive negatives: each anchor doc draws K=4
    pseudo-random partner ids via the committed 60-bit hash of
    'doc_id:j' mod (max_id+1) — reproducible on any engine and any
    partitioning, unlike rand()-based sampling. Misses (ids not present)
    and self-pairs are dropped by a join back to the doc-id set; at 100 TB
    that join is a semi-join on the id column only (no payloads move), and
    the candidate generation is a pure map stage."""
    docs = _t(spark, sf_dir, "documents")
    mx = docs.agg(F.max("doc_id").alias("max_id"))
    j = spark.range(1, N_NEG + 1).select(F.col("id").alias("j"))
    cand = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(j))
        .crossJoin(F.broadcast(mx))
        .select(
            F.col("doc_id").alias("anchor_id"),
            F.col("j"),
            (
                hash60(F.concat_ws(":", F.col("doc_id"), F.col("j")))
                % (F.col("max_id") + 1)
            ).alias("neg_id"),
        )
        .where(F.col("neg_id") != F.col("anchor_id"))
    )
    ids = docs.select(F.col("doc_id").alias("neg_id"))
    return cand.join(ids, "neg_id", "left_semi").select("anchor_id", "j", "neg_id")


_BPE_SQL = """
    WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
                 FROM documents),
    w AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY token),
    pr AS (SELECT unnest(list_transform(range(length(token) - 1),
                         _ci -> substr(token, CAST(_ci + 1 AS INTEGER), 2))) AS pair,
                  n
           FROM w WHERE length(token) >= 2),
    agg AS (SELECT pair, CAST(SUM(n) AS BIGINT) AS cnt FROM pr GROUP BY pair)
    SELECT pair, cnt, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair) AS rnk
          FROM agg)
    WHERE rnk <= 10
"""


@register("bpe_merge_step", _BPE_SQL)
def bpe_merge_step(spark, sf_dir):
    """One BPE training step: adjacent character-pair counts weighted by
    word frequency, top-10 merge candidates (count desc, pair asc — fully
    tie-broken). The pair explosion runs over the POST-aggregation word
    list (vocab-bounded, not corpus-bounded) — exactly how a real BPE
    trainer loops: count words once, then iterate merges over the vocab.
    Top-10 selection is TakeOrderedAndProject (per-partition heaps); the
    re-rank window sees only the 10 selected rows."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0))
    w = (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.length("token") >= 2)
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("token") - 1),
        lambda i: F.col("token").substr(i.cast("int"), F.lit(2)),
    )
    pr = w.select(F.explode(pairs).alias("pair"), "n")
    agg = pr.groupBy("pair").agg(F.sum("n").alias("cnt"))
    from hpmr_spark.functions.ranking import bounded_rank

    top = agg.orderBy(F.col("cnt").desc(), F.col("pair")).limit(10)
    # 10-row re-rank as a broadcast non-equi join — no window at all
    return bounded_rank(top, "cnt", "pair", out="rnk").select("pair", "cnt", "rnk")
