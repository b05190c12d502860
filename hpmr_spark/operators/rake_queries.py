"""RAKE keyphrase extraction (round 6): Rapid Automatic Keyword
Extraction over the documents corpus — candidate phrases are maximal
stopword-free token runs, scored by Σ_w deg(w)/freq(w) over member
words. Completes the text-analysis family (TF-IDF / BM25 / top-ngrams /
stopword discovery) with the classic unsupervised keyphrase scorer.

Spark-first shape: stopwords are DATA (the corpus top-8 tokens by
frequency, (freq DESC, token ASC) total order — reusing the
stopword-discovery idea instead of a hardcoded list), broadcast-joined
as a flag; phrase runs are the standard gaps-and-islands
(island = pos − rank-among-non-stop, one doc-partitioned window); word
degree/frequency are one grouped agg over phrase-member rows. The token
frame is re-derived by its three consumers rather than persisted — at
100 TB a documents re-scan is cheaper than materializing the exploded
token frame.

Disciplines (CLAUDE.md): word scores floor ELEMENTWISE to integer ppm
(deg·1e6 div freq, int128 cross-multiplication: Spark DECIMAL(38,0) div
≡ DuckDB HUGEINT // — DuckDB's // on DECIMAL rounds); phrase scores are
integer sums of those; phrase text reassembly is order-pinned
(sort_array over (pos, w) structs ≡ string_agg ORDER BY pos); top-25
emits under the total order (score DESC, phrase ASC).

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's text-analysis axis.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register

_N_STOP = 8  # corpus top-N tokens are the stopword set
_MAX_PHRASE = 6  # committed cap: longer runs are not keyphrases
_TOPK = 25

_RAKE_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    stop AS MATERIALIZED (
      SELECT w FROM (
        SELECT w, COUNT(*) AS c FROM toks GROUP BY w
        ORDER BY c DESC, w ASC LIMIT {_N_STOP}
      )
    ),
    member AS MATERIALIZED (
      SELECT t.doc_id, t.pos, t.w,
             t.pos - ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                        ORDER BY t.pos) AS island
      FROM toks t WHERE t.w NOT IN (SELECT w FROM stop)
    ),
    phrases AS MATERIALIZED (
      SELECT doc_id, island,
             string_agg(w, ' ' ORDER BY pos) AS phrase,
             CAST(COUNT(*) AS BIGINT) AS plen
      FROM member GROUP BY doc_id, island
    ),
    wstats AS (
      SELECT m.w,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(p.plen) AS BIGINT) AS deg
      FROM member m
      JOIN phrases p ON p.doc_id = m.doc_id AND p.island = m.island
      WHERE p.plen <= {_MAX_PHRASE}
      GROUP BY m.w
    ),
    occ_scores AS (
      SELECT m.doc_id, m.island,
             CAST(SUM(CAST(CAST(s.deg AS HUGEINT) * 1000000 // s.freq
                           AS BIGINT)) AS BIGINT) AS score_ppm
      FROM member m
      JOIN phrases p ON p.doc_id = m.doc_id AND p.island = m.island
      JOIN wstats s ON s.w = m.w
      WHERE p.plen <= {_MAX_PHRASE}
      GROUP BY m.doc_id, m.island
    )
    SELECT p.phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MAX(o.score_ppm) AS BIGINT) AS score_ppm
    FROM phrases p
    JOIN occ_scores o ON o.doc_id = p.doc_id AND o.island = p.island
    WHERE p.plen <= {_MAX_PHRASE}
    GROUP BY p.phrase
    ORDER BY score_ppm DESC, phrase ASC
    LIMIT {_TOPK}
"""


@register("rake_keyphrases", _RAKE_ORACLE)
def rake_keyphrases(spark, sf_dir):
    """RAKE top-25 keyphrases — see module docstring. Same phrase text ⇒
    same member words ⇒ same score, so the per-phrase MAX(score_ppm) is a
    no-op aggregate that lets the text group cleanly."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    toks = d.select(
        "doc_id", F.posexplode("toks").alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    stop = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(_N_STOP)
        .select(F.col("w").alias("sw"))
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    member = (
        toks.join(F.broadcast(stop), toks["w"] == stop["sw"], "left_anti")
        .withColumn("island", F.col("pos") - F.row_number().over(w_doc))
    )
    phrases = member.groupBy("doc_id", "island").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "w"))),
                lambda st: st["w"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).cast("long").alias("plen"),
    )
    short = phrases.where(F.col("plen") <= _MAX_PHRASE)
    mem_short = member.join(short.select("doc_id", "island", "plen"),
                            ["doc_id", "island"])
    wstats = mem_short.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("deg"),
    )
    occ = (
        mem_short.join(wstats, "w")
        .groupBy("doc_id", "island")
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(deg AS DECIMAL(38,0)) * 1000000 div freq"
                    " AS BIGINT)"
                )
            )
            .cast("long")
            .alias("score_ppm")
        )
    )
    return (
        short.join(occ, ["doc_id", "island"])
        .groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.max("score_ppm").cast("long").alias("score_ppm"),
        )
        .orderBy(F.desc("score_ppm"), F.asc("phrase"))
        .limit(_TOPK)
    )
