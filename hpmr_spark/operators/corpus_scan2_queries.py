"""Round-12 second sitting, wave 7: one-pass corpus scan operators —

- multi_pattern_contamination_scan: benchmark-phrase contamination census
  (the Aho-Corasick use case, declaratively): the top-8 benchmark bigrams
  (from the committed doc_id % 10 = 0 "benchmark split") are counted in
  EVERY doc in one scan via the exact substring-count identity
  occurrences = (len(t) − len(replace(t, p, ''))) / len(p) — broadcast
  literal patterns, zero joins on the fact side per pattern.
- token_pruning_census: tf-idf token-dropping census (the token-pruning /
  mixture-of-depths data-diet family): tokens with tf·idf below a
  committed threshold are "prunable"; per-lang drop fractions in exact
  ppm. idf floors to integer nanos elementwise (LN parity).

Scale: both are explode/scan + bounded broadcast joins — linear, no
windows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register

# ------------------------------------------- multi-pattern contamination

_MP_NPAT = 8  # committed pattern-set size
_MP_QMOD = 10  # benchmark split: doc_id % 10 = 0

_MP_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    bg AS (
      SELECT ws[i] || ' ' || ws[i + 1] AS pat, COUNT(*) AS c
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM toks)
      WHERE doc_id % {_MP_QMOD} = 0
      GROUP BY 1
    ),
    pats AS MATERIALIZED (
      SELECT pat FROM bg ORDER BY c DESC, pat LIMIT {_MP_NPAT}
    ),
    hits AS (
      SELECT p.pat,
             (length(d.text) - length(replace(d.text, p.pat, '')))
               // length(p.pat) AS occ
      FROM documents d CROSS JOIN pats p
    )
    SELECT pat AS pattern,
           CAST(SUM(CASE WHEN occ > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_hit,
           CAST(SUM(occ) AS BIGINT) AS occurrences
    FROM hits GROUP BY pat
"""


@register("multi_pattern_contamination_scan", _MP_ORACLE)
def multi_pattern_contamination_scan(spark, sf_dir):
    """Benchmark contamination census over a committed pattern set: the
    {_MP_NPAT} most frequent word bigrams of the doc_id % {_MP_QMOD} = 0
    benchmark split ((count DESC, bigram ASC) total order), counted in
    every corpus doc with the exact substring-count identity
    (len − len(replace))/len(pat) — the declarative one-pass stand-in
    for an Aho-Corasick scan: the pattern set broadcasts, the corpus is
    scanned once per plan (Catalyst fuses the 8 counters into one
    projection). Complements the gram-join contamination checks
    (contamination_check_5gram / contamination_span_profile) with the
    literal-phrase form."""
    d = _t(spark, sf_dir, "documents")
    pairs = d.where(F.col("doc_id") % _MP_QMOD == 0).select(
        F.expr(
            "CASE WHEN size(split(text, ' ')) >= 2 THEN"
            " transform(sequence(1, size(split(text, ' ')) - 1),"
            " i -> concat_ws(' ', element_at(split(text, ' '), i),"
            " element_at(split(text, ' '), i + 1)))"
            " ELSE array() END"
        ).alias("ps")
    ).select(F.explode("ps").alias("pat"))
    pats = (
        pairs.groupBy("pat")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("pat"))
        .limit(_MP_NPAT)
        .select("pat")
    )
    hits = d.crossJoin(F.broadcast(pats)).select(
        "pat",
        F.expr(
            "(length(text) - length(replace(text, pat, '')))"
            " div length(pat)"
        ).alias("occ"),
    )
    return hits.groupBy(F.col("pat").alias("pattern")).agg(
        F.sum(F.expr("CASE WHEN occ > 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("docs_hit"),
        F.sum("occ").cast("long").alias("occurrences"),
    )


multi_pattern_contamination_scan.__doc__ = (
    multi_pattern_contamination_scan.__doc__
    .replace("{_MP_NPAT}", str(_MP_NPAT))
    .replace("{_MP_QMOD}", str(_MP_QMOD))
)


# ------------------------------------------------- token pruning census

_TP_THRESH_NANO = 500_000_000  # prune tokens with tf·idf_nano below 0.5
# (probed at sf0.01: the tf·idf distribution has median ≈ 5.1e8 — this
# threshold splits the corpus ~half/half; the first-draft 2.0 pruned 99%)

_TP_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, lang, w, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
            FROM documents)
      WHERE w <> '' GROUP BY doc_id, lang, w
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
    idf AS (
      SELECT w, CAST(FLOOR(ln(CAST(nd AS DOUBLE)
               / CAST(COUNT(DISTINCT doc_id) AS DOUBLE))
               * 1000000000.0e0) AS BIGINT) AS idf_nano
      FROM toks, n GROUP BY w, nd
    )
    SELECT t.lang,
           CAST(SUM(t.tf) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN t.tf * i.idf_nano < {_TP_THRESH_NANO}
                 THEN t.tf ELSE 0 END) AS BIGINT) AS n_prunable,
           CAST(CAST(SUM(CASE WHEN t.tf * i.idf_nano < {_TP_THRESH_NANO}
                 THEN t.tf ELSE 0 END) AS BIGINT) * 1000000
             // CAST(SUM(t.tf) AS BIGINT) AS BIGINT) AS prune_ppm
    FROM toks t JOIN idf i ON t.w = i.w
    GROUP BY t.lang
"""


@register("token_pruning_census", _TP_ORACLE)
def token_pruning_census(spark, sf_dir):
    """Token-pruning data-diet census: a token instance is prunable when
    its doc-level tf·idf falls below the committed 0.5 threshold
    (idf = ⌊ln(N/df)·1e9⌋ — the elementwise LN-parity floor; df =
    distinct docs containing the token). Per-lang prunable token
    fractions in exact ppm — the corpus-side sizing pass for
    token-dropping / mixture-of-depths style training diets. One token
    agg + one df agg + an equi-join; linear."""
    d = _t(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("doc_id", "lang", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    idf = (
        toks.groupBy("w")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
        .crossJoin(F.broadcast(nd))
        .select(
            "w",
            F.expr(
                "CAST(FLOOR(ln(CAST(nd AS DOUBLE) / CAST(df AS DOUBLE))"
                " * 1000000000.0e0) AS BIGINT)"
            ).alias("idf_nano"),
        )
    )
    # merge-pinned (the r7 rule): BOTH sides are corpus-scale aggregates
    # (idf has one row per vocabulary TYPE — millions at real scale), and
    # Catalyst's post-agg size estimate broadcast the 59M-row toks side
    # at the 1M-doc probe (driver OOM). Testdata's 31-word vocab made the
    # unpinned join look harmless at sf0.01.
    return (
        toks.join(idf.hint("merge"), "w")
        .groupBy("lang")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(
                F.expr(
                    f"CASE WHEN tf * idf_nano < {_TP_THRESH_NANO}"
                    " THEN tf ELSE 0 END"
                )
            )
            .cast("long")
            .alias("n_prunable"),
            F.expr(
                f"CAST(CAST(SUM(CASE WHEN tf * idf_nano < {_TP_THRESH_NANO}"
                " THEN tf ELSE 0 END) AS BIGINT) * 1000000"
                " div CAST(SUM(tf) AS BIGINT) AS BIGINT)"
            ).alias("prune_ppm"),
        )
    )
