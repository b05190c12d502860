"""Oracle-checked text-analysis queries over the `documents` table.

These are the training-data-pipeline text operators (BASELINE.json north
star): token counting, quality scoring, language-ID, fingerprinting — all as
pure Catalyst expressions (see hpmr_spark/functions/text.py), so at 100 TB
they run at scan speed with full whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t
from hpmr_spark.functions import text as T

_TOKRE = T.TOKEN_RE.replace("\\s", "\\s")  # same RE2-compatible pattern both engines

_SW_SQL = "'" + "','".join(T.STOPWORDS) + "'"


@register(
    "text_token_stats",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{_TOKRE}')) AS BIGINT) AS n_tokens,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_ws_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_c,
           CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS BIGINT)
             AS n_punct
    FROM documents
    """,
)
def text_token_stats(spark, sf_dir):
    """Token counting: BPE-ish regex tokens + whitespace tokens + char/punct
    counts. regexp_extract_all is JVM-side; no UDF."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.whitespace_token_count(F.col("text")).alias("n_ws_tokens"),
        T.char_count(F.col("text")).alias("n_chars_c"),
        T.punct_count(F.col("text")).alias("n_punct"),
    )


@register(
    "text_quality_score",
    f"""
    WITH t AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(text), '{_TOKRE}')) AS n_tok,
             length(text) AS n_chars,
             len(list_filter(regexp_extract_all(lower(text), '{_TOKRE}'),
                             x -> x IN ({_SW_SQL}))) AS n_sw,
             length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS n_punct
      FROM documents)
    SELECT doc_id,
           CAST(floor(500000 * least(n_tok, 64) / 64)
              + floor(300000 * least(4 * n_sw, n_tok) / greatest(n_tok, 1))
              + floor(200000 * (n_chars - least(4 * n_punct, n_chars)) / greatest(n_chars, 1))
             AS BIGINT) AS quality_ppm
    FROM t
    """,
)
def text_quality_score(spark, sf_dir):
    """Quality heuristic (parts-per-million integer): length + stopword-ratio
    + punctuation-ratio terms over exact integer counts — engine-invariant."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", T.quality_score_ppm(F.col("text")).alias("quality_ppm"))


def _lang_score_sql(lang: str) -> str:
    markers = "'" + "','".join(T.LANG_MARKERS[lang]) + "'"
    return (
        f"len(list_filter(regexp_extract_all(lower(text), '{_TOKRE}'), "
        f"x -> x IN ({markers})))"
    )


_LANGS = sorted(T.LANG_MARKERS)
_SCORE_COLS = ",\n             ".join(f"{_lang_score_sql(l)} AS s_{l}" for l in _LANGS)
_ARGMAX_CASE = " ".join(
    f"WHEN s_{l} >= " + " AND s_{0} >= ".format(l).join([f"s_{o}" for o in _LANGS if o != l])
    + f" THEN '{l}'"
    for l in _LANGS
)


@register(
    "text_lang_id",
    f"""
    WITH t AS (
      SELECT doc_id, lang,
             {_SCORE_COLS}
      FROM documents)
    SELECT doc_id, lang,
           CASE WHEN s_de <= 0 AND s_en <= 0 AND s_es <= 0 AND s_fr <= 0 AND s_zh <= 0
                THEN 'und'
                {_ARGMAX_CASE}
           END AS lang_pred
    FROM t
    """,
)
def text_lang_id(spark, sf_dir):
    """Language-ID heuristic: marker-stopword hit count per language, argmax
    with lexicographic tie-break, 'und' when nothing matches."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", T.lang_id(F.col("text")).alias("lang_pred"))


@register(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           substring(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 16) AS fp64
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (identical digests across engines)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.fingerprint(F.col("text")).alias("fp"),
        T.fingerprint64(F.col("text")).alias("fp64"),
    )


@register(
    "doc_stats_by_lang_source",
    f"""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(regexp_extract_all(lower(text), '{_TOKRE}'))) AS BIGINT) AS total_tokens,
           ROUND(SUM(len(regexp_extract_all(lower(text), '{_TOKRE}'))) * 1.0 / COUNT(*), 6)
             AS avg_tokens
    FROM documents GROUP BY lang, source
    """,
)
def doc_stats_by_lang_source(spark, sf_dir):
    """Corpus profile: per (lang, source) doc/char/token totals — the summary
    scan a pipeline runs before filtering decisions."""
    d = _t(spark, sf_dir, "documents")
    n_tok = T.token_count(F.col("text"))
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(n_tok).cast("long").alias("total_tokens"),
        F.round(F.sum(n_tok) * 1.0 / F.count(F.lit(1)), 6).alias("avg_tokens"),
    )
