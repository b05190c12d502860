"""DSIR-style data selection (round 7).

dsir_importance_select: Data Selection via Importance Resampling
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling") over hashed unigram features — THE standard pretraining
data-selection recipe. Feature = hash60('dsir|'||token) % 4096; the
target domain is the corpus's 'en' slice, raw is the whole corpus; each
bucket's log importance ratio ln p_target(b) − ln p_raw(b) (Laplace +1 /
+4096 smoothing) is floored to integer NANOS once per bucket (the
committed elementwise-LN discipline — LN parity pinned by
tests/test_libm_parity.py), and a document's log-weight is the exact
BIGINT sum k_b·lr(b) over its per-doc bucket counts. Output: the top-20
documents by (log-weight DESC, doc_id) — the examples importance
resampling would draw first.

Engine shape (100 TB): one token-scale pass into per-doc bucket counts
(the pre-aggregation lesson from naive_bayes — the join fan never sees
raw token occurrences), two 4096-row bounded bucket tables broadcast
back, one doc-keyed aggregation, TakeOrdered top-20. No windows, no
driver loops, nothing quadratic.

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's LLM-pipeline axis.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.hashing import hash60, sql_hash60

_B = 4096
_TARGET = "en"

# Identical per-bucket expression both engines: 4 LNs over exact BIGINTs,
# one floor to nanos. cnt_t/cnt_r are the bucket counts, nt/nr the token
# totals of the target/raw corpora. The add-1 Laplace smoothing denominator
# is the bucket count _B by construction (one pseudo-count per bucket) —
# interpolated so changing _B can never desynchronize smoothing from the
# bucket count (ADVICE r7; test_round7_models derives it from _B too).
_LR_NANO = (
    "CAST(FLOOR(("
    f"LN(CAST(cnt_t + 1 AS DOUBLE)) - LN(CAST(nt + {_B} AS DOUBLE))"
    f" - LN(CAST(cnt_r + 1 AS DOUBLE)) + LN(CAST(nr + {_B} AS DOUBLE))"
    ") * 1000000000) AS BIGINT)"
)

_BUCKET_SQL = sql_hash60("'dsir|' || w") + f" % {_B}"

_DSIR_ORACLE = f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    tb AS MATERIALIZED (
      SELECT {_BUCKET_SQL} AS b, CAST(COUNT(*) AS BIGINT) AS cnt_t
      FROM toks WHERE lang = '{_TARGET}' GROUP BY 1
    ),
    rb AS MATERIALIZED (
      SELECT {_BUCKET_SQL} AS b, CAST(COUNT(*) AS BIGINT) AS cnt_r
      FROM toks GROUP BY 1
    ),
    nn AS (
      SELECT CAST(SUM(CASE WHEN lang = '{_TARGET}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS nt,
             CAST(COUNT(*) AS BIGINT) AS nr
      FROM toks
    ),
    lr AS MATERIALIZED (
      SELECT rb.b, {_LR_NANO} AS lr_nano
      FROM (SELECT rb.b, COALESCE(tb.cnt_t, 0) AS cnt_t, rb.cnt_r
            FROM rb LEFT JOIN tb ON tb.b = rb.b) rb, nn
    ),
    dwb AS MATERIALIZED (
      SELECT doc_id, {_BUCKET_SQL} AS b, CAST(COUNT(*) AS BIGINT) AS k
      FROM toks GROUP BY doc_id, 2
    ),
    score AS (
      SELECT d.doc_id, CAST(SUM(d.k * lr.lr_nano) AS BIGINT) AS logweight_nano
      FROM dwb d JOIN lr ON lr.b = d.b
      GROUP BY d.doc_id
    )
    SELECT s.doc_id, doc.lang, s.logweight_nano
    FROM score s JOIN documents doc ON doc.doc_id = s.doc_id
    ORDER BY s.logweight_nano DESC, s.doc_id
    LIMIT 20
"""


@register("dsir_importance_select", _DSIR_ORACLE)
def dsir_importance_select(spark, sf_dir):
    """Top-20 documents by DSIR hashed-unigram importance log-weight —
    see module docstring. Output: 20 rows (doc_id, lang,
    logweight_nano)."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    ).withColumn("b", hash60(F.concat(F.lit("dsir|"), F.col("w"))) % _B)
    tb = (
        toks.where(F.col("lang") == _TARGET)
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt_t"))
    )
    rb = toks.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("cnt_r"))
    nn = toks.agg(
        F.sum(F.when(F.col("lang") == _TARGET, 1).otherwise(0))
        .cast("long")
        .alias("nt"),
        F.count(F.lit(1)).cast("long").alias("nr"),
    )
    lr = (
        rb.join(tb, "b", "left")
        .select("b", F.coalesce("cnt_t", F.lit(0)).alias("cnt_t"), "cnt_r")
        .crossJoin(F.broadcast(nn))
        .select("b", F.expr(_LR_NANO).alias("lr_nano"))
    )
    dwb = toks.groupBy("doc_id", "b").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    score = (
        dwb.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(F.sum(F.col("k") * F.col("lr_nano")).cast("long").alias("logweight_nano"))
    )
    return (
        score.join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "logweight_nano")
        .orderBy(F.col("logweight_nano").desc(), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Gopher quality-rule battery (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", appendix A1.1) — the
# standard pretraining quality filter, in exact integer arithmetic:
#   r1: 50 <= word count <= 100000
#   r2: 3 <= mean word length <= 10        (3n <= letters <= 10n cross-mult)
#   r3: symbol-to-word ratio <= 0.1        (10*(n_hash + n_ellipsis) <= n)
#   r4: >= 80% of words contain an alphabetic character (10*alpha >= 8*n)
#   r5: >= 2 occurrences of a committed stop-word set
# Output: per-lang rule pass counts + all-rules pass ppm (int128 division).
# ---------------------------------------------------------------------------

_STOPS = "'the','be','to','of','and','that','have','with','a','is'"

_GOPHER_DOC_SQL = f"""
      SELECT lang,
             len(string_split(text, ' ')) AS nw,
             length(replace(text, ' ', '')) AS letters,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             (length(text) - length(replace(text, '...', ''))) // 3
               AS n_ell,
             len(list_filter(string_split(text, ' '),
                             w -> regexp_matches(w, '[a-z]'))) AS alpha_w,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ({_STOPS}))) AS stop_w
      FROM documents
"""

_GOPHER_ORACLE = f"""
    WITH d AS ({_GOPHER_DOC_SQL}),
    r AS (
      SELECT lang,
             CASE WHEN nw BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS r1,
             CASE WHEN 3 * nw <= letters AND letters <= 10 * nw
                  THEN 1 ELSE 0 END AS r2,
             CASE WHEN 10 * (n_hash + n_ell) <= nw THEN 1 ELSE 0 END AS r3,
             CASE WHEN 10 * alpha_w >= 8 * nw THEN 1 ELSE 0 END AS r4,
             CASE WHEN stop_w >= 2 THEN 1 ELSE 0 END AS r5
      FROM d
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(r1) AS BIGINT) AS pass_wordcount,
           CAST(SUM(r2) AS BIGINT) AS pass_wordlen,
           CAST(SUM(r3) AS BIGINT) AS pass_symbols,
           CAST(SUM(r4) AS BIGINT) AS pass_alpha,
           CAST(SUM(r5) AS BIGINT) AS pass_stopwords,
           CAST(SUM(r1 * r2 * r3 * r4 * r5) AS BIGINT) AS pass_all,
           CAST(CAST(SUM(r1 * r2 * r3 * r4 * r5) AS HUGEINT) * 1000000
                // CAST(COUNT(*) AS HUGEINT) AS BIGINT) AS pass_all_ppm
    FROM r GROUP BY lang
"""


@register("gopher_quality_rules", _GOPHER_ORACLE)
def gopher_quality_rules(spark, sf_dir):
    """Gopher quality-rule battery per language — see module docstring.
    Output: one row per lang (n_docs, per-rule pass counts, pass_all,
    pass_all_ppm). One fact pass, bounded output; every rule is an
    integer cross-multiplication (no float thresholds)."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.expr("size(split(text, ' '))").cast("long").alias("nw"),
        F.expr("length(replace(text, ' ', ''))").cast("long").alias("letters"),
        F.expr("length(text) - length(replace(text, '#', ''))")
        .cast("long")
        .alias("n_hash"),
        F.expr("(length(text) - length(replace(text, '...', ''))) div 3")
        .cast("long")
        .alias("n_ell"),
        F.expr("size(filter(split(text, ' '), w -> w rlike '[a-z]'))")
        .cast("long")
        .alias("alpha_w"),
        F.expr(f"size(filter(split(text, ' '), w -> w IN ({_STOPS})))")
        .cast("long")
        .alias("stop_w"),
    )
    r = d.select(
        "lang",
        F.expr("CASE WHEN nw BETWEEN 50 AND 100000 THEN 1 ELSE 0 END").alias("r1"),
        F.expr(
            "CASE WHEN 3 * nw <= letters AND letters <= 10 * nw THEN 1 ELSE 0 END"
        ).alias("r2"),
        F.expr("CASE WHEN 10 * (n_hash + n_ell) <= nw THEN 1 ELSE 0 END").alias(
            "r3"
        ),
        F.expr("CASE WHEN 10 * alpha_w >= 8 * nw THEN 1 ELSE 0 END").alias("r4"),
        F.expr("CASE WHEN stop_w >= 2 THEN 1 ELSE 0 END").alias("r5"),
    )
    return r.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("r1").cast("long").alias("pass_wordcount"),
        F.sum("r2").cast("long").alias("pass_wordlen"),
        F.sum("r3").cast("long").alias("pass_symbols"),
        F.sum("r4").cast("long").alias("pass_alpha"),
        F.sum("r5").cast("long").alias("pass_stopwords"),
        F.sum(F.expr("r1 * r2 * r3 * r4 * r5")).cast("long").alias("pass_all"),
        F.expr(
            "CAST(CAST(SUM(r1 * r2 * r3 * r4 * r5) AS DECIMAL(38,0)) * 1000000"
            " div CAST(COUNT(*) AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("pass_all_ppm"),
    )
