"""Round-9 wave 1: corpus readability + compressibility censuses — two
standard text-quality signals the registry lacked:

- flesch_kincaid_readability: the Flesch-Kincaid grade formula
  (Kincaid et al. 1975) per document — words from whitespace split,
  syllables as maximal [aeiouy]+ vowel-group runs (min 1/word), and a
  documented 15-words-per-sentence proxy (this synthetic corpus carries
  no sentence punctuation). Per-language census of exact integer milli
  grades.
- lz78_phrase_census: the LZ78 incremental-dictionary parse (Ziv &
  Lempel 1978) per document at WORD granularity — the classic
  Lempel-Ziv complexity proxy behind compression-ratio quality filters:
  low phrase/word ratio = highly repetitive document.

Integer discipline (CLAUDE.md): the FK grade is one final double
expression per document from exact integer (W, S, Y) — floored to milli
BEFORE any aggregation; LZ78 counts are pure integers. The LZ78 fold is
the in-row string-fold idiom (the BPE-merge '|'-delimited fold, round 6),
word-level so the dictionary scan is O(words²·len) on ≤ ~100-word docs.

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's text-analysis axis.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register

# words: whitespace split, empties dropped (identical text both engines)
_WL = "filter(split(text, ' '), w -> w <> '')"

# syllable groups per word: #maximal [aeiouy]+ runs = length after
# collapsing each run to one 'V' minus length after deleting all vowels.
# (Spark regexp_replace is global; DuckDB needs the explicit 'g' flag.)
def _syl(g: str) -> str:
    return (
        "greatest(CAST(1 AS BIGINT),"
        f" CAST(length(regexp_replace(w, '[aeiouy]+', 'V'{g}))"
        f" - length(regexp_replace(w, '[aeiouy]+', ''{g})) AS BIGINT))"
    )


def _fk_cols(g: str) -> str:
    """Shared per-doc (W, Y) expression text; g = extra regexp flag arg."""
    return (
        f"CAST(size(wl) AS BIGINT) AS w_cnt,"
        f" aggregate(wl, CAST(0 AS BIGINT), (acc, w) -> acc + {_syl(g)}) AS y_cnt"
    )


# FK grade (milli): 0.39·W/S + 11.8·Y/W − 15.59, S = ceil(W/15) proxy.
# One final double expression from exact ints, floored per doc.
_GRADE = (
    "CAST(FLOOR((390.0e0 * w_cnt) / s_cnt + (11800.0e0 * y_cnt) / w_cnt"
    " - 15590.0e0) AS BIGINT)"
)

_FK_ORACLE = f"""
    WITH wd AS (
      SELECT lang, list_filter(string_split(text, ' '), w -> w <> '') AS wl
      FROM documents
    ),
    per AS (
      SELECT lang,
             CAST(len(wl) AS BIGINT) AS w_cnt,
             CAST(list_sum(list_transform(wl, w ->
               greatest(CAST(1 AS BIGINT),
                 CAST(length(regexp_replace(w, '[aeiouy]+', 'V', 'g'))
                 - length(regexp_replace(w, '[aeiouy]+', '', 'g')) AS BIGINT))
             )) AS BIGINT) AS y_cnt
      FROM wd WHERE len(wl) > 0
    ),
    graded AS (
      SELECT lang, w_cnt, y_cnt, (w_cnt + 14) // 15 AS s_cnt
      FROM per
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w_cnt) AS BIGINT) AS n_words,
           CAST(SUM(y_cnt) AS BIGINT) AS n_syllables,
           CAST(CAST(SUM({_GRADE}) AS HUGEINT) // COUNT(*) AS BIGINT)
             AS avg_grade_milli,
           CAST(MIN({_GRADE}) AS BIGINT) AS min_grade_milli,
           CAST(MAX({_GRADE}) AS BIGINT) AS max_grade_milli
    FROM graded
    GROUP BY lang
"""


@register("flesch_kincaid_readability", _FK_ORACLE)
def flesch_kincaid_readability(spark, sf_dir):
    """Flesch-Kincaid grade level per document (Kincaid et al. 1975),
    aggregated per language: 0.39·(words/sentences) + 11.8·(syllables/
    words) − 15.59 in integer milli. Syllables = maximal [aeiouy]+ runs
    per word (min 1); sentences = ceil(words/15) — a documented proxy
    because this corpus has no sentence punctuation. Grade is one final
    double expression per doc from exact integers (W, S, Y), floored to
    milli BEFORE the sum, so parallel summation never decides a value.
    Scale: one map pass + one small groupBy — no joins, no windows."""
    d = _t(spark, sf_dir, "documents")
    per = (
        d.select("lang", F.expr(_WL).alias("wl"))
        .where(F.expr("size(wl) > 0"))
        .select("lang", F.expr(f"struct({_fk_cols('')})").alias("_fk"))
        .select("lang", "_fk.w_cnt", "_fk.y_cnt")
        .withColumn("s_cnt", F.expr("(w_cnt + 14) div 15"))
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("w_cnt").cast("long").alias("n_words"),
        F.sum("y_cnt").cast("long").alias("n_syllables"),
        F.expr(f"CAST(SUM({_GRADE}) AS BIGINT) div COUNT(1)").alias(
            "avg_grade_milli"
        ),
        F.expr(f"MIN({_GRADE})").cast("long").alias("min_grade_milli"),
        F.expr(f"MAX({_GRADE})").cast("long").alias("max_grade_milli"),
    )


# --------------------------------------------------------------------- LZ78

# In-row LZ78 word-level parse: acc = '<dict>#<cur>' where <dict> is a
# '|'-delimited phrase dictionary ('~' joins words inside a phrase; the
# corpus alphabet is [a-z ], so '#', '|', '~' never collide). Per word:
# extend the current phrase; if the extension is already a dictionary
# phrase keep extending, else emit it as a new phrase and reset.
def _lz78_fold(instr_fn: str) -> str:
    cand = (
        "CASE WHEN split_part(acc, '#', 2) = '' THEN w"
        " ELSE split_part(acc, '#', 2) || '~' || w END"
    )
    return (
        f"(acc, w) -> CASE WHEN {instr_fn}(split_part(acc, '#', 1),"
        f" '|' || ({cand}) || '|') > 0"
        f" THEN split_part(acc, '#', 1) || '#' || ({cand})"
        f" ELSE split_part(acc, '#', 1) || ({cand}) || '|' || '#' END"
    )


# phrases = '|'-count of dict minus 1, plus 1 if a partial phrase remains
_LZ_COUNT = (
    "CAST(length(split_part(z, '#', 1))"
    " - length(replace(split_part(z, '#', 1), '|', '')) AS BIGINT) - 1"
    " + CASE WHEN split_part(z, '#', 2) <> '' THEN 1 ELSE 0 END"
)

_LZ_ORACLE = f"""
    WITH wd AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS wl
      FROM documents
    ),
    folded AS (
      SELECT doc_id, CAST(len(wl) AS BIGINT) AS n_words,
             list_reduce(list_prepend('|#', wl), {_lz78_fold('instr')}) AS z
      FROM wd WHERE len(wl) > 0
    )
    SELECT doc_id, n_words,
           CAST({_LZ_COUNT} AS BIGINT) AS n_phrases,
           CAST(({_LZ_COUNT}) * 1000000 // n_words AS BIGINT) AS lz_ratio_ppm
    FROM folded
"""


@register("lz78_phrase_census", _LZ_ORACLE)
def lz78_phrase_census(spark, sf_dir):
    """LZ78 incremental-dictionary parse per document at word granularity
    (Ziv & Lempel 1978): the number of parse phrases is the classic
    Lempel-Ziv complexity — the compressibility signal behind
    compression-ratio quality filters (a low phrase/word ratio flags
    repetitive boilerplate). Pure in-row string fold (the '|'-delimited
    BPE-fold idiom): no shuffle at all until the (absent) aggregation —
    per-doc rows hash directly. Dictionary containment is an exact
    delimited-substring check, identical in both engines (instr)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.expr(_WL).alias("wl"))
        .where(F.expr("size(wl) > 0"))
        .select(
            "doc_id",
            F.expr("CAST(size(wl) AS BIGINT)").alias("n_words"),
            F.expr(
                f"aggregate(wl, '|#', {_lz78_fold('instr')})"
            ).alias("z"),
        )
        .select(
            "doc_id",
            "n_words",
            F.expr(f"CAST({_LZ_COUNT} AS BIGINT)").alias("n_phrases"),
            F.expr(
                f"CAST(({_LZ_COUNT}) * 1000000 div n_words AS BIGINT)"
            ).alias("lz_ratio_ppm"),
        )
    )
