"""Relational batch 12: Spark 4 collation comparisons, schema'd JSON parsing
(from_json), and the array-function surface.

Reference parity: extensions beyond the reference kernel (SURVEY.md §2.3) —
string collation replaces the usual lower()-everywhere dance with
collation-aware comparison semantics inside Catalyst; from_json is the
schema-enforced cousin of the VariantType path (variant_events_extract);
the array functions are the corpus-array toolkit every token-level pipeline
leans on.

Cross-engine notes: UTF8_LCASE equals DuckDB lower()-comparison on this
ASCII corpus; Spark array_intersect and DuckDB list_intersect both return
DISTINCT intersections but in different orders — compare sizes or sorted
serializations, never raw arrays.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t


# ---------------------------------------------------------------------------
# Spark 4 collation: case-insensitive distinct/grouping without lower().
# ---------------------------------------------------------------------------
@register(
    "collation_ci_word_stats",
    """
    WITH w AS (
      SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
    )
    SELECT lang,
           CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words_cs,
           CAST(COUNT(DISTINCT lower(word)) AS BIGINT) AS n_words_ci
    FROM w WHERE word <> '' GROUP BY lang
    """,
)
def collation_ci_word_stats(spark, sf_dir):
    """Per-language distinct word counts, case-sensitive vs case-insensitive
    — the CI side uses Spark 4's COLLATE UTF8_LCASE, so the comparison
    semantics live in the column's collation (usable by joins/group-bys
    engine-wide) instead of a lower() rewrite at every call site. On this
    ASCII corpus UTF8_LCASE ≡ lower() comparison, which is the oracle."""
    d = _t(spark, sf_dir, "documents")
    w = d.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word") != "")
    return w.groupBy("lang").agg(
        F.countDistinct("word").alias("n_words_cs"),
        F.countDistinct(F.expr("COLLATE(word, 'UTF8_LCASE')")).alias("n_words_ci"),
    )


# ---------------------------------------------------------------------------
# Schema'd JSON parsing: from_json (vs the schemaless variant path).
# ---------------------------------------------------------------------------
@register(
    "from_json_props_stats",
    """
    SELECT event_type,
           CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS n_parsed,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k
    FROM events GROUP BY event_type
    """,
)
def from_json_props_stats(spark, sf_dir):
    """Schema-enforced JSON ingestion: from_json(props, 'k BIGINT') parses
    into a typed struct at scan time (malformed rows become NULL structs
    instead of job failures), unlike variant_events_extract's late-bound
    variant path. Downstream is plain typed-column aggregation."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.from_json("props", "k BIGINT").alias("j")
    )
    return parsed.groupBy("event_type").agg(
        F.count("j.k").alias("n_parsed"),
        F.sum("j.k").alias("sum_k"),
    )


# ---------------------------------------------------------------------------
# Array-function surface over the token arrays.
# ---------------------------------------------------------------------------
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


@register(
    "array_functions_surface",
    f"""
    WITH w AS (
      SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents
    )
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_words,
           CAST(len(list_distinct(words)) AS BIGINT) AS n_unique,
           CAST(len(list_intersect(words,
                ['{"','".join(_STOPWORDS)}'])) AS BIGINT) AS n_stop_kinds,
           array_to_string(words[1:3], ' ') AS first3,
           CAST(COALESCE(list_position(words, 'the'), 0) AS BIGINT) AS pos_the
    FROM w
    """,
)
def array_functions_surface(spark, sf_dir):
    """Array toolkit in one pass: size / array_distinct / array_intersect
    (distinct-intersection cardinality — element ORDER differs between
    engines, so only sizes are compared) / slice / array_position. All JVM
    expressions over the split-token array; scan-speed, no shuffle beyond
    none (per-row projection only)."""
    d = _t(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    w = d.select("doc_id", F.split("text", " ").alias("words"))
    return w.select(
        "doc_id",
        F.size("words").cast("long").alias("n_words"),
        F.size(F.array_distinct("words")).cast("long").alias("n_unique"),
        F.size(F.array_intersect("words", stop)).cast("long").alias("n_stop_kinds"),
        F.array_join(F.slice("words", 1, 3), " ").alias("first3"),
        F.coalesce(
            F.array_position("words", "the"), F.lit(0)
        ).cast("long").alias("pos_the"),
    )
