"""Line-level boilerplate removal (round 6): the CCNet/Gopher corpus-
cleaning step the dedup family was missing — drop text units that repeat
ACROSS documents (nav bars, footers, license blurbs) while keeping each
document's unique content. This corpus has no newlines, so the "line" is
a 5-token non-overlapping SEGMENT (documented analog; the pipeline shape
— unit split → corpus-frequency count → per-doc filter → reassembly — is
exactly the production one).

Scale shape (r12): decide-on-small-rows, attach-to-big-rows (guide §8).
The cross-doc flag is a partial-aggregatable `groupBy(h).agg(min/max
doc_id)` — the shuffle carries ~1 row per distinct fingerprint — joined
back onto the segment frame with the minhash size dispatch: broadcast
below the declared footer doc count, merge-pinned above it (AQE can
skew-split a SortMergeJoin side; it can NOT split a window partition,
which made the r11 `Window.partitionBy(h)` shape a hot-key straggler
bomb — boilerplate fingerprints are by definition the hottest keys).
Fingerprints are 60-bit md5 (hash60 — the committed cross-engine hash).

Disciplines (CLAUDE.md): docs with <5 tokens produce ZERO segments via
an explicit size guard (sequence(1, n div 5) DESCENDS when n<5 — the
round-6 trap); reassembled text is order-pinned (sort_array over (g, s)
structs ≡ DuckDB list(... ORDER BY g)); the all-boilerplate empty case
COALESCEs to '' (DuckDB's empty FILTERed list() is NULL — the round-2
empty-aggregate trap).

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's LLM-pipeline axis.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.dedup.minhash import BROADCAST_MAX_DOCS
from hpmr_spark.functions.hashing import sql_hash60
from hpmr_spark.operators.dedup_queries import _parquet_num_rows

_SEG = 5  # tokens per segment
_DF_MIN = 2  # segment is boilerplate if it appears in >= 2 distinct docs

_BOILER_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents
    ),
    seg AS MATERIALIZED (
      SELECT doc_id, g.g,
             list_aggregate(toks[g.g * {_SEG} + 1 : g.g * {_SEG} + {_SEG}],
                            'string_agg', ' ') AS s
      FROM t, LATERAL (
        SELECT unnest(range(CAST(len(toks) // {_SEG} AS BIGINT))) AS g
      ) g
    ),
    fp AS (
      SELECT doc_id, g, {sql_hash60('s')} AS h, s FROM seg
    ),
    df AS (
      SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM fp GROUP BY h
    ),
    flagged AS MATERIALIZED (
      SELECT f.doc_id, f.g, f.s,
             CASE WHEN d.ndocs >= {_DF_MIN} THEN 1 ELSE 0 END AS boiler
      FROM fp f JOIN df d ON d.h = f.h
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_seg,
             CAST(SUM(boiler) AS BIGINT) AS n_boiler,
             COALESCE(string_agg(CASE WHEN boiler = 0 THEN s END, ' '
                                 ORDER BY g), '') AS kept_text
      FROM flagged GROUP BY doc_id
    )
    SELECT t.doc_id,
           COALESCE(p.n_seg, 0) AS n_seg,
           COALESCE(p.n_boiler, 0) AS n_boiler,
           CAST(len(t.toks) - COALESCE(p.n_seg, 0) * {_SEG} AS BIGINT)
             AS trailing_tokens,
           CAST((COALESCE(p.n_seg, 0) - COALESCE(p.n_boiler, 0)) * {_SEG}
                + len(t.toks) - COALESCE(p.n_seg, 0) * {_SEG} AS BIGINT)
             AS tokens_kept,
           {sql_hash60("COALESCE(p.kept_text, '')")} AS cleaned_fp
    FROM t LEFT JOIN per_doc p ON p.doc_id = t.doc_id
    ORDER BY t.doc_id
"""


@register("dedup_boilerplate_segments", _BOILER_ORACLE)
def dedup_boilerplate_segments(spark, sf_dir):
    """Cross-document boilerplate removal: 5-token segments whose
    fingerprint appears in ≥2 distinct documents are dropped; each doc
    reports segment/boilerplate counts, surviving token count (trailing
    <5-token remainder always kept), and the hash60 fingerprint of its
    order-preserved cleaned text — the oracle checks the RECONSTRUCTION,
    not just the counts.

    r11 optimization (guide §2.3/§3): `explode_outer` keeps zero-segment
    docs as a NULL-segment row so `size(toks)` rides along and the old
    join back to the doc frame disappears; no countDistinct Expand — a
    segment appears in ≥ _DF_MIN = 2 distinct docs iff
    min(doc_id) ≠ max(doc_id) over its fingerprint.

    r12 de-skew (guide §2.5/§8, VERDICT r11 item 1): the r11 shape
    computed that flag with `Window.partitionBy(h)`, which forces EVERY
    copy of the hottest fingerprint — carrying its full segment text —
    into one task, and AQE skew handling cannot split a window
    partition. Now the flag is a partial-aggregatable
    `groupBy(h).agg(min/max doc_id)` (the shuffle carries ~1 row per
    distinct h) joined back on h: broadcast when the footer declares
    ≤ BROADCAST_MAX_DOCS docs, merge-pinned above it / when unknown
    (AQE CAN skew-split an SMJ side). Costs one extra segment-frame
    derivation (decide on small rows, attach to big rows — guide §8);
    values identical by construction; the oracle text is untouched."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    # explicit guard: n div 5 = 0 segments for short docs (sequence DESCENDS
    # when start > stop — CASE to empty array, the committed idiom)
    seg = (
        d.select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tok"),
            F.expr(
                f"CASE WHEN size(toks) >= {_SEG} THEN"
                f" transform(sequence(CAST(0 AS BIGINT), size(toks) div {_SEG} - 1),"
                f" g -> struct(g AS g,"
                f" array_join(slice(toks, CAST(g * {_SEG} + 1 AS INT), {_SEG}), ' ') AS s))"
                f" ELSE array() END"
            ).alias("segs"),
        )
        .select("doc_id", "n_tok", F.explode_outer("segs").alias("e"))
        .select("doc_id", "n_tok", F.col("e.g").alias("g"), F.col("e.s").alias("s"))
    )
    # sentinel rows (zero-segment docs, s NULL) get a UNIQUE NEGATIVE h so
    # they spread across window partitions instead of collapsing into one
    # NULL-h partition (a skew bomb at corpus scale); real h is a 60-bit
    # non-negative hash60, so the ranges cannot collide — and the sentinel
    # boiler value is NULL regardless (g IS NULL gates the flag)
    fp = seg.withColumn(
        "h",
        F.coalesce(
            F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("long"),
            -F.col("doc_id") - F.lit(1),
        ),
    )
    # boiler ⇔ h seen in ≥ _DF_MIN (=2) distinct docs ⇔ min ≠ max doc_id
    # over the fingerprint. Decided on a ~1-row-per-distinct-h frame
    # (partial aggregation collapses hot keys map-side) and attached by
    # a size-dispatched join; NULL (excluded from the sum) on the
    # zero-segment sentinel rows (g IS NULL).
    # Two segment-frame derivations (decide small, attach big — guide §8;
    # an eager localCheckpoint and a lazy persist of fp were BOTH probed
    # slower: materializing the text-carrying segment frame costs more
    # than re-deriving it). The flag side prunes to (doc_id, h).
    flags = fp.groupBy("h").agg(
        (F.min("doc_id") != F.max("doc_id")).cast("int").alias("_xdoc")
    )
    n_docs = _parquet_num_rows(f"{sf_dir}/documents.parquet")
    if n_docs is not None and n_docs <= BROADCAST_MAX_DOCS:
        joined = fp.join(F.broadcast(flags), "h")
    else:
        joined = fp.join(flags.hint("merge"), "h")
    flagged = joined.withColumn(
        "boiler", F.when(F.col("g").isNotNull(), F.col("_xdoc"))
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count("g").cast("long").alias("n_seg"),
        F.coalesce(F.sum("boiler"), F.lit(0)).cast("long").alias("n_boiler"),
        F.max("n_tok").alias("n_tok"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("boiler") == 0,
                            F.struct(F.col("g"), F.col("s")),
                        )
                    )
                ),
                lambda st: st["s"],
            ),
            " ",
        ).alias("kept_text"),
    )
    return per_doc.select(
        "doc_id",
        "n_seg",
        "n_boiler",
        (F.col("n_tok") - F.col("n_seg") * _SEG)
        .cast("long")
        .alias("trailing_tokens"),
        (
            (F.col("n_seg") - F.col("n_boiler")) * _SEG
            + F.col("n_tok")
            - F.col("n_seg") * _SEG
        )
        .cast("long")
        .alias("tokens_kept"),
        F.conv(F.substring(F.md5(F.col("kept_text")), 1, 15), 16, 10)
        .cast("long")
        .alias("cleaned_fp"),
    ).orderBy("doc_id")
