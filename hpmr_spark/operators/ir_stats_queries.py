"""IR + robust-stats batch: BM25 ranking, Shannon token entropy, interval
union coverage (sweep line), and Tukey-fence outlier detection on exact
rank-selected quartiles.

Cross-engine float discipline (extends the verified rules in CLAUDE.md):
- LN is bit-identical across Spark (JVM Math.log), DuckDB, and CPython on
  this platform — probed over 2M values including ratios (floor(ln(x)*1e6)
  elementwise, 0 mismatches). BM25 and entropy therefore use the
  one-expression-over-exact-integers rule WITH ln inside: every double
  expression is evaluated elementwise from exact BIGINT inputs, floored to
  ppm BIGINT immediately, and only integers are ever summed in parallel.
  This is a commitment (like the LSH constants): re-verify with selfcheck
  if the platform's libm changes.
- Quartiles are k-th order statistics (k = ceil(n/4), ceil(3n/4)) — exact
  and tie-safe (the k-th value is well-defined no matter how ties order).
  Tukey fences stay in integers via cross-multiplication:
  2c < 5*q1 - 3*q3  <=>  c < q1 - 1.5*(q3-q1).
- Interval sweep is exact integer micros with a full (s_us, event_id)
  tie-break so the running max is deterministic row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.sources.tables import load_events

# ---------------------------------------------------------------------------
# BM25 (Lucene-style idf = ln(1 + (N-df+0.5)/(df+0.5)), k1=1.2, b=0.75):
# top-5 documents per committed query term, scores in exact ppm.
# ---------------------------------------------------------------------------
_BM25_TERMS = ["join", "filter", "customer"]

# The ONE score expression, identical text on both engines. Inputs are exact
# BIGINTs (tf, dl, df, n_docs, sum_dl); output is floored to ppm before any
# aggregation. 2.2 = k1+1; 0.25 = 1-b; dl/avgdl = dl*n_docs/sum_dl.
_BM25_EXPR = (
    "CAST(FLOOR(LN(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))"
    " * (CAST(tf AS DOUBLE) * 2.2)"
    " / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)"
    " * CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE)))"
    " * 1000000) AS BIGINT)"
)

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@register(
    "bm25_topk_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_dl
      FROM documents
    ),
    dl AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      FROM documents
    ),
    tf AS (
      SELECT doc_id, w AS term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE w IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, w
    ),
    df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    scored AS (
      SELECT tf.term, tf.doc_id, tf.tf, dl.dl,
             {_BM25_EXPR} AS score_ppm
      FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats
    ),
    ranked AS (
      SELECT term, doc_id, tf, score_ppm,
             ROW_NUMBER() OVER (PARTITION BY term
                                ORDER BY score_ppm DESC, doc_id) AS rnk
      FROM scored
    )
    SELECT term, doc_id, tf, score_ppm, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def bm25_topk_docs(spark, sf_dir):
    """BM25 top-5 documents per query term. All sufficient statistics (tf,
    dl, df, N, sum_dl) are exact BIGINTs; the score is one double
    expression (Lucene idf, k1=1.2, b=0.75) floored to ppm elementwise —
    identical SQL text on both engines, so IEEE evaluation including LN is
    bit-equal (probed; see module docstring). Plan: term filter pushes to
    the token explode (3 terms survive), df/N/sum_dl are broadcast 1-row /
    3-row frames, and the per-term top-5 is a bounded window over the tf
    frame — the corpus is scanned twice (dl + tf) and never shuffled whole.
    At 100 TB the tf frame is |terms|-bounded per doc, the ranking state
    5 rows per term."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    stats = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("sum_dl"),
    )
    dl = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("dl")
    )
    tf = (
        toks.where(F.col("w").isin(_BM25_TERMS))
        .groupBy("doc_id", F.col("w").alias("term"))
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("score_ppm", F.expr(_BM25_EXPR))
    )
    w = Window.partitionBy("term").orderBy(F.desc("score_ppm"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 5)
        .select("term", "doc_id", "tf", "score_ppm", "rnk")
    )


# ---------------------------------------------------------------------------
# Shannon entropy of the token distribution per language, exact-ppm floor
# composition: H_ppm = floor(ln(N)*1e6) - (sum_w floor(c_w*ln(c_w)*1e6)) div N.
# ---------------------------------------------------------------------------
_ENTROPY_TERM = (
    "CAST(FLOOR(CAST(n_w AS DOUBLE) * LN(CAST(n_w AS DOUBLE)) * 1000000) AS BIGINT)"
)


@register(
    "token_entropy_by_lang",
    f"""
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    c AS (
      SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS n_w
      FROM toks GROUP BY lang, w
    ),
    t AS (
      SELECT lang, n_w, {_ENTROPY_TERM} AS term_uppm FROM c
    )
    SELECT lang,
           CAST(SUM(n_w) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(CAST(FLOOR(LN(CAST(SUM(n_w) AS DOUBLE)) * 1000000) AS BIGINT)
                - CAST(SUM(term_uppm) AS BIGINT) // CAST(SUM(n_w) AS BIGINT)
                AS BIGINT) AS entropy_uppm
    FROM t
    GROUP BY lang
    """,
)
def token_entropy_by_lang(spark, sf_dir):
    """Shannon entropy (nats, micro-units) of each language's token
    distribution: H = ln(N) - sum(c*ln c)/N, computed under the floor-ppm
    commitment — each c*ln(c) term is floored to an integer elementwise
    (deterministic given the LN parity probe), so the parallel SUM is exact
    integer addition and the final division is positive floor div. Plan:
    one (lang, w) groupBy (vocab-bounded state), then a lang-level rollup —
    two partial-aggregated shuffles, corpus text never moves twice."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(F.split("text", " ")).alias("w"))
    c = toks.groupBy("lang", "w").agg(F.count(F.lit(1)).cast("long").alias("n_w"))
    t = c.withColumn("term_uppm", F.expr(_ENTROPY_TERM))
    return t.groupBy("lang").agg(
        F.sum("n_w").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.expr(
            "CAST(FLOOR(LN(CAST(SUM(n_w) AS DOUBLE)) * 1000000) AS BIGINT)"
            " - CAST(SUM(term_uppm) AS BIGINT) div CAST(SUM(n_w) AS BIGINT)"
        ).cast("long").alias("entropy_uppm"),
    )


# ---------------------------------------------------------------------------
# Interval union coverage per user (sweep line over 10-minute event
# intervals): total covered micros + island count.
# ---------------------------------------------------------------------------
@register(
    "interval_coverage_union",
    """
    WITH iv AS (
      SELECT user_id, event_id,
             CAST(epoch_us(ts) AS BIGINT) AS s_us,
             CAST(epoch_us(ts) AS BIGINT) + 600000000 AS e_us
      FROM events
    ),
    sw AS (
      SELECT user_id, event_id, s_us, e_us,
             CASE WHEN s_us > MAX(e_us) OVER (PARTITION BY user_id
                    ORDER BY s_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    isl AS (
      -- island numbering MUST use the same full tie-break as the flag
      -- window: under (s_us) ties an order-mismatched running sum could
      -- split identical intervals into different islands
      SELECT user_id, e_us, s_us,
             SUM(new_island) OVER (PARTITION BY user_id
               ORDER BY s_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
      FROM sw
    ),
    spans AS (
      SELECT user_id, island_id,
             CAST(MAX(e_us) - MIN(s_us) AS BIGINT) AS span_us
      FROM isl GROUP BY user_id, island_id
    )
    SELECT user_id,
           CAST(SUM(span_us) AS BIGINT) AS covered_us,
           CAST(COUNT(*) AS BIGINT) AS n_islands
    FROM spans GROUP BY user_id
    """,
)
def interval_coverage_union(spark, sf_dir):
    """Total union length of each user's event intervals ([ts, ts+10min)) —
    the sweep-line gaps-and-islands pattern: a running MAX(end) over the
    (start, event_id)-ordered frame flags island starts, a running SUM
    numbers the islands, and island spans (max end - min start) sum to the
    exact covered micros. Everything is integer micros; the window order
    carries a full tie-break so the sweep is deterministic row-for-row.
    At 100 TB this is one shuffle on user_id and two in-partition window
    passes — no self-join over intervals (the O(n^2) alternative)."""
    ev = load_events(spark, sf_dir)
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s_us"),
        (F.unix_micros("ts") + F.lit(600000000)).alias("e_us"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sw = iv.select(
        "user_id",
        "event_id",
        "s_us",
        "e_us",
        F.when(F.col("s_us") > F.max("e_us").over(w_prev), 1).otherwise(0).alias(
            "new_island"
        ),
    )
    # same full tie-break as the flag window (see oracle comment)
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = sw.select(
        "user_id",
        "s_us",
        "e_us",
        F.sum("new_island").over(w_run).alias("island_id"),
    )
    spans = isl.groupBy("user_id", "island_id").agg(
        (F.max("e_us") - F.min("s_us")).cast("long").alias("span_us")
    )
    return spans.groupBy("user_id").agg(
        F.sum("span_us").cast("long").alias("covered_us"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
    )


# ---------------------------------------------------------------------------
# Tukey-fence outliers on exact rank-selected quartiles, per return flag.
# ---------------------------------------------------------------------------
@register(
    "iqr_fences_outliers",
    """
    WITH c AS (
      SELECT l_returnflag AS flag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    r AS (
      SELECT flag, cents,
             ROW_NUMBER() OVER (PARTITION BY flag ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY flag) AS n
      FROM c
    ),
    q AS (
      SELECT flag, CAST(MAX(n) AS BIGINT) AS n,
             CAST(MAX(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS BIGINT) AS q1_cents,
             CAST(MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END) AS BIGINT) AS q3_cents
      FROM r GROUP BY flag
    )
    SELECT q.flag, q.n, q.q1_cents, q.q3_cents,
           CAST(SUM(CASE WHEN 2 * c.cents < 5 * q.q1_cents - 3 * q.q3_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_out_low,
           CAST(SUM(CASE WHEN 2 * c.cents > 5 * q.q3_cents - 3 * q.q1_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_out_high
    FROM c JOIN q ON c.flag = q.flag
    GROUP BY q.flag, q.n, q.q1_cents, q.q3_cents
    """,
)
def iqr_fences_outliers(spark, sf_dir):
    """Tukey outlier fences (1.5*IQR) per return flag with EXACT quartiles:
    q1/q3 are the ceil(n/4)-th and ceil(3n/4)-th order statistics (rank
    selection is tie-safe — the k-th value is unique even when ranks over
    duplicates are not), and the fences compare in integers via
    cross-multiplication (2c < 5q1 - 3q3). Plan: one window pass per flag
    for the quartiles (3-flag partitions), then the fence count joins the
    3-row quartile frame back broadcast — two scans, no float anywhere."""
    li = _t(spark, sf_dir, "lineitem")
    c = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("flag").orderBy("cents")
    wn = Window.partitionBy("flag")
    r = c.select(
        "flag",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    q = r.groupBy("flag").agg(
        F.max("n").cast("long").alias("n"),
        F.max(F.when(F.col("rn") == F.expr("(n + 3) div 4"), F.col("cents")))
        .cast("long").alias("q1_cents"),
        F.max(F.when(F.col("rn") == F.expr("(3 * n + 3) div 4"), F.col("cents")))
        .cast("long").alias("q3_cents"),
    )
    return (
        c.join(F.broadcast(q), "flag")
        .groupBy("flag", "n", "q1_cents", "q3_cents")
        .agg(
            F.sum(
                F.when(
                    2 * F.col("cents") < 5 * F.col("q1_cents") - 3 * F.col("q3_cents"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_out_low"),
            F.sum(
                F.when(
                    2 * F.col("cents") > 5 * F.col("q3_cents") - 3 * F.col("q1_cents"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_out_high"),
        )
    )
