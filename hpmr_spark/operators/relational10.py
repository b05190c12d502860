"""Relational batch 10: CDC keep-latest compaction, correlated scalar
subquery in SELECT, inline VALUES dimension join.

Reference parity: CDC compaction is the `overwrite` reducer
(src/reducer.h:12) with a deterministic arrival order — keep the row with
the greatest (ts, event_id); the reference's version is arrival-order-
dependent, ours pins the tie-break (SURVEY.md §2.2 determinism policy).
The inline VALUES table is the programmatic-ingest source
(async_set batches, src/dist_map.h:31) as a literal relation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t
from hpmr_spark.functions.littables import values_df


# ---------------------------------------------------------------------------
# CDC compaction: latest record per (user, event_type) changelog key.
# ---------------------------------------------------------------------------
@register(
    "cdc_latest_events",
    """
    WITH r AS (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_type, event_id AS latest_event_id, ts AS latest_ts
    FROM r WHERE rn = 1
    """,
)
def cdc_latest_events(spark, sf_dir):
    """Changelog compaction (keep-latest upsert): one grouped max over a
    (ts, event_id) struct — lexicographic struct ordering gives the latest
    row with a total tie-break, in a single shuffle with map-side partials.
    The row_number-window formulation (the oracle) shuffles the same but
    sorts whole partitions; the struct-max is the plan that scales (no
    sort, partial agg collapses each map task to ≤1 row per key)."""
    ev = _t(spark, sf_dir, "events")
    m = ev.groupBy("user_id", "event_type").agg(
        F.max(F.struct("ts", "event_id")).alias("m")
    )
    return m.select(
        "user_id",
        "event_type",
        F.col("m.event_id").alias("latest_event_id"),
        F.col("m.ts").alias("latest_ts"),
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery in the SELECT list.
# ---------------------------------------------------------------------------
_CORR_SCALAR_SQL = """
    SELECT o_orderkey,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
            WHERE l_orderkey = o_orderkey) AS n_lines
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-06-01'
"""


@register("correlated_scalar_select", _CORR_SCALAR_SQL)
def correlated_scalar_select(spark, sf_dir):
    """Correlated scalar subquery in the projection — Catalyst decorrelates
    to an aggregate + left outer join on orderkey (COUNT(*) of no rows
    becomes 0, not NULL; the rewrite preserves that). Same SQL text planned
    by both engines."""
    for t in ("orders", "lineitem"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_CORR_SCALAR_SQL)


# ---------------------------------------------------------------------------
# Inline VALUES dimension joined to facts (programmatic literal relation).
# ---------------------------------------------------------------------------
@register(
    "inline_dim_join",
    """
    WITH w(o_orderpriority, weight_ppm) AS (VALUES
      ('1-URGENT', 1500000), ('2-HIGH', 1250000), ('3-MEDIUM', 1000000),
      ('4-NOT SPECIFIED', 900000), ('5-LOW', 750000))
    SELECT w.o_orderpriority,
           CAST(SUM((CAST(ROUND(o_totalprice * 100) AS BIGINT) * weight_ppm) // 1000000)
                AS BIGINT) AS weighted_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o JOIN w ON o.o_orderpriority = w.o_orderpriority
    GROUP BY w.o_orderpriority
    """,
)
def inline_dim_join(spark, sf_dir):
    """A literal in-memory dimension (createDataFrame ≡ VALUES) broadcast
    onto the fact table — the programmatic-ingest source as a relation.
    Weighting is exact: per-row integer cents × ppm with truncating
    division (all positive), then BIGINT sum."""
    o = _t(spark, sf_dir, "orders")
    w = values_df(spark, 
        [
            ("1-URGENT", 1500000),
            ("2-HIGH", 1250000),
            ("3-MEDIUM", 1000000),
            ("4-NOT SPECIFIED", 900000),
            ("5-LOW", 750000),
        ],
        "o_orderpriority string, weight_ppm long",
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.withColumn("cents", cents)
        .join(F.broadcast(w), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.expr("(cents * weight_ppm) div 1000000")).alias("weighted_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Multiset intersection (INTERSECT ALL) — duplicate-preserving set op.
# ---------------------------------------------------------------------------
@register(
    "setops_intersect_all",
    """
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      INTERSECT ALL
      SELECT l_partkey FROM lineitem WHERE l_quantity >= 25
    ) GROUP BY l_partkey
    """,
)
def setops_intersect_all(spark, sf_dir):
    """intersectAll: multiset intersection keeps min(count_left, count_right)
    copies per key — Spark plans it as a count-compare aggregate, not a
    join; completes the exceptAll/intersect/union family."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "R").select("l_partkey")
    b = li.where(F.col("l_quantity") >= 25).select("l_partkey")
    return a.intersectAll(b).groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# explode_outer: row-preserving array expansion (empty → NULL row).
# ---------------------------------------------------------------------------
@register(
    "explode_outer_long_words",
    """
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, ' '), x -> len(x) > 9) AS ws
      FROM documents
    )
    SELECT doc_id, u.word FROM (
      SELECT doc_id, unnest(ws) AS word FROM w WHERE len(ws) > 0
      UNION ALL
      SELECT doc_id, CAST(NULL AS VARCHAR) AS word FROM w WHERE len(ws) = 0
    ) u
    """,
)
def explode_outer_long_words(spark, sf_dir):
    """explode_outer: documents with no long (>9 char) words survive as a
    NULL row instead of vanishing — the left-outer flavor of flatMap. Plain
    explode silently drops empty groups; for corpus accounting (every doc
    must appear downstream) the outer variant is the correct default."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda x: F.length(x) > 9)
    return docs.select(
        "doc_id", F.explode_outer(ws).alias("word")
    )
