"""Relational batch 11: recursive CTE (Spark 4.1 WITH RECURSIVE), null-aware
NOT IN anti join, TRY_* error-safe functions, map-typed higher-order
functions, bounded-error sketch gating, and a BPE-ish token estimator.

Reference parity: none of these exist in the reference (its surface is the
keyed-shuffle kernel, /root/reference/src/hpmr.h:1-10); they extend the
engine's SQL surface the way SURVEY.md §2.3 prescribes for extension work —
every operator declarative, every result oracle-gated.

Sketch-gating pattern: approximate operators (HLL distinct, approx
percentile) cannot be value-compared across engines, but their ERROR BOUND
can — compute exact and approximate side by side in one Spark plan, emit
the exact value plus an integer-arithmetic bounded-error boolean, and let
the DuckDB oracle assert the same exact value with a constant TRUE. This
turns formerly rows-only sketch queries into hash-checked rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t


# ---------------------------------------------------------------------------
# Recursive CTE: month series 1995-01 .. 2001-08 (the data's full span) with
# per-month order counts/revenue, gap months kept at zero.
# ---------------------------------------------------------------------------
_REC_MONTHS_SPARK = """
    WITH RECURSIVE months(m) AS (
      SELECT DATE '1995-01-01'
      UNION ALL
      SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
      WHERE m < DATE '2001-08-01'
    )
    SELECT CAST(m AS STRING) AS month_start,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT)
             AS revenue_cents
    FROM months LEFT JOIN orders
      ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
    GROUP BY m
"""


@register(
    "recursive_month_series",
    """
    WITH RECURSIVE months(m) AS (
      SELECT DATE '1995-01-01'
      UNION ALL
      SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
      WHERE m < DATE '2001-08-01'
    )
    SELECT CAST(m AS VARCHAR) AS month_start,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT)
             AS revenue_cents
    FROM months LEFT JOIN orders
      ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
    GROUP BY m
    """,
)
def recursive_month_series(spark, sf_dir):
    """Spark 4.1 recursive CTE (UNION ALL linear recursion — Spark rejects
    UNION-distinct recursion, so the series must be acyclic by construction):
    a month spine densifying order revenue, gap months kept as zero rows.
    Scale note: the recursion generates the 80-row spine driver-side in 80
    cheap iterative steps; the fact scan and aggregation stay one
    distributed pass — recursion is never on the data path."""
    for t in ("orders",):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_REC_MONTHS_SPARK)


# ---------------------------------------------------------------------------
# Null-aware NOT IN anti join.
# ---------------------------------------------------------------------------
@register(
    "notin_null_aware_customers",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def notin_null_aware_customers(spark, sf_dir):
    """NOT IN with a nullable subquery column — Spark plans the null-aware
    anti join (a plain anti join would be WRONG if the subquery ever yields
    NULL: ANSI says the whole NOT IN becomes UNKNOWN). The fact side streams
    once against the broadcast subquery result."""
    for t in ("customer", "orders"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        """
    )


# ---------------------------------------------------------------------------
# TRY_* error-safe scalar functions.
# ---------------------------------------------------------------------------
@register(
    "try_functions_surface",
    """
    SELECT p_size,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(CASE WHEN p_size > 25 THEN NULL ELSE 1 END) AS BIGINT)
             AS n_castable,
           CAST(SUM(CASE WHEN p_size = 10 THEN NULL
                         ELSE CAST(FLOOR(CAST(ROUND(p_retailprice * 100) AS BIGINT)
                                         / (p_size - 10)) AS BIGINT) END) AS BIGINT)
             AS sum_price_per_excess
    FROM part
    GROUP BY p_size
    """,
)
def try_functions_surface(spark, sf_dir):
    """Error-safe scalars: TRY_CAST returns NULL on malformed input and
    TRY_DIVIDE on /0, instead of failing the job under ANSI mode — the
    at-scale answer to dirty rows (one bad record must not kill a 100 TB
    scan). The oracle expresses the same semantics with CASE guards.
    Division stays deterministic cross-engine: FLOOR over an exact-integer
    double quotient (both engines IEEE-754)."""
    p = _t(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    # digit-string with a poison suffix for sizes > 25 → TRY_CAST null
    shaky = F.concat(
        F.col("p_partkey").cast("string"),
        F.when(F.col("p_size") > 25, F.lit("x")).otherwise(F.lit("")),
    )
    return (
        p.withColumn("cents", cents)
        .withColumn("shaky", shaky)
        .groupBy("p_size")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.count(F.expr("TRY_CAST(shaky AS BIGINT)")).alias("n_castable"),
            F.sum(
                F.floor(F.expr("TRY_DIVIDE(cents, CAST(p_size - 10 AS BIGINT))")).cast(
                    "long"
                )
            ).alias("sum_price_per_excess"),
        )
    )


# ---------------------------------------------------------------------------
# Map-typed higher-order functions.
# ---------------------------------------------------------------------------
@register(
    "map_hof_status_counts",
    """
    WITH s AS (
      SELECT o_orderpriority AS prio, o_orderstatus AS st, COUNT(*) AS c
      FROM orders GROUP BY 1, 2
    )
    SELECT prio,
           -- COALESCE: when FILTER removes every element DuckDB's list() is
           -- NULL, but Spark's map_filter yields an EMPTY map → '' — the
           -- empty-map case only materializes at small SFs (sf0.001)
           COALESCE(array_to_string(
             list_sort(list(st || '=' || CAST(c * 2 AS VARCHAR))
                       FILTER (WHERE c > 100)),
             ','), '') AS busy_status_map
    FROM s GROUP BY prio
    """,
)
def map_hof_status_counts(spark, sf_dir):
    """Map-typed column surface: build a status→count map per priority
    (map_from_entries), prune small entries (map_filter), scale values
    (transform_values), then serialize to a deterministic sorted k=v string
    so the result is engine-comparable (DuckDB models the same pipeline
    over a struct list — maps have no canonical order in either engine).
    All map ops are JVM HOF expressions: one aggregation, no UDFs."""
    o = _t(spark, sf_dir, "orders")
    per = o.groupBy(
        F.col("o_orderpriority").alias("prio"), F.col("o_orderstatus").alias("st")
    ).agg(F.count(F.lit(1)).alias("c"))
    m = per.groupBy("prio").agg(
        F.map_from_entries(F.collect_list(F.struct("st", "c"))).alias("m")
    )
    busy = F.transform_values(
        F.map_filter(F.col("m"), lambda k, v: v > 100), lambda k, v: v * 2
    )
    entry_strings = F.transform(
        F.map_entries(busy),
        lambda e: F.concat(e["key"], F.lit("="), e["value"].cast("string")),
    )
    return m.select(
        "prio",
        F.array_join(F.sort_array(entry_strings), ",").alias("busy_status_map"),
    )


# ---------------------------------------------------------------------------
# Bounded-error gating for sketches (HLL + approx percentile).
# ---------------------------------------------------------------------------
@register(
    "sketch_bounded_checks",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS hll_within_15pct,
           CAST(FLOOR(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE)) AS BIGINT)
             AS median_qty_floor,
           TRUE AS approx_median_within_1
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def sketch_bounded_checks(spark, sf_dir):
    """Sketches gated by their error bounds: HLL approx distinct must land
    within 15% of exact (3× the default 5% rsd — integer cross-multiplied,
    no float threshold), approx_percentile(0.5) within ±1 of the exact
    continuous median (l_quantity is integer-stepped). The oracle pins the
    exact values and asserts the booleans — making the sketch behavior
    itself a hash-checked contract instead of a rows-only row.

    Plan note: the distinct aggregates and the percentile aggregates run as
    two subtrees joined on the 3-row group key. Mixing them in ONE agg makes
    Catalyst expand every row for the distinct rewrite and push each
    expanded row through the percentile object buffers — measured 15 s vs
    2 s at sf0.01 for the same answer."""
    li = _t(spark, sf_dir, "lineitem")
    d = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey").alias("_hll"),
    )
    p = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("_exact_med"),
        F.expr("approx_percentile(l_quantity, 0.5)").alias("_approx_med"),
    )
    g = d.join(p, "l_returnflag")
    return g.select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("_hll") - F.col("exact_orders")) * 100
            <= F.col("exact_orders") * 15
        ).alias("hll_within_15pct"),
        F.floor(F.col("_exact_med")).cast("long").alias("median_qty_floor"),
        (F.abs(F.col("_approx_med") - F.col("_exact_med")) <= F.lit(1.0)).alias(
            "approx_median_within_1"
        ),
    )


# ---------------------------------------------------------------------------
# BPE-ish token estimation (LLM-pipeline token counting beyond whitespace).
# ---------------------------------------------------------------------------
_BPE_RE = "[a-z]+|[A-Z][a-z]*|[0-9]{1,3}|[^A-Za-z0-9 ]"


@register(
    "text_bpe_token_estimate",
    f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '{_BPE_RE}'))) AS BIGINT)
             AS est_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[^ ]+'))) AS BIGINT)
             AS ws_tokens
    FROM documents
    GROUP BY lang
    """,
)
def text_bpe_token_estimate(spark, sf_dir):
    """Subword-aware token estimate: a BPE-style pre-tokenizer regex
    (lowercase runs, capitalized words, ≤3-digit number chunks, single
    punctuation) against the whitespace count — the standard first-order
    LLM corpus costing signal. Pure JVM regexp_extract_all, scan-speed;
    identical RE2-compatible pattern on both engines."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0)))).alias(
            "est_tokens"
        ),
        F.sum(F.size(F.regexp_extract_all("text", F.lit("[^ ]+"), F.lit(0)))).alias(
            "ws_tokens"
        ),
    )
