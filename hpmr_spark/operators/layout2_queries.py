"""Physical data-layout batch 2 (round 4): Z-order (Morton) clustering
keys — the lakehouse data-clustering primitive (Delta Z-ORDER / Iceberg
sort orders) — and the hot-key-isolated two-path join, the skew strategy
that complements salting (operators/skew.py) by routing the heavy keys
through a broadcast path instead of splitting them.

Cross-engine: the Morton interleave is pure integer bit algebra (Spark
shiftleft/shiftright functions ≡ DuckDB << >> operators — different
surface syntax, identical semantics on BIGINT); everything else is exact
keyed aggregation.

Reference parity: extends the engine surface beyond the reference's
kv kernel (/root/reference/src/hpmr.h:1-10) along the analytics axis
the brief makes first-class; every aggregation follows the DistMap
combine-on-insert ≡ map-side partial agg mapping
(/root/reference/src/bare_map.h:55-57).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register

# 8-bit × 8-bit Morton interleave, generated once as expression text for
# each engine (x in even bit positions, y in odd).
_N_BITS = 8


def _morton_spark(x: str, y: str) -> str:
    terms = []
    for i in range(_N_BITS):
        terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
    return " + ".join(terms)


def _morton_duck(x: str, y: str) -> str:
    terms = []
    for i in range(_N_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "zorder_clustering_key",
    f"""
    WITH d AS (
      SELECT c_custkey,
             CAST(c_nationkey AS BIGINT) AS x,
             CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) // 5000 AS BIGINT)
               & 255 AS y
      FROM customer
    ),
    z AS (
      SELECT c_custkey, x, y,
             CAST({_morton_duck("x", "y")} AS BIGINT) AS zorder
      FROM d
    ),
    fileb AS (
      SELECT zorder // 1024 AS zfile,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT x) AS BIGINT) AS distinct_nations,
             CAST(MAX(x) - MIN(x) AS BIGINT) AS nation_span,
             CAST(MAX(y) - MIN(y) AS BIGINT) AS bal_span
      FROM z GROUP BY zorder // 1024
    )
    SELECT CAST(zfile AS BIGINT) AS zfile, n_rows, distinct_nations,
           nation_span, bal_span
    FROM fileb ORDER BY zfile
    """,
)
def zorder_clustering_key(spark, sf_dir):
    """Z-order (Morton) clustering of customers on (nation,
    balance-bucket): interleave the two dimensions' bits into one sort key
    and report, per simulated 1024-key file, how LOCAL both dimensions
    stay (distinct values and span per file) — the property that lets a
    zone-map skip files for predicates on EITHER column, which a
    single-column sort gives only one of. The interleave is exact integer
    bit algebra (Spark shiftleft/shiftright ≡ DuckDB <</>> on BIGINT —
    committed identical semantics); the y bucket is TRUNCATING integer
    division of cents (Spark `div` ≡ DuckDB `//`, identical on both
    engines including negative c_acctbal — negatives near zero truncate
    into bucket 0, not true floor; ADVICE r4); spans are exact integers,
    so the whole layout report hash-matches. At 100 TB this key is what you
    `repartitionByRange + sortWithinPartitions` the table by before a
    write; here the per-file stats ARE the zone map."""
    c = _t(spark, sf_dir, "customer")
    d = c.select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("x"),
        F.expr(
            "CAST(ROUND(c_acctbal * 100) AS BIGINT) div 5000 & 255"
        ).cast("long").alias("y"),
    )
    z = d.select(
        "c_custkey",
        "x",
        "y",
        F.expr(f"CAST({_morton_spark('x', 'y')} AS BIGINT)").alias("zorder"),
    )
    return (
        z.groupBy(F.expr("zorder div 1024").alias("zfile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("x").cast("long").alias("distinct_nations"),
            (F.max("x") - F.min("x")).cast("long").alias("nation_span"),
            (F.max("y") - F.min("y")).cast("long").alias("bal_span"),
        )
        .select(
            F.col("zfile").cast("long").alias("zfile"),
            "n_rows",
            "distinct_nations",
            "nation_span",
            "bal_span",
        )
    )


# ---------------------------------------------------------------------------
# Hot-key-isolated two-path join (the broadcast-isolation skew strategy).
# ---------------------------------------------------------------------------
_HOT_THRESHOLD = 15  # orders per customer marking a "hot" key: non-vacuous
# at BOTH verification SFs (124 hot keys at sf0.01, 14 at sf0.001 — the
# de-vacuized-oracle discipline from dedup_cross_source_matrix)


@register(
    "hotkey_isolated_join",
    f"""
    WITH freq AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    ),
    hot AS (SELECT o_custkey FROM freq WHERE n_orders >= {_HOT_THRESHOLD}),
    j AS (
      SELECT o.o_custkey, c.c_mktsegment,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN hot.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS is_hot
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      LEFT JOIN hot ON hot.o_custkey = o.o_custkey
    )
    SELECT c_mktsegment,
           CAST(SUM(is_hot) AS BIGINT) AS hot_orders,
           CAST(SUM(1 - is_hot) AS BIGINT) AS cold_orders,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM j GROUP BY c_mktsegment
    """,
)
def hotkey_isolated_join(spark, sf_dir):
    """The hot-key-isolation skew strategy, end to end: keys above a
    frequency threshold are split OUT of the shuffle join and processed
    on a broadcast path (their dimension rows broadcast against the
    un-shuffled fact stream), the long-tail keys take the normal shuffle
    join, and the two paths union before the final rollup — the
    complement of salting (operators/skew.py splits a hot key's rows;
    isolation removes the key from the exchange entirely, the right
    answer when the dim side of the hot keys is tiny). The oracle
    computes the same report with a plain join + hot flag, proving the
    two-path physical rewrite ≡ the single declarative join."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    freq = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    hot_keys = freq.where(F.col("n_orders") >= _HOT_THRESHOLD).select("o_custkey")
    # broadcast path: hot keys' dim rows (tiny by construction) broadcast
    # against the filtered fact stream — no exchange of the hot fact rows
    hot_dim = c.join(F.broadcast(hot_keys), "o_custkey")
    hot_fact = o.join(F.broadcast(hot_keys), "o_custkey", "left_semi")
    hot_path = hot_fact.join(F.broadcast(hot_dim), "o_custkey").select(
        "c_mktsegment", "cents", F.lit(1).alias("is_hot")
    )
    # shuffle path: the long tail joins normally (anti-join removes hot)
    cold_fact = o.join(F.broadcast(hot_keys), "o_custkey", "left_anti")
    cold_path = cold_fact.join(c, "o_custkey").select(
        "c_mktsegment", "cents", F.lit(0).alias("is_hot")
    )
    return (
        hot_path.unionAll(cold_path)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("is_hot").cast("long").alias("hot_orders"),
            F.sum(F.lit(1) - F.col("is_hot")).cast("long").alias("cold_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Hilbert-curve clustering key (the locality upgrade over Morton).
# ---------------------------------------------------------------------------
_H_ORDER = 8  # 256 × 256 grid


def _hilbert_step_sql(s: int, prev: str, keep: str) -> str:
    """One xy2d step at scale s over CTE/subquery `prev`, carrying `keep`
    columns. Pure integer arithmetic — (3·rx) XOR ry is rewritten as
    3·rx + ry − 2·rx·ry (exact for rx,ry ∈ {0,1}), so the step text is
    IDENTICAL on both engines (no engine-specific xor syntax)."""
    return f"""
      SELECT {keep},
             d + {s * s} * (3 * rx + ry - 2 * rx * ry) AS d,
             CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s - 1} - y
                                         ELSE y END)
                  ELSE x END AS x,
             CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s - 1} - x
                                         ELSE x END)
                  ELSE y END AS y
      FROM (
        SELECT {keep}, x, y, d,
               CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END AS rx,
               CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END AS ry
        FROM {prev}
      )
    """


def _hilbert_oracle() -> str:
    steps = []
    prev = "h0"
    for i, s in enumerate([1 << (_H_ORDER - 1 - j) for j in range(_H_ORDER)]):
        name = f"h{i + 1}"
        steps.append(
            f"{name} AS "
            f"({_hilbert_step_sql(s, prev, 'c_custkey, nation, bal')})"
        )
        prev = name
    return f"""
    WITH h0 AS (
      SELECT c_custkey,
             CAST(c_nationkey AS BIGINT) AS nation,
             CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) // 5000 AS BIGINT)
               & 255 AS bal,
             CAST(c_nationkey AS BIGINT) AS x,
             CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) // 5000 AS BIGINT)
               & 255 AS y,
             CAST(0 AS BIGINT) AS d
      FROM customer
    ),
    {", ".join(steps)},
    z AS (SELECT c_custkey, nation, bal, d AS hkey FROM {prev})
    SELECT CAST(hkey // 1024 AS BIGINT) AS hfile,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT nation) AS BIGINT) AS distinct_nations,
           CAST(MAX(nation) - MIN(nation) AS BIGINT) AS nation_span,
           CAST(MAX(bal) - MIN(bal) AS BIGINT) AS bal_span
    FROM z GROUP BY 1
    """


@register("hilbert_clustering_key", _hilbert_oracle())
def hilbert_clustering_key(spark, sf_dir):
    """Hilbert-curve clustering of customers on (nation, balance-bucket)
    — the locality upgrade over zorder_clustering_key: the Hilbert curve
    has no Morton "seams" (consecutive keys are always grid-adjacent), so
    per-file dimension spans are tighter and zone maps skip more. The
    xy2d transform is 8 unrolled scale steps of pure integer arithmetic
    — the quadrant term (3·rx) XOR ry is rewritten 3·rx + ry − 2·rx·ry so
    the step text is engine-identical with no bitwise-xor syntax
    differences — applied as chained narrow projections (zero shuffles
    until the final per-file aggregation; at 100 TB this key feeds
    repartitionByRange + sortWithinPartitions exactly like the Morton
    one). Output mirrors the zorder report for side-by-side comparison of
    per-1024-key-file locality."""
    c = _t(spark, sf_dir, "customer")
    df = c.select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("nation"),
        F.expr(
            "CAST(ROUND(c_acctbal * 100) AS BIGINT) div 5000 & 255"
        ).cast("long").alias("bal"),
        F.col("c_nationkey").cast("long").alias("x"),
        F.expr(
            "CAST(ROUND(c_acctbal * 100) AS BIGINT) div 5000 & 255"
        ).cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )
    for j in range(_H_ORDER):
        s = 1 << (_H_ORDER - 1 - j)
        df = df.select(
            "c_custkey",
            "nation",
            "bal",
            "x",
            "y",
            "d",
            F.expr(f"CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END").alias("rx"),
            F.expr(f"CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END").alias("ry"),
        ).select(
            "c_custkey",
            "nation",
            "bal",
            F.expr(f"d + {s * s} * (3 * rx + ry - 2 * rx * ry)").alias("d"),
            F.expr(
                f"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s - 1} - y"
                " ELSE y END) ELSE x END"
            ).alias("x"),
            F.expr(
                f"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s - 1} - x"
                " ELSE x END) ELSE y END"
            ).alias("y"),
        )
    z = df.select("c_custkey", "nation", "bal", F.col("d").alias("hkey"))
    return (
        z.groupBy(F.expr("hkey div 1024").alias("hfile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("nation").cast("long").alias("distinct_nations"),
            (F.max("nation") - F.min("nation")).cast("long").alias("nation_span"),
            (F.max("bal") - F.min("bal")).cast("long").alias("bal_span"),
        )
        .select(
            F.col("hfile").cast("long").alias("hfile"),
            "n_rows",
            "distinct_nations",
            "nation_span",
            "bal_span",
        )
    )
