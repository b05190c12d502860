"""Distributed-systems primitives batch (round 5): consistent-hash ring
assignment with the minimal-movement proof, and the KMV bottom-k merge
law — the sharding and sketch-mergeability mechanics a 1000-executor
deployment actually runs (partition routing, elastic reshard, two-level
distinct aggregation).

Disciplines (CLAUDE.md): the only hash is the committed cross-engine
hash60 (first 15 md5 hex chars as BIGINT), so ring positions, key
placements, and sketch contents are engine-identical — even the
"random-looking" structures hash-match. All assignment logic is exact
integer interval arithmetic.

Reference parity: the ring is the decentralized analog of the
reference's static `key % n_buckets` placement
(/root/reference/src/dist_map.h:147-210 routes by hash bucket); the KMV
merge law is the combine step of its two-phase sync
(/root/reference/src/bare_map.h:55-57) applied to a bottom-k state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.hashing import hash60, sql_hash60

# ---------------------------------------------------------------------------
# Consistent-hash ring: 8 shards × 32 vnodes, plus the 7-shard ring that
# proves minimal movement on shard removal.
# ---------------------------------------------------------------------------
_N_SHARDS = 8
_N_REPS = 32
_RING_MAX = (1 << 60) - 1

_VNODES_SQL = f"""
      SELECT CAST(i // {_N_REPS} AS BIGINT) AS shard,
             CAST({sql_hash60(
                 f"'ring:' || CAST(i // {_N_REPS} AS VARCHAR)"
                 f" || ':' || CAST(i % {_N_REPS} AS VARCHAR)"
             )} AS BIGINT) AS vh
      FROM range(0, {_N_SHARDS * _N_REPS}) t(i)
"""

# Interval form of "successor vnode clockwise": vnode v owns
# (prev_vh, vh]; the minimum vnode additionally owns the wrap arc
# (max_vh, RING_MAX].
def _ring_sql(name: str, shard_filter: str) -> str:
    return f"""
    {name}_ring AS (
      SELECT shard, vh, LAG(vh) OVER (ORDER BY vh) AS prev_vh
      FROM vnodes WHERE {shard_filter}
    ),
    {name}_iv AS (
      SELECT shard, COALESCE(prev_vh, -1) + 1 AS lo, vh AS hi
      FROM {name}_ring
      UNION ALL
      SELECT r.shard, b.mx + 1 AS lo, {_RING_MAX} AS hi
      FROM {name}_ring r,
           (SELECT MAX(vh) AS mx, MIN(vh) AS mn FROM {name}_ring) b
      WHERE r.vh = b.mn
    )"""


_RING_ORACLE = f"""
    WITH vnodes AS ({_VNODES_SQL}),
    {_ring_sql("r8", "TRUE").strip()},
    {_ring_sql("r7", f"shard < {_N_SHARDS - 1}").strip()},
    keys AS (
      SELECT c_custkey,
             CAST({sql_hash60("'chkey:' || CAST(c_custkey AS VARCHAR)")}
                  AS BIGINT) AS h
      FROM customer
    ),
    a8 AS (
      SELECT k.c_custkey, iv.shard AS s8
      FROM keys k JOIN r8_iv iv ON k.h BETWEEN iv.lo AND iv.hi
    ),
    a7 AS (
      SELECT k.c_custkey, iv.shard AS s7
      FROM keys k JOIN r7_iv iv ON k.h BETWEEN iv.lo AND iv.hi
    )
    SELECT s8 AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_keys_8,
           CAST(SUM(CASE WHEN s7 = s8 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_stayed,
           CAST(SUM(CASE WHEN s7 <> s8 AND s8 <> {_N_SHARDS - 1}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_bug
    FROM a8 JOIN a7 USING (c_custkey)
    GROUP BY s8
"""


@register("consistent_hash_ring", _RING_ORACLE)
def consistent_hash_ring(spark, sf_dir):
    """Consistent-hash ring placement (8 shards × 32 vnodes on the
    committed hash60 ring) with the minimal-movement PROOF: every key is
    assigned to its clockwise-successor vnode in both the 8-shard and
    7-shard (shard 7 removed) rings, and the report counts, per 8-ring
    shard, how many keys stay put under the removal. The consistency
    property — removal moves ONLY the removed shard's keys — shows up as
    n_moved_bug = 0 on every row (keys on shards 0-6 never move; the
    oracle pins it). Successor lookup is rewritten as an INTERVAL table
    ((prev_vh, vh] per vnode + the wrap arc) built from the 256-row vnode
    frame with bounded self-joins, then ONE broadcast band join per ring
    — each key probes ≤256 intervals and lands in exactly one, so the
    fact-side output is n_keys rows with zero blowup; this is the
    scale-correct shape of partition routing at 10¹⁰ keys. No windows on
    the Spark side (the oracle's LAG runs on 256 rows in DuckDB)."""
    vn = (
        spark.range(0, _N_SHARDS * _N_REPS)
        .select(
            (F.col("id") / _N_REPS).cast("long").alias("shard"),
            hash60(
                F.concat(
                    F.lit("ring:"),
                    (F.col("id") / _N_REPS).cast("long").cast("string"),
                    F.lit(":"),
                    (F.col("id") % _N_REPS).cast("string"),
                )
            ).alias("vh"),
        )
    )

    def intervals(vnodes):
        """(prev_vh, vh] intervals + wrap arc, via bounded self-joins on
        the ≤256-row vnode frame (no windows)."""
        a = vnodes.select(F.col("shard").alias("s"), F.col("vh").alias("v"))
        b = vnodes.select(F.col("vh").alias("v2"))
        prev = (
            a.join(F.broadcast(b), F.col("v2") < F.col("v"), "left")
            .groupBy("s", "v")
            .agg(F.max("v2").alias("prev_vh"))
        )
        main = prev.select(
            F.col("s").alias("shard"),
            (F.coalesce(F.col("prev_vh"), F.lit(-1)) + 1).alias("lo"),
            F.col("v").alias("hi"),
        )
        bounds = vnodes.agg(F.max("vh").alias("mx"), F.min("vh").alias("mn"))
        wrap = (
            vnodes.crossJoin(F.broadcast(bounds))
            .where(F.col("vh") == F.col("mn"))
            .select(
                "shard",
                (F.col("mx") + 1).alias("lo"),
                F.lit(_RING_MAX).alias("hi"),
            )
        )
        return main.unionByName(wrap)

    iv8 = intervals(vn)
    iv7 = intervals(vn.where(F.col("shard") < _N_SHARDS - 1))
    keys = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        hash60(
            F.concat(F.lit("chkey:"), F.col("c_custkey").cast("string"))
        ).alias("h"),
    )
    a8 = keys.join(
        F.broadcast(iv8),
        (F.col("h") >= F.col("lo")) & (F.col("h") <= F.col("hi")),
    ).select("c_custkey", F.col("shard").alias("s8"))
    a7 = keys.join(
        F.broadcast(iv7),
        (F.col("h") >= F.col("lo")) & (F.col("h") <= F.col("hi")),
    ).select(F.col("c_custkey").alias("ck7"), F.col("shard").alias("s7"))
    j = a8.join(a7, a8["c_custkey"] == a7["ck7"])
    return j.groupBy(F.col("s8").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_keys_8"),
        F.sum(F.when(F.col("s7") == F.col("s8"), 1).otherwise(0))
        .cast("long")
        .alias("n_stayed"),
        F.sum(
            F.when(
                (F.col("s7") != F.col("s8"))
                & (F.col("s8") != _N_SHARDS - 1),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_moved_bug"),
    )


# ---------------------------------------------------------------------------
# KMV bottom-k merge law (two-level distinct aggregation).
# ---------------------------------------------------------------------------
_KMV_K = 256

_KMV_MERGE_ORACLE = f"""
    WITH h AS (
      SELECT DISTINCT
        CAST({sql_hash60("'kmv:' || CAST(o_custkey AS VARCHAR)")} AS BIGINT)
          AS hv,
        o_custkey % 2 AS part
      FROM orders
    ),
    full_k AS (
      SELECT hv FROM (SELECT DISTINCT hv FROM h) ORDER BY hv LIMIT {_KMV_K}
    ),
    p0 AS (SELECT hv FROM h WHERE part = 0 ORDER BY hv LIMIT {_KMV_K}),
    p1 AS (SELECT hv FROM h WHERE part = 1 ORDER BY hv LIMIT {_KMV_K}),
    merged AS (
      SELECT hv FROM (
        SELECT DISTINCT hv FROM (SELECT hv FROM p0 UNION ALL SELECT hv FROM p1)
      ) ORDER BY hv LIMIT {_KMV_K}
    ),
    sf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_full,
                  CAST(MAX(hv) AS BIGINT) AS kth_full FROM full_k),
    sm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_merged,
                  CAST(MAX(hv) AS BIGINT) AS kth_merged FROM merged),
    xo AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_diff FROM (
        SELECT hv FROM full_k EXCEPT SELECT hv FROM merged
        UNION ALL
        (SELECT hv FROM merged EXCEPT SELECT hv FROM full_k)
      )
    )
    SELECT n_full, n_merged, kth_full, kth_merged, n_diff,
           CAST(kth_full = kth_merged AND n_diff = 0 AS BOOLEAN) AS merge_law
    FROM sf, sm, xo
"""


@register("kmv_merge_property", _KMV_MERGE_ORACLE)
def kmv_merge_property(spark, sf_dir):
    """KMV bottom-k MERGE LAW, verified exactly: bottom-k of (bottom-k of
    partition 0 ∪ bottom-k of partition 1) equals bottom-k of the full
    distinct-hash set — the algebraic property that makes the KMV distinct
    sketch a two-level (map-side partial / reduce-side final) aggregate, a
    DistMap combine-on-insert state. Both sketch contents are compared
    element-wise (symmetric difference count) and by their kth values;
    with the committed hash60 the law is hash-checkable, not just
    statistically plausible. Each bottom-k is sort+limit =
    TakeOrderedAndProject (per-partition partial top-k); the comparison
    frames are ≤k rows."""
    o = _t(spark, sf_dir, "orders")
    h = o.select(
        hash60(F.concat(F.lit("kmv:"), F.col("o_custkey").cast("string"))).alias(
            "hv"
        ),
        (F.col("o_custkey") % 2).alias("part"),
    ).distinct()
    full_k = h.select("hv").distinct().orderBy("hv").limit(_KMV_K)
    p0 = h.where(F.col("part") == 0).select("hv").orderBy("hv").limit(_KMV_K)
    p1 = h.where(F.col("part") == 1).select("hv").orderBy("hv").limit(_KMV_K)
    merged = p0.unionAll(p1).distinct().orderBy("hv").limit(_KMV_K)
    sf = full_k.agg(
        F.count(F.lit(1)).cast("long").alias("n_full"),
        F.max("hv").cast("long").alias("kth_full"),
    )
    sm = merged.agg(
        F.count(F.lit(1)).cast("long").alias("n_merged"),
        F.max("hv").cast("long").alias("kth_merged"),
    )
    xo = (
        full_k.exceptAll(merged)
        .unionAll(merged.exceptAll(full_k))
        .agg(F.count(F.lit(1)).cast("long").alias("n_diff"))
    )
    return (
        sf.crossJoin(F.broadcast(sm))
        .crossJoin(F.broadcast(xo))
        .select(
            "n_full",
            "n_merged",
            "kth_full",
            "kth_merged",
            "n_diff",
            ((F.col("kth_full") == F.col("kth_merged")) & (F.col("n_diff") == 0)).alias(
                "merge_law"
            ),
        )
    )
