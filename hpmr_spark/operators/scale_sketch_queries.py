"""Scale-pattern batch: Misra-Gries two-pass heavy hitters, deterministic
Bloom-filter semi-join pruning, and bit_or day-bitmap activity indexes.

These are the three classic "don't shuffle the universe" shapes for 100 TB:
- Heavy hitters: a bounded per-partition sketch (mergeable Misra-Gries,
  Agarwal et al. 2012) finds a tiny candidate superset; only candidates are
  exactly recounted (broadcast semi-join), so the full-vocabulary shuffle
  never happens. The reference analog is the combine-on-insert map
  (/root/reference/src/bare_map.h:55-57) capped at a fixed capacity.
- Bloom pruning: the build side collapses to a broadcast bitset; the probe
  side filters locally before any join shuffle (Spark's runtime bloom
  filter join, expressed explicitly so the false-positive arithmetic is
  oracle-checkable — the SAME committed md5-derived bit positions are
  computed in DuckDB SQL, so even the false positives match exactly).
- Day bitmaps: per-user activity packed into one BIGINT via bit_or — a
  perfectly map-side-combinable aggregate whose state is 8 bytes per key
  regardless of event volume; first/last day come from the verified exact
  ⌊log₂⌋ identity length(bin(x))-1 (cross-engine, see CLAUDE.md).

Determinism: MG candidate sets depend on arrival order, but the OUTPUT is
the exact recount filtered by the exact global threshold (freq*k > n via
integer cross-multiplication) — the sketch only has to be a superset, which
the mergeable-summary guarantee provides for any partitioning (capacity 400
vs threshold n/200 leaves a 2x safety margin). Bloom positions and bitmaps
are pure functions of the data.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.hashing import sql_hash60, hash60

_MG_CAPACITY = 400  # > k=200 threshold denominator -> guaranteed superset
_HH_K = 200  # heavy hitter iff freq * 200 > n_total


# ---------------------------------------------------------------------------
# Two-pass heavy hitters over corpus tokens.
# ---------------------------------------------------------------------------
@register(
    "heavy_hitters_mg",
    f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM toks),
    c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w FROM toks GROUP BY w)
    SELECT w, n_w, n_total,
           CAST(n_w * 1000000 // n_total AS BIGINT) AS share_ppm
    FROM c CROSS JOIN tot
    WHERE n_w * {_HH_K} > n_total
    """,
)
def heavy_hitters_mg(spark, sf_dir):
    """Words with frequency > n/200, found with the scale-correct two-pass
    plan: (1) per-partition mergeable Misra-Gries sketches (capacity 400,
    pure Python dict over Arrow batches — bounded memory, no shuffle) emit a
    candidate superset; (2) only candidates are exactly recounted via a
    broadcast semi-join, then gated by the exact integer threshold
    freq*200 > n_total. The oracle is the brute-force GROUP BY HAVING —
    proving the sketch pass loses nothing. At 100 TB pass 2 touches a
    candidate set bounded by partitions*400 keys, not the vocabulary."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("w"))

    cap = _MG_CAPACITY

    def mg_sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[str, int] = {}
        for pdf in batches:
            for w, c in pdf["w"].value_counts().items():
                state[w] = state.get(w, 0) + int(c)
            if len(state) > cap:
                # mergeable-MG compress: subtract the (cap+1)-th largest
                # count from everyone, drop the non-positive
                cut = sorted(state.values(), reverse=True)[cap]
                state = {w: c - cut for w, c in state.items() if c > cut}
        yield pd.DataFrame({"w": list(state.keys())})

    cand = toks.mapInPandas(mg_sketch, "w string").distinct()
    tot = docs.agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_total")
    )
    counts = (
        toks.join(F.broadcast(cand), "w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n_w"))
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .where(F.col("n_w") * _HH_K > F.col("n_total"))
        .select(
            "w",
            "n_w",
            "n_total",
            F.expr("n_w * 1000000 div n_total").cast("long").alias("share_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic Bloom-filter semi-join pruning (orders probed against a
# small customer build side), false positives exactly accounted.
# ---------------------------------------------------------------------------
_BLOOM_M = 8192
_BLOOM_J = 3


def _bloom_pos_sql(key_expr: str, j: int) -> str:
    inner = "'bl' || {j} || ':' || CAST({k} AS VARCHAR)".format(j=j, k=key_expr)
    return f"({sql_hash60(inner)} % {_BLOOM_M})"


def _bloom_pos_col(key_col, j: int):
    return hash60(
        F.concat(F.lit(f"bl{j}:"), key_col.cast("string"))
    ) % F.lit(_BLOOM_M)


@register(
    "bloom_semi_prune",
    f"""
    WITH build AS (
      SELECT c_custkey FROM customer WHERE c_acctbal < -900
    ),
    bits AS (
      SELECT DISTINCT p FROM (
        SELECT {_bloom_pos_sql('c_custkey', 0)} AS p FROM build
        UNION ALL SELECT {_bloom_pos_sql('c_custkey', 1)} FROM build
        UNION ALL SELECT {_bloom_pos_sql('c_custkey', 2)} FROM build
      )
    ),
    probe AS (
      SELECT o_orderkey, o_custkey,
             ({_bloom_pos_sql('o_custkey', 0)} IN (SELECT p FROM bits)
              AND {_bloom_pos_sql('o_custkey', 1)} IN (SELECT p FROM bits)
              AND {_bloom_pos_sql('o_custkey', 2)} IN (SELECT p FROM bits))
               AS bloom_pass,
             o_custkey IN (SELECT c_custkey FROM build) AS true_match
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probe,
           CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
           CAST(SUM(CASE WHEN true_match THEN 1 ELSE 0 END) AS BIGINT) AS n_true_match,
           CAST(SUM(CASE WHEN bloom_pass AND NOT true_match THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos
    FROM probe
    """,
)
def bloom_semi_prune(spark, sf_dir):
    """Bloom-filter join pruning made explicit and exactly checkable: the
    small build side (10 deep-debt customers) becomes an 8192-bit / 3-hash
    Bloom bitset, collapsed to ONE broadcast row (collect_set of set bit
    positions); every order row tests its 3 committed md5-derived positions
    locally — no shuffle touches the probe side. Because both engines
    compute the identical bit positions, even the false-positive count is
    deterministic and oracle-matched. This is Spark's runtime bloom join
    (AQE) written out so its pruning arithmetic is auditable; at 100 TB the
    probe scan never shuffles and the build bitset is KB-sized."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    build = cust.where(F.col("c_acctbal") < -900).select("c_custkey")
    pos = build.select(
        F.explode(
            F.array(*[_bloom_pos_col(F.col("c_custkey"), j) for j in range(_BLOOM_J)])
        ).alias("p")
    )
    bits = pos.agg(F.collect_set("p").alias("bits"))
    keys = build.agg(F.collect_set("c_custkey").alias("keys"))
    probe = (
        orders.crossJoin(F.broadcast(bits))
        .crossJoin(F.broadcast(keys))
        .select(
            *[
                F.array_contains("bits", _bloom_pos_col(F.col("o_custkey"), j)).alias(
                    f"b{j}"
                )
                for j in range(_BLOOM_J)
            ],
            F.array_contains("keys", F.col("o_custkey")).alias("true_match"),
        )
        .select(
            (F.col("b0") & F.col("b1") & F.col("b2")).alias("bloom_pass"),
            "true_match",
        )
    )
    return probe.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).cast("long").alias("n_bloom_pass"),
        F.sum(F.when(F.col("true_match"), 1).otherwise(0)).cast("long").alias("n_true_match"),
        F.sum(F.when(F.col("bloom_pass") & ~F.col("true_match"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
    )


# ---------------------------------------------------------------------------
# Day-of-month activity bitmaps per user via bit_or aggregation.
# ---------------------------------------------------------------------------
@register(
    "bitmap_daily_activity",
    """
    WITH b AS (
      SELECT user_id,
             CAST(bit_or(CAST(1 AS BIGINT) << (day(ts) - 1)) AS BIGINT)
               AS days_bitmap
      FROM events
      GROUP BY user_id
    )
    SELECT user_id, days_bitmap,
           CAST(bit_count(days_bitmap) AS BIGINT) AS n_active_days,
           CAST(length(bin(days_bitmap & -days_bitmap)) AS BIGINT)
             AS first_active_day,
           CAST(length(bin(days_bitmap)) AS BIGINT) AS last_active_day
    FROM b
    """,
)
def bitmap_daily_activity(spark, sf_dir):
    """Per-user day-of-month activity bitmap: bit_or packs any event volume
    into 8 bytes of aggregate state per user (fully map-side combinable —
    the canonical bitmap-index rollup). Distinct-day count is bit_count;
    first/last active day fall out of the exact cross-engine ⌊log₂⌋
    identity length(bin(x)) (lowest set bit isolated by x & -x). At 100 TB
    this is one shuffle of 8-byte values; the alternative COUNT(DISTINCT
    date) shuffles every (user, day) pair."""
    from hpmr_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    b = ev.groupBy("user_id").agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), day(ts) - 1)")
        ).cast("long").alias("days_bitmap")
    )
    return b.select(
        "user_id",
        "days_bitmap",
        F.bit_count("days_bitmap").cast("long").alias("n_active_days"),
        F.length(F.bin(F.expr("days_bitmap & -days_bitmap"))).cast("long").alias(
            "first_active_day"
        ),
        F.length(F.bin("days_bitmap")).cast("long").alias("last_active_day"),
    )
