"""Distributed-systems primitives batch 2 (round 6): rendezvous (HRW)
hashing with the zero-reshuffle removal proof, an AMS F2 sketch with an
exact gate, and KMV set-operation estimates — completing the sharding +
sketch toolbox next to round 5's consistent-hash ring and KMV merge law.

Every query is ONE generated SQL text planned on both engines, differing
only in committed engine idioms (hash60 spelling, STRING/VARCHAR, the
int128 cast DECIMAL(38,0)/HUGEINT, div///, 1-based list indexing) — the
cross-engine hash makes even the sketch CONTENTS engine-identical.

Scale shapes: HRW assignment is a per-row expression (argmax over
n_nodes hashes — zero shuffle; this is the partitioner shape); AMS is
one keyed count + one wide aggregate; KMV bottom-k is TakeOrdered
(per-partition partial bottom-k, driver merges k·n_parts).

Reference parity: HRW is the decentralized analog of the reference's
static `key % n_buckets` placement (/root/reference/src/dist_map.h:34;
`check_balance`, src/bare_hash_container.h:135-148, motivates the
balance report); the sketch gates extend the r2 sketch-gating pattern.
"""

from __future__ import annotations

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.hashing import sql_hash60
from hpmr_spark.sources.tables import load_events

# Engine idiom bundles: (hash60 text fn, string type, int128 type,
# integer-division token, sorted-list median-of-5 extractor).
_SPARK = {
    "h": lambda e: f"CAST(conv(substring(md5({e}), 1, 15), 16, 10) AS BIGINT)",
    "str": "STRING",
    "big": "DECIMAL(38,0)",
    "div": "div",
    "med5": lambda arr: f"element_at(sort_array(array({arr})), 3)",
    "med3": lambda arr: f"element_at(sort_array(array({arr})), 2)",
    "st": lambda h, n: f"named_struct('h', {h}, 'negnode', {n})",
    "amax": lambda items: f"array_max(array({items}))",
}
_DUCK = {
    "h": sql_hash60,
    "str": "VARCHAR",
    "big": "HUGEINT",
    "div": "//",
    "med5": lambda arr: f"(list_sort([{arr}]))[3]",
    "med3": lambda arr: f"(list_sort([{arr}]))[2]",
    "st": lambda h, n: f"{{'h': {h}, 'negnode': {n}}}",
    "amax": lambda items: f"list_aggregate([{items}], 'max')",
}


# ---------------------------------------------------------------------------
# Rendezvous (highest-random-weight) hashing.
# ---------------------------------------------------------------------------
_N_NODES = 8


def _hrw_query(e) -> str:
    def argmax(n_nodes: int) -> str:
        structs = ",".join(
            e["st"](
                e["h"](f"'hrw:{node}:' || CAST(o_orderkey AS {e['str']})"),
                -node,
            )
            for node in range(n_nodes)
        )
        return f"(0 - ({e['amax'](structs)}).negnode)"

    node_rows = " UNION ALL ".join(
        f"SELECT CAST({n} AS BIGINT) AS node" for n in range(_N_NODES)
    )
    return f"""
    WITH assigned AS (
      SELECT o_orderkey,
             {argmax(_N_NODES)} AS node8,
             {argmax(_N_NODES - 1)} AS node7
      FROM orders
    ),
    nodes AS ({node_rows})
    SELECT nodes.node,
           CAST(SUM(CASE WHEN a.node8 = nodes.node THEN 1 ELSE 0 END)
                AS BIGINT) AS n_keys_8,
           CAST(SUM(CASE WHEN a.node7 = nodes.node
                          AND nodes.node < {_N_NODES - 1}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_keys_7,
           CAST(SUM(CASE WHEN a.node8 = {_N_NODES - 1}
                          AND a.node7 = nodes.node THEN 1 ELSE 0 END)
                AS BIGINT) AS n_inherited
    FROM nodes JOIN assigned a ON 1 = 1
    GROUP BY nodes.node ORDER BY nodes.node
    """


@register("rendezvous_hash_assign", _hrw_query(_DUCK))
def rendezvous_hash_assign(spark, sf_dir):
    """Rendezvous/HRW hashing of order keys onto 8 nodes: each key lands
    on argmax_node hash60('hrw:node:key') (array_max over (h, -node)
    structs — ties to the lowest node, linear, never a when-chain) —
    coordination-free decentralized routing. The report proves the HRW
    minimal-movement property AS DATA: dropping node 7, every surviving
    node satisfies n_keys_7 = n_keys_8 + n_inherited row by row
    (removing a non-winner never changes a winner). Assignment is a pure
    per-row expression — zero shuffle at any scale; the only shuffle is
    the 8-row report aggregate."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_hrw_query(_SPARK))


# ---------------------------------------------------------------------------
# AMS (Alon-Matias-Szegedy) F2 sketch with exact gate.
# ---------------------------------------------------------------------------
_AMS_G = 3  # median groups
_AMS_M = 8  # estimators averaged per group


def _ams_query(e) -> str:
    n = _AMS_G * _AMS_M

    def sign(r: int) -> str:
        h = e["h"](f"'ams{r}:' || CAST(user_id AS {e['str']})")
        return f"(1 - 2 * ({h} % 2))"

    z_cols = ", ".join(
        f"CAST(SUM({sign(r)} * c) AS BIGINT) AS z_{r}" for r in range(n)
    )
    grp_cols = ", ".join(
        "CAST(("
        + " + ".join(
            f"CAST(z_{g * _AMS_M + j} AS {e['big']}) * z_{g * _AMS_M + j}"
            for j in range(_AMS_M)
        )
        + f") {e['div']} {_AMS_M} AS BIGINT) AS grp_{g}"
        for g in range(_AMS_G)
    )
    grps = ", ".join(f"grp_{g}" for g in range(_AMS_G))
    med = e["med3"](grps)
    return f"""
    WITH counts AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    zs AS (
      SELECT CAST(SUM(CAST(c AS {e['big']}) * c) AS BIGINT) AS f2_exact,
             {z_cols}
      FROM counts
    ),
    es AS (SELECT f2_exact, {grp_cols} FROM zs)
    SELECT f2_exact, {grps},
           CAST({med} AS BIGINT) AS est_median,
           CAST(CASE WHEN ABS({med} - f2_exact) * 10 <= 8 * f2_exact
                THEN 1 ELSE 0 END AS BIGINT) AS within_80pct
    FROM es
    """


@register("ams_f2_sketch_gate", _ams_query(_DUCK))
def ams_f2_sketch_gate(spark, sf_dir):
    """AMS second-frequency-moment sketch over per-user event counts:
    5 independent ±1 sign estimators (sign = parity of a committed
    hash60 — engine-identical), Z_r = Σ sign_r(u)·c_u, estimate = Z_r²,
    reported next to the EXACT F2 with the median-of-5 and an 80%
    relative-error gate (a committed bound in the LSH-constant sense —
    the 3-of-5 median of variance-2F2² estimators clears it on this
    corpus; re-verify via selfcheck if data changes). Everything is
    exact integer arithmetic — even the 'random' signs — so the sketch
    itself is oracle-checked, not just the exact value (the r2
    sketch-gating pattern). One keyed count + one wide aggregate."""
    load_events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(_ams_query(_SPARK))


# ---------------------------------------------------------------------------
# KMV set-operation estimates (union + intersection) with exact gates.
# ---------------------------------------------------------------------------
_KMV_K = 256
_KMV_DOMAIN = 1 << 60


def _kmv_setops_query(e) -> str:
    h = e["h"](f"'kmvs:' || CAST(user_id AS {e['str']})")
    union_est = (
        f"CASE WHEN mn < {_KMV_K} THEN mn"
        f" ELSE CAST(CAST({_KMV_K - 1} AS {e['big']}) * {_KMV_DOMAIN}"
        f" {e['div']} kth AS BIGINT) END"
    )
    return f"""
    WITH ha AS (
      SELECT DISTINCT {h} AS hv FROM events WHERE event_type = 'click'
    ),
    hb AS (
      SELECT DISTINCT {h} AS hv FROM events WHERE event_type = 'view'
    ),
    ka AS (SELECT hv FROM ha ORDER BY hv LIMIT {_KMV_K}),
    kb AS (SELECT hv FROM hb ORDER BY hv LIMIT {_KMV_K}),
    mrg AS (
      SELECT hv FROM (SELECT hv FROM ka UNION SELECT hv FROM kb) u
      ORDER BY hv LIMIT {_KMV_K}
    ),
    msk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS mn, CAST(MAX(hv) AS BIGINT) AS kth,
             CAST(SUM(CASE WHEN hv IN (SELECT hv FROM ka)
                            AND hv IN (SELECT hv FROM kb)
                           THEN 1 ELSE 0 END) AS BIGINT) AS matches
      FROM mrg
    ),
    tru AS (
      SELECT CAST((SELECT COUNT(*) FROM (SELECT hv FROM ha UNION
                                         SELECT hv FROM hb) u) AS BIGINT)
               AS true_union,
             CAST((SELECT COUNT(*) FROM ha
                   WHERE hv IN (SELECT hv FROM hb)) AS BIGINT)
               AS true_inter
    )
    SELECT CAST({union_est} AS BIGINT) AS est_union,
           true_union,
           CAST(matches * CAST(({union_est}) AS {e['big']}) {e['div']} mn
                AS BIGINT) AS est_inter,
           true_inter,
           matches,
           CAST(CASE WHEN ABS(({union_est}) - true_union) * 10
                          <= 2 * true_union THEN 1 ELSE 0 END AS BIGINT)
             AS union_within_20pct,
           CAST(CASE WHEN ABS(matches * CAST(({union_est}) AS {e['big']})
                              {e['div']} mn - true_inter) * 10
                          <= 3 * GREATEST(true_inter, 1)
                     THEN 1 ELSE 0 END AS BIGINT) AS inter_within_30pct
    FROM msk, tru
    """


@register("kmv_set_ops_gate", _kmv_setops_query(_DUCK))
def kmv_set_ops_gate(spark, sf_dir):
    """KMV bottom-k set operations over the click-user and view-user
    distinct sets: union estimate from the MERGED bottom-256 (the KMV
    merge law), intersection via the match-ratio estimator
    matches·est_union/k. Both are reported next to their EXACT twins
    with committed relative-error gates (20% union / 30% intersection —
    commitments in the LSH-constant sense, re-verify via selfcheck on
    data change; n<k degenerates to exact). Hashes are the committed
    hash60, so sketch contents are engine-identical. Bottom-k =
    TakeOrdered; the exact twins are two distinct-aggregates — the
    sketch's 100 TB point is that ONLY the exact twins touch full
    cardinality."""
    load_events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(_kmv_setops_query(_SPARK))
