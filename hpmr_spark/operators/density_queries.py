"""Grid-based DBSCAN clustering (round 6, wave 6).

grid_dbscan_clusters: density clustering on the (discount-percent,
quantity) integer grid. A cell is CORE iff it holds ≥ 0.1% of all rows
(cnt * 1000 ≥ n — a cross-multiplied relative-density threshold, no
division); core cells connect through 4-neighborhood adjacency; the
clusters are the connected components, labeled by MIN cell key. The
engine reuses the large-star/small-star contraction
(hpmr_spark/dedup/components.py — O(log n) rounds with the exact
star-forest termination test); isolated core cells become singleton
clusters via the coalesce-to-own-key left join. The oracle computes
the same components with the UNION-distinct transitive-closure
recursion (the dedup_cluster_components shape).

Scale notes (100 TB): one fact pass builds the ≤ 550-cell histogram;
everything else (adjacency, contraction) is bounded by the grid, not
the data. This IS grid-DBSCAN's reason to exist: density clustering
whose state is resolution-bounded.

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's analytics axis.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.dedup.components import connected_components

_DBSCAN_ORACLE = """
    WITH RECURSIVE cells AS MATERIALIZED (
      SELECT CAST(ROUND(l_discount * 100) AS BIGINT) * 100
               + CAST(l_quantity AS BIGINT) AS k,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS dc,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2, 3
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cells),
    core AS MATERIALIZED (
      SELECT k, dc, q, cnt FROM cells, tot WHERE cnt * 1000 >= tot.n
    ),
    pairs AS (
      SELECT a.k AS ka, b.k AS kb
      FROM core a JOIN core b
        ON (a.dc = b.dc AND b.q = a.q + 1)
        OR (b.dc = a.dc + 1 AND b.q = a.q)
    ),
    edges AS (
      SELECT ka AS s, kb AS d FROM pairs
      UNION
      SELECT kb AS s, ka AS d FROM pairs
    ),
    reach AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    comp AS (
      SELECT s AS node, LEAST(s, MIN(d)) AS component
      FROM reach GROUP BY s
    ),
    labeled AS (
      SELECT cells.k, cells.cnt,
             CASE WHEN core.k IS NULL THEN CAST(-1 AS BIGINT)
                  ELSE COALESCE(comp.component, cells.k) END AS cluster_id
      FROM cells
      LEFT JOIN core ON core.k = cells.k
      LEFT JOIN comp ON comp.node = cells.k
    )
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(cnt) AS BIGINT) AS n_points
    FROM labeled GROUP BY cluster_id
"""


@register("grid_dbscan_clusters", _DBSCAN_ORACLE)
def grid_dbscan_clusters(spark, sf_dir):
    """Grid-DBSCAN over (discount, quantity) — see module docstring.
    Output: one row per cluster (cluster_id, n_cells, n_points)."""
    li = _t(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        (F.round(F.col("l_discount") * 100).cast("long") * 100
         + F.col("l_quantity").cast("long")).alias("k"),
        F.round(F.col("l_discount") * 100).cast("long").alias("dc"),
        F.col("l_quantity").cast("long").alias("q"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    tot = cells.agg(F.sum("cnt").cast("long").alias("n"))
    core = (
        cells.crossJoin(F.broadcast(tot))
        .where(F.col("cnt") * 1000 >= F.col("n"))
        .select("k", "dc", "q", "cnt")
    )
    b = core.select(
        F.col("k").alias("kb"), F.col("dc").alias("dcb"), F.col("q").alias("qb")
    )
    pairs = core.join(
        F.broadcast(b),
        ((F.col("dc") == F.col("dcb")) & (F.col("qb") == F.col("q") + 1))
        | ((F.col("dcb") == F.col("dc") + 1) & (F.col("qb") == F.col("q"))),
    ).select(F.col("k").alias("ka"), F.col("kb"))
    comp = connected_components(pairs, a_col="ka", b_col="kb")
    labeled = (
        cells.join(core.select(F.col("k"), F.lit(1).alias("is_core")), "k", "left")
        .join(comp.select(F.col("node").alias("k"), "component"), "k", "left")
        .select(
            F.when(F.col("is_core").isNull(), F.lit(-1).cast("long"))
            .otherwise(F.coalesce(F.col("component"), F.col("k")))
            .alias("cluster_id"),
            "cnt",
        )
    )
    return labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("cnt").cast("long").alias("n_points"),
    )
