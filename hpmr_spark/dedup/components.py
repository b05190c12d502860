"""Connected components over the near-dup pair graph — proper dedup cluster
resolution (the greedy min-id drop in `dedup_resolution_keep_docs` is an
approximation; components give the true transitive clusters).

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi, Mirrokni,
Rastogi, Vassilvitskii — "Connected Components in MapReduce and Beyond",
SoCC'14). Converges in O(log n) rounds (vs O(diameter) for plain min-label
propagation, which round 1 measured at ~20 driver-checked iterations / 19 s
at sf0.01). Each round is two groupBy+join passes over the edge list; state
is the edge list itself, which monotonically contracts toward a star forest
whose centers are the component minima. The engine's one genuinely iterative
operator (the reference has none; SURVEY.md §2.3 lists iteration as
extension work).

Scale: per round, shuffled bytes are O(|E|) keyed by node id;
`localCheckpoint` after each round caps lineage. The convergence test is a
single cheap action per round ("is the state a single-parent star forest?"),
exact — not a sampled signature:

- both operators preserve the graph's connected components, so a state in
  which every node has exactly one parent and no parent is itself a child is
  a star forest with one star per ORIGINAL component;
- edges always point larger → smaller, so each star's center is its
  component's minimum id (the min can never be a leaf: its parent would have
  to be smaller).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star pass over a symmetric edge list: every strictly-larger
    neighbor of u is re-pointed at min(Γ(u) ∪ {u}). Output edges satisfy
    u > v (larger → smaller)."""
    m = sym.groupBy("u").agg(F.least(F.col("u"), F.min("v")).alias("m"))
    return (
        sym.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star pass over a larger→smaller edge list: all of u's
    (smaller) neighbors plus u itself are pointed at the minimum neighbor.
    Output edges satisfy u > v."""
    m = e.groupBy("u").agg(F.min("v").alias("m"))
    repointed = e.join(m, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_edge = m.select("u", F.col("m").alias("v"))
    return (
        repointed.union(self_edge)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b", max_iter: int = 12
) -> DataFrame:
    """(node, component) for every node in the pair graph; component = min
    node id reachable. Deterministic."""
    # Materialize the (possibly expensive) pair subtree ONCE: nodes and
    # edges both consume it, and without this checkpoint Spark re-evaluates
    # the whole upstream (e.g. the prefix-filtered n-gram Jaccard join) per
    # consumer — measured 2× the operator's cost at sf0.01.
    raw = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")).localCheckpoint(
        eager=True
    )
    nodes = (
        raw.select("u")
        .union(raw.select(F.col("v").alias("u")))
        .distinct()
        .select(F.col("u").alias("node"))
        .localCheckpoint(eager=True)
    )
    edges = (
        raw.where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        edges = _small_star(_large_star(sym)).localCheckpoint(eager=True)
        # Star-forest test (exact, one action): no node has 2 parents, and no
        # parent is itself a child. See module docstring for why this implies
        # convergence with min-id centers.
        multi_parent = (
            edges.groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") > 1)
            .select(F.lit(1).alias("x"))
        )
        chained = (
            edges.alias("a")
            .join(edges.alias("b"), F.col("a.v") == F.col("b.u"), "left_semi")
            .select(F.lit(1).alias("x"))
        )
        if multi_parent.union(chained).limit(1).count() == 0:
            break
    return nodes.join(edges, nodes.node == edges.u, "left").select(
        "node", F.coalesce(F.col("v"), F.col("node")).alias("component")
    )


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Cluster summary: representative (min doc_id), size, member list as a
    deterministic sorted string."""
    cc = connected_components(pairs)
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.concat_ws(",", F.sort_array(F.collect_list(F.col("node").cast("string")))).alias(
            "members"
        ),
    ).select(
        F.col("component").alias("representative"), "cluster_size", "members"
    )
