"""MapReduce physical patterns the reference engine family is built on,
re-expressed with explicit Spark physical control:

- secondary_sort_fold: the canonical MR "secondary sort" — partition by
  key, sort WITHIN partitions by (key, time), stream each partition once
  through a fold. The reference's combine-on-insert map
  (/root/reference/src/dist_map.h:147-210) assumes exactly this layout;
  here repartition(key) + sortWithinPartitions gives the physical
  guarantee and mapInPandas does the single-pass fold with O(1) state per
  key run. The oracle is the equivalent window/group SQL — proving the
  physical plan computes the declarative answer.
- pca_power_iteration_int: distributed EXACT Gram matrix over quantized
  embeddings (the X^T X outer-product aggregation — the one corpus-sized
  pass), then a deterministic fixed-point power iteration on the tiny
  64x64 matrix. Every number is a BIGINT; the oracle unrolls the same
  iterations in SQL. This is the computeGramianMatrix shape big-data PCA
  actually uses: data-parallel Gram, driver-sized eigensolve.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.littables import values_df
from hpmr_spark.sources.tables import load_events

# ---------------------------------------------------------------------------
# Secondary sort: repartition(user) + in-partition (user, ts, id) sort +
# one-pass fold.
# ---------------------------------------------------------------------------
@register(
    "secondary_sort_fold",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS first_us,
           CAST(epoch_us(MAX(ts)) AS BIGINT) AS last_us,
           CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_us
    FROM (
      SELECT user_id, ts,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)) AS gap
      FROM events
    )
    GROUP BY user_id
    """,
)
def secondary_sort_fold(spark, sf_dir):
    """The MR secondary-sort pattern with real physical control:
    repartition(user_id) guarantees each user's rows land in ONE partition,
    sortWithinPartitions(user_id, ts, event_id) delivers them to the fold
    in event order WITHOUT a window's buffering, and a mapInPandas fold
    streams each partition once keeping only (count, first, last, prev,
    max_gap) per current user run — O(1) state, no collect_list, no
    per-user sort state. The oracle computes the same per-user
    first/last/max-adjacent-gap with LAG + GROUP BY, proving the physical
    pipeline ≡ the declarative answer. At 100 TB this is the shape for
    session stitching and per-entity scans where window state would spill:
    one shuffle, then pure streaming."""
    ev = load_events(spark, sf_dir).select("user_id", "event_id", "ts")
    part = (
        ev.withColumn("ts_us", F.unix_micros("ts"))
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts_us", "event_id")
        .select("user_id", "ts_us")
    )

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: dict[int, list[int]] = {}  # user -> [n, first, last, max_gap]
        for pdf in batches:
            for uid, ts in zip(pdf["user_id"].values, pdf["ts_us"].values):
                uid = int(uid)
                ts = int(ts)
                st = out.get(uid)
                if st is None:
                    out[uid] = [1, ts, ts, 0]
                else:
                    st[0] += 1
                    gap = ts - st[2]
                    if gap > st[3]:
                        st[3] = gap
                    st[2] = ts
        yield pd.DataFrame(
            {
                "user_id": list(out.keys()),
                "n": [v[0] for v in out.values()],
                "first_us": [v[1] for v in out.values()],
                "last_us": [v[2] for v in out.values()],
                "max_gap_us": [v[3] for v in out.values()],
            }
        )

    return part.mapInPandas(
        fold,
        "user_id long, n long, first_us long, last_us long, max_gap_us long",
    )


# ---------------------------------------------------------------------------
# Exact fixed-point PCA power iteration over the quantized Gram matrix.
# ---------------------------------------------------------------------------
_PCA_SCALE = 200  # same committed int8 quantization as similarity_topk_int8
_PCA_ITERS = 3


def _pca_oracle() -> str:
    # Gram matrix in exact BIGINTs over quantized components, then the
    # power iteration unrolled: v0 = 1e6 everywhere; each step computes
    # w = G·v and renormalizes to v = w*1e6 // max(w) (w > 0 since v0 > 0
    # and G is diagonally dominant positive for this corpus — verified by
    # the selfcheck gate; all divisions positive).
    steps = []
    prev = "v0"
    for k in range(1, _PCA_ITERS + 1):
        steps.append(
            f"""w{k} AS (
      SELECT g.i, CAST(SUM(g.val * {prev}.v) AS BIGINT) AS w
      FROM g JOIN {prev} ON g.j = {prev}.i GROUP BY g.i
    ),
    v{k} AS (
      -- sign-split renorm: only positive operands ever divide, so the
      -- floor semantics are engine-independent (negative // differs)
      SELECT i,
             CAST(CASE WHEN w >= 0
                       THEN (w * 1000000) // (SELECT MAX(w) FROM w{k})
                       ELSE 0 - ((0 - w) * 1000000) // (SELECT MAX(w) FROM w{k})
                  END AS BIGINT) AS v
      FROM w{k}
    )"""
        )
        prev = f"v{k}"
    steps_sql = ",\n    ".join(steps)
    return f"""
    WITH q AS (
      SELECT vec_id,
             u.i AS i,
             CAST(FLOOR(CAST(u.v AS DOUBLE) * {_PCA_SCALE}) AS BIGINT) AS qv
      FROM embeddings,
           LATERAL (SELECT UNNEST(embedding) AS v,
                           generate_subscripts(embedding, 1) AS i) u
    ),
    g AS (
      SELECT a.i AS i, b.i AS j, CAST(SUM(a.qv * b.qv) AS BIGINT) AS val
      FROM q a JOIN q b USING (vec_id) GROUP BY a.i, b.i
    ),
    v0 AS (SELECT i, CAST(1000000 AS BIGINT) AS v
           FROM (SELECT DISTINCT i FROM g)),
    {steps_sql}
    SELECT i AS dim, v AS v_ppm FROM {prev}
    """


@register("pca_power_iteration_int", _pca_oracle())
def pca_power_iteration_int(spark, sf_dir):
    """Leading principal direction of the embedding corpus by power
    iteration, EXACT end to end: components quantize to the committed int8
    scale, the 64×64 Gram matrix X^T X is one distributed outer-product
    aggregation (the only corpus-sized pass — posexplode pairs, groupBy
    (i,j), exact BIGINT sums), and the power iteration runs on the
    collected 4096-entry matrix in pure-integer arithmetic (renormalize to
    ppm by the max component each step), so both engines walk identical
    lattice points — the oracle unrolls the same three iterations in SQL.
    At 100 TB only the Gram aggregation grows; d²=4096 accumulator cells
    make it a perfect map-side-combine shuffle, and the eigensolve stays
    driver-sized (MLlib's computeGramianMatrix shape)."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * {_PCA_SCALE}) AS BIGINT))"
            )
        ).alias("pos0", "qv"),
    ).select("vec_id", (F.col("pos0") + 1).alias("i"), "qv")
    g = (
        q.alias("a")
        .join(q.alias("b"), "vec_id")
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.sum(F.col("a.qv") * F.col("b.qv")).cast("long").alias("val"))
    )
    rows = g.collect()  # 64x64 = 4096 entries — bounded by dim², documented
    dims = sorted({r.i for r in rows})
    gm = {(r.i, r.j): r.val for r in rows}
    v = {i: 1000000 for i in dims}
    for _ in range(_PCA_ITERS):
        w = {i: sum(gm[(i, j)] * v[j] for j in dims) for i in dims}
        mx = max(w.values())
        assert mx > 0, "power iteration lost positivity of the max component"
        # sign-split renorm: positive-operand floor division only (matches
        # the oracle's CASE — negative // semantics differ across engines)
        v = {
            i: (w[i] * 1000000 // mx) if w[i] >= 0 else -((-w[i]) * 1000000 // mx)
            for i in dims
        }
    out = values_df(spark, 
        [(int(i), int(v[i])) for i in dims], "dim long, v_ppm long"
    )
    return out
