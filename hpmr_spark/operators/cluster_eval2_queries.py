"""Round-9 wave 3: clustering evaluation, item-item recommendations, and
the Count-Min sketch — four standard recipes the registry lacked:

- adjusted_rand_index: ARI (Hubert & Arabie 1985) between the embedding
  label clustering and a committed sign-pattern quantization — exact
  pair-counting rationals on int128.
- davies_bouldin_index: Davies-Bouldin (1979) cluster validity over the
  label clustering with integer-micros centroids — every scatter and
  centroid distance floors to integer milli BEFORE ratios, so the index
  is pure integer arithmetic (complements the silhouette row).
- item_item_cosine_recs: item-item collaborative filtering (Sarwar et
  al. 2001) on order co-occurrence — top-3 similar parts per part by the
  exact integer image of cosine² (n_ab²·10¹² div n_a·n_b).
- count_min_sketch_est: the Count-Min sketch (Cormode & Muthukrishnan
  2005), depth 3 × width 128 with committed md5 row hashes — bucket sums
  and per-key min-estimates are EXACT integers reproduced identically in
  both engines (even the collisions), the bloom-filter discipline.

Integer discipline: ARI rides DECIMAL(38,0)/HUGEINT (pair-count products
overflow int64 at 2k vectors); DB/cosine ratios are ppm floor divisions
of exact integers; CM needs no gating at all — the sketch itself is
deterministic. Scale: ARI/DB aggregate k×k contingency cells; item-item
bounds pair blowup by per-order basket size; CM is two scans + a
128·3-cell rollup (mergeable by construction — the map-side combine IS
the sketch merge law).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.hashing import spark_sql_hash60, sql_hash60

# --------------------------------------------------------------------- ARI

# committed 8-cell quantization: sign pattern of the first 3 dims
_CELL_SPARK = (
    "CAST(4 * CASE WHEN CAST(element_at(embedding, 1) AS DOUBLE) >= 0.0e0"
    " THEN 1 ELSE 0 END"
    " + 2 * CASE WHEN CAST(element_at(embedding, 2) AS DOUBLE) >= 0.0e0"
    " THEN 1 ELSE 0 END"
    " + CASE WHEN CAST(element_at(embedding, 3) AS DOUBLE) >= 0.0e0"
    " THEN 1 ELSE 0 END AS BIGINT)"
)
_CELL_DUCK = (
    "CAST(4 * CASE WHEN CAST(embedding[1] AS DOUBLE) >= 0.0e0"
    " THEN 1 ELSE 0 END"
    " + 2 * CASE WHEN CAST(embedding[2] AS DOUBLE) >= 0.0e0"
    " THEN 1 ELSE 0 END"
    " + CASE WHEN CAST(embedding[3] AS DOUBLE) >= 0.0e0"
    " THEN 1 ELSE 0 END AS BIGINT)"
)

# comb2 over BIGINT counts: n*(n-1)/2 — always even product, exact
_C2 = "({n} * ({n} - 1) div 2)"
_C2D = "({n} * ({n} - 1) // 2)"

_ARI_ORACLE = f"""
    WITH pts AS (
      SELECT CAST(label AS BIGINT) AS a, {_CELL_DUCK} AS b FROM embeddings
    ),
    cont AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS nij FROM pts GROUP BY a, b
    ),
    stats AS (
      SELECT CAST(SUM({_C2D.format(n='nij')}) AS HUGEINT) AS sij,
             (SELECT CAST(SUM({_C2D.format(n='na')}) AS HUGEINT) FROM (
                SELECT CAST(SUM(nij) AS BIGINT) AS na FROM cont GROUP BY a))
               AS sa,
             (SELECT CAST(SUM({_C2D.format(n='nb')}) AS HUGEINT) FROM (
                SELECT CAST(SUM(nij) AS BIGINT) AS nb FROM cont GROUP BY b))
               AS sb,
             (SELECT {_C2D.format(n='CAST(COUNT(*) AS HUGEINT)')} FROM pts)
               AS stot
      FROM cont
    )
    SELECT CAST(sij AS BIGINT) AS sum_comb_ij,
           CAST(sa AS BIGINT) AS sum_comb_a,
           CAST(sb AS BIGINT) AS sum_comb_b,
           CAST(2 * (stot * sij - sa * sb) * 1000000
                // (stot * (sa + sb) - 2 * sa * sb) AS BIGINT) AS ari_ppm
    FROM stats
"""


@register("adjusted_rand_index", _ARI_ORACLE)
def adjusted_rand_index(spark, sf_dir):
    """Adjusted Rand Index (Hubert & Arabie 1985) between the embedding
    label clustering and the committed sign-pattern 8-cell quantization:
    ARI = (Σc2(nij) − Σc2(a)·Σc2(b)/c2(n)) / (½(Σc2(a)+Σc2(b)) −
    Σc2(a)·Σc2(b)/c2(n)), evaluated as ONE exact int128 cross-multiplied
    ppm (truncating div, identical both engines) — pair-count products
    exceed int64 already at 2k vectors. The standard external clustering
    agreement metric (the registry had kappa/NMI-class metrics but not
    ARI)."""
    e = _t(spark, sf_dir, "embeddings")
    pts = e.select(
        F.col("label").cast("long").alias("a"),
        F.expr(_CELL_SPARK).alias("b"),
    )
    cont = pts.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("nij")
    )
    # tiny k×k contingency feeds four aggregates — persist-free: derive
    # all sums from ONE frame via three chained aggs on <=64 rows
    cont = cont.localCheckpoint(eager=True)  # 64 rows; cuts the scan x4
    sij = cont.agg(
        F.expr(f"CAST(SUM({_C2.format(n='nij')}) AS DECIMAL(38,0))").alias(
            "sij"
        )
    )
    sa = cont.groupBy("a").agg(F.sum("nij").alias("na")).agg(
        F.expr(f"CAST(SUM({_C2.format(n='na')}) AS DECIMAL(38,0))").alias("sa")
    )
    sb = cont.groupBy("b").agg(F.sum("nij").alias("nb")).agg(
        F.expr(f"CAST(SUM({_C2.format(n='nb')}) AS DECIMAL(38,0))").alias("sb")
    )
    stot = cont.agg(
        F.expr(
            "CAST(CAST(SUM(nij) AS DECIMAL(38,0))"
            " * (CAST(SUM(nij) AS DECIMAL(38,0)) - 1) / 2 AS DECIMAL(38,0))"
        ).alias("stot")
    )
    return (
        sij.crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(stot))
        .select(
            F.expr("CAST(sij AS BIGINT)").alias("sum_comb_ij"),
            F.expr("CAST(sa AS BIGINT)").alias("sum_comb_a"),
            F.expr("CAST(sb AS BIGINT)").alias("sum_comb_b"),
            F.expr(
                "CAST(2 * (stot * sij - sa * sb) * 1000000"
                " div (stot * (sa + sb) - 2 * sa * sb) AS BIGINT)"
            ).alias("ari_ppm"),
        )
    )


# ----------------------------------------------------------- Davies-Bouldin

_DB_ORACLE = """
    WITH vi AS (
      SELECT vec_id, CAST(label AS BIGINT) AS lab,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
               AS BIGINT) AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings
    ),
    cent AS (
      SELECT lab AS clab, dim,
             CAST(SUM(v) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS c
      FROM vi GROUP BY lab, dim
    ),
    memdist AS (
      SELECT vi.vec_id, vi.lab,
             CAST(FLOOR(sqrt(CAST(CAST(SUM((vi.v - cent.c) * (vi.v - cent.c))
               AS BIGINT) AS DOUBLE)) / 1000.0e0) AS BIGINT) AS dist_milli
      FROM vi JOIN cent ON vi.dim = cent.dim AND vi.lab = cent.clab
      GROUP BY vi.vec_id, vi.lab
    ),
    scat AS (
      SELECT lab, CAST(SUM(dist_milli) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
               AS s_milli
      FROM memdist GROUP BY lab
    ),
    cdist AS (
      SELECT a.clab AS i, b.clab AS j,
             CAST(FLOOR(sqrt(CAST(CAST(SUM((a.c - b.c) * (a.c - b.c))
               AS BIGINT) AS DOUBLE)) / 1000.0e0) AS BIGINT) AS d_milli
      FROM cent a JOIN cent b ON a.dim = b.dim AND a.clab <> b.clab
      GROUP BY a.clab, b.clab
    ),
    ratio AS (
      SELECT cd.i,
             MAX((si.s_milli + sj.s_milli) * 1000000
                 // GREATEST(cd.d_milli, 1)) AS r_ppm
      FROM cdist cd
        JOIN scat si ON si.lab = cd.i
        JOIN scat sj ON sj.lab = cd.j
      GROUP BY cd.i
    )
    SELECT CAST(i AS BIGINT) AS label,
           CAST(r_ppm AS BIGINT) AS worst_ratio_ppm
    FROM ratio
"""


@register("davies_bouldin_index", _DB_ORACLE)
def davies_bouldin_index(spark, sf_dir):
    """Davies-Bouldin cluster validity (Davies & Bouldin 1979) of the
    label clustering: per cluster i, the worst (s_i + s_j)/d_ij over
    other clusters — scatter s = mean member-to-centroid distance,
    d = centroid distance. Centroids are floor-div integer micros (the
    kmeans_assign_step commitment); every sqrt distance floors to milli
    PER ROW before the exact integer mean, and the ratio is a ppm floor
    division — partition order never touches a value. Complements the
    silhouette row with the other textbook internal validity index."""
    e = _t(spark, sf_dir, "embeddings")
    vi = e.select(
        "vec_id",
        F.col("label").cast("long").alias("lab"),
        F.expr(
            "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)"
            " * 1000000) AS BIGINT))"
        ).alias("v"),
    )
    cent = (
        vi.select("lab", F.posexplode("v").alias("dim0", "val"))
        .groupBy("lab", "dim0")
        .agg(
            F.expr(
                "CAST(SUM(val) AS BIGINT) div CAST(COUNT(1) AS BIGINT)"
            ).alias("c")
        )
        .groupBy("lab")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim0, c))),"
                " p -> p.c)"
            ).alias("cv")
        )
    )
    memdist = vi.join(F.broadcast(cent), "lab").select(
        "lab",
        F.expr(
            "CAST(FLOOR(sqrt(CAST(aggregate(zip_with(v, cv,"
            " (a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT),"
            " (acc, x) -> acc + x) AS DOUBLE)) / 1000.0e0) AS BIGINT)"
        ).alias("dist_milli"),
    )
    scat = memdist.groupBy("lab").agg(
        F.expr(
            "CAST(SUM(dist_milli) AS BIGINT) div CAST(COUNT(1) AS BIGINT)"
        ).alias("s_milli")
    )
    ci = cent.select(F.col("lab").alias("i"), F.col("cv").alias("cvi"))
    cj = cent.select(F.col("lab").alias("j"), F.col("cv").alias("cvj"))
    cdist = (
        ci.join(F.broadcast(cj), F.col("i") != F.col("j"))
        .select(
            "i",
            "j",
            F.expr(
                "CAST(FLOOR(sqrt(CAST(aggregate(zip_with(cvi, cvj,"
                " (a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT),"
                " (acc, x) -> acc + x) AS DOUBLE)) / 1000.0e0) AS BIGINT)"
            ).alias("d_milli"),
        )
    )
    si = scat.select(F.col("lab").alias("i"), F.col("s_milli").alias("si"))
    sj = scat.select(F.col("lab").alias("j"), F.col("s_milli").alias("sj"))
    ratio = (
        cdist.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .groupBy("i")
        .agg(
            # GREATEST(d_milli, 1): coincident milli-centroids would make
            # this an ANSI DIVIDE_BY_ZERO runtime error on data change
            # (ADVICE r9); identical guard in the DuckDB twin.
            F.expr(
                "MAX((si + sj) * 1000000 div GREATEST(d_milli, 1))"
            ).alias("r_ppm")
        )
    )
    return ratio.select(
        F.col("i").cast("long").alias("label"),
        F.col("r_ppm").cast("long").alias("worst_ratio_ppm"),
    )


# ------------------------------------------------------- item-item cosine

_II_ORACLE = """
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    freq AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n FROM baskets GROUP BY 1
    ),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(COUNT(*) AS BIGINT) AS nab
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT p.pa, p.pb, p.nab,
             CAST(p.nab * p.nab * 1000000000000 // (fa.n * fb.n) AS BIGINT)
               AS cos2_ppt
      FROM pairs p
        JOIN freq fa ON fa.l_partkey = p.pa
        JOIN freq fb ON fb.l_partkey = p.pb
    )
    SELECT pa, pb, nab, cos2_ppt, CAST(rk AS BIGINT) AS rk FROM (
      SELECT pa, pb, nab, cos2_ppt,
             ROW_NUMBER() OVER (PARTITION BY pa
                                ORDER BY cos2_ppt DESC, pb) AS rk
      FROM scored)
    WHERE rk <= 3
"""


@register("item_item_cosine_recs", _II_ORACLE)
def item_item_cosine_recs(spark, sf_dir):
    """Item-item collaborative filtering (Sarwar et al. 2001) on order
    co-occurrence: parts are vectors over orders, similarity is cosine =
    n_ab/√(n_a·n_b), ranked by its exact integer image n_ab²·10¹² div
    (n_a·n_b) with a (score, part) tie-break — top-3 recommendations per
    part. Pair blowup is bounded by basket size (≤7 lines/order), the
    classic reason item-item scales where user-user doesn't; the rank
    window partitions by part (never global)."""
    li = _t(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    freq = baskets.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a = baskets.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa")
    )
    b = baskets.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb")
    )
    pairs = (
        a.join(b, "ok")
        .where(F.col("pa") != F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("nab"))
    )
    fa = freq.select(F.col("l_partkey").alias("pa"), F.col("n").alias("na"))
    fb = freq.select(F.col("l_partkey").alias("pb"), F.col("n").alias("nb"))
    scored = (
        pairs.join(F.broadcast(fa), "pa")
        .join(F.broadcast(fb), "pb")
        .select(
            "pa",
            "pb",
            "nab",
            F.expr(
                "CAST(nab * nab * 1000000000000 div (na * nb) AS BIGINT)"
            ).alias("cos2_ppt"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("pa").orderBy(F.desc("cos2_ppt"), F.asc("pb"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 3)
        .select("pa", "pb", "nab", "cos2_ppt", "rk")
    )


# ------------------------------------------------------------- Count-Min

_CM_W = 128  # committed width
_CM_D = 3  # committed depth


def _cm_buckets(h, key_text: str) -> list[str]:
    return [
        f"CAST(({h(chr(39) + f'cm{d}:' + chr(39) + ' || ' + key_text)})"
        f" % {_CM_W} AS BIGINT)"
        for d in range(_CM_D)
    ]


def _cm_oracle() -> str:
    key = "CAST(l_partkey AS VARCHAR)"
    b = _cm_buckets(sql_hash60, key)
    return f"""
    WITH hashed AS (
      {" UNION ALL ".join(
        f"SELECT l_partkey, {d} AS d, {b[d]} AS bucket FROM lineitem"
        for d in range(_CM_D)
      )}
    ),
    sketch AS (
      SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM hashed GROUP BY d, bucket
    ),
    exact AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM lineitem GROUP BY l_partkey
    ),
    est AS (
      SELECT e.l_partkey, e.exact_cnt, MIN(s.cnt) AS cm_est
      FROM exact e
        JOIN hashed h ON h.l_partkey = e.l_partkey
        JOIN sketch s ON s.d = h.d AND s.bucket = h.bucket
      GROUP BY e.l_partkey, e.exact_cnt
    )
    SELECT l_partkey, exact_cnt, CAST(cm_est AS BIGINT) AS cm_est,
           cm_est >= exact_cnt AS never_underestimates
    FROM (
      SELECT l_partkey, exact_cnt, cm_est,
             ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, l_partkey) AS rk
      FROM est)
    WHERE rk <= 20
"""


@register("count_min_sketch_est", _cm_oracle())
def count_min_sketch_est(spark, sf_dir):
    """Count-Min sketch (Cormode & Muthukrishnan 2005), depth 3 × width
    128 with committed md5 row hashes, over lineitem part frequencies:
    bucket counts are exact integer sums, the per-key estimate is the
    min over its 3 buckets, and BOTH engines reproduce every collision
    exactly (the bloom-filter discipline) — so the sketch values
    hash-check directly, no probabilistic gate needed. Emits the top-20
    parts by exact count with their CM estimates plus the structural
    never-underestimates boolean. Map-side combine on (d, bucket) IS the
    CM merge law — the sketch is mergeable by construction."""
    li = _t(spark, sf_dir, "lineitem")
    key = "CAST(l_partkey AS STRING)"
    b = _cm_buckets(spark_sql_hash60, key)
    hashed = None
    for d in range(_CM_D):
        part = li.select(
            "l_partkey",
            F.lit(d).alias("d"),
            F.expr(b[d]).alias("bucket"),
        )
        hashed = part if hashed is None else hashed.unionByName(part)
    sketch = hashed.groupBy("d", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    exact = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("exact_cnt")
    )
    keyrows = hashed.select("l_partkey", "d", "bucket").distinct()
    est = (
        keyrows.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("l_partkey")
        .agg(F.min("cnt").cast("long").alias("cm_est"))
        .join(exact, "l_partkey")
    )
    # top-20 selection: deterministic total-order sort + limit (Spark
    # plans TakeOrdered — bounded output, no global window)
    top20 = est.orderBy(F.desc("exact_cnt"), F.asc("l_partkey")).limit(20)
    return top20.select(
        "l_partkey",
        "exact_cnt",
        "cm_est",
        (F.col("cm_est") >= F.col("exact_cnt")).alias("never_underestimates"),
    )
