"""Round-9 third wave: data-mixing, RLHF-evaluation, and weighted-graph
recipes still absent from the registry (each a named published algorithm):

- unimax_language_budget: UniMax language sampling (Chung et al. 2023,
  Alg. 1) — ascending-size waterfall: each language gets the lesser of an
  equal share of the remaining budget and its epoch cap; leftovers flow to
  larger languages. Irreducibly sequential over the (bounded) language
  list -> grouped-pandas fold ≡ recursive-CTE oracle (the token-bucket
  pattern), pure integer arithmetic.
- doremi_domain_weights: DoReMi-style domain reweighting (Xie et al.
  2023) — multiplicative-weights iterations where each domain's "excess
  loss" is KL(domain unigram LM || current mixture LM); 8 committed
  iterations over the (sources x vocab) count matrix inside ONE
  grouped-pandas fold, hash-matched by a recursive-CTE oracle carrying the
  weight LIST (the Bradley-Terry matrix-iteration pattern; LN/EXP are the
  committed libm-parity surface).
- best_of_n_reward: exact unbiased best-of-n estimator (Nakano et al.
  2021, WebGPT App. I): E[max of n] = sum_i C(i-1,n-1)/C(N,n) * r_(i),
  the combinatorial weights evaluated as a product of exact fractions in
  DOUBLE (the pass@k discipline) and each term floored to nanos BEFORE
  the sum.
- bellman_ford_nation_days: weighted single-source shortest paths over
  the supplier->customer nation graph (edge weight = min non-negative
  fulfillment latency, ship minus order date in days), k committed
  Bellman-Ford relaxations — the weighted twin of
  graph_bfs_3hop; iterative bounded DataFrame relaxation ≡ recursive-CTE
  oracle carrying the distance LIST over a dense INF-sentinel edge matrix.

Integer discipline (CLAUDE.md): budgets/counts/distances exact BIGINTs;
INF sentinel 10^15 (finite + INF stays < 2^63); every float expression is
identical TEXT both engines with elementwise nano floors before any sum;
fold orders are the committed sorted orders on both sides.

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's LLM-pipeline axis.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register

# ---------------------------------------------------------------------------
# UniMax language-budget waterfall.
# ---------------------------------------------------------------------------

_UM_BUDGET_MULT = 2  # committed: B = 2 x total corpus tokens
_UM_EPOCH_CAP = 3  # committed: no language repeats more than 3 epochs


def _unimax_fold(pdf):
    """The UniMax waterfall in exact Python ints — bit-identical to the
    recursive-CTE oracle walking the same (n_tok, lang)-ascending order."""
    import pandas as pd

    rows = sorted(zip(pdf["lang"].tolist(), pdf["n_tok"].tolist()),
                  key=lambda x: (x[1], x[0]))
    total = sum(n for _, n in rows)
    remaining = _UM_BUDGET_MULT * total
    m = len(rows)
    out = []
    for idx, (lang, n) in enumerate(rows):
        share = remaining // (m - idx)
        alloc = min(share, _UM_EPOCH_CAP * n)
        remaining -= alloc
        out.append((lang, n, alloc, alloc * 1000000 // n))
    return pd.DataFrame(
        out, columns=["lang", "n_tok", "alloc_tok", "epochs_ppm"]
    )


_UNIMAX_ORACLE = f"""
    WITH RECURSIVE lt AS MATERIALIZED (
      SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
      FROM documents GROUP BY lang
    ),
    ranked AS MATERIALIZED (
      SELECT lang, n_tok,
             ROW_NUMBER() OVER (ORDER BY n_tok, lang) AS rn,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM lt
    ),
    tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS t FROM lt),
    rec(stp, rem, alloc) AS (
      SELECT 0, (SELECT {_UM_BUDGET_MULT} * t FROM tot), CAST(0 AS BIGINT)
      UNION ALL
      SELECT rec.stp + 1,
             rec.rem - LEAST(rec.rem // (r.m - rec.stp),
                             {_UM_EPOCH_CAP} * r.n_tok),
             LEAST(rec.rem // (r.m - rec.stp), {_UM_EPOCH_CAP} * r.n_tok)
      FROM rec JOIN ranked r ON r.rn = rec.stp + 1
    )
    SELECT r.lang, r.n_tok, rec.alloc AS alloc_tok,
           rec.alloc * 1000000 // r.n_tok AS epochs_ppm
    FROM rec JOIN ranked r ON r.rn = rec.stp
    WHERE rec.stp >= 1
"""


@register("unimax_language_budget", _UNIMAX_ORACLE)
def unimax_language_budget(spark, sf_dir):
    """UniMax language sampling (Chung et al. 2023, Alg. 1): languages
    sorted ascending by token count; each takes
    min(remaining_budget / langs_left, epoch_cap * n_tok) and the
    remainder waterfalls to larger languages. Committed B = 2x corpus
    tokens, cap = 3 epochs — both data-derived so the outcome (which
    languages hit the cap vs the equal share) is meaningful at every SF.
    One per-lang agg, then the bounded sequential waterfall in a single
    grouped-pandas fold (exact ints), hash-matched by a recursive-CTE
    oracle stepping the identical arithmetic. Scale shape: one corpus
    agg; the fold touches only |langs| rows."""
    d = _t(spark, sf_dir, "documents")
    lt = d.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tok")
    )
    return (
        lt.withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandas(
            lambda pdf: _unimax_fold(pdf),
            schema="lang string, n_tok long, alloc_tok long, epochs_ppm long",
        )
    )


# ---------------------------------------------------------------------------
# DoReMi-style multiplicative-weights domain reweighting.
# ---------------------------------------------------------------------------

_DM_ITERS = 8  # committed multiplicative-weights iterations
_DM_ETA = "1.0"  # committed step size (exact double literal, same text)


def _doremi_fold(pdf):
    """Multiplicative-weights iterations in plain CPython floats —
    bit-identical to the recursive-CTE oracle: same smoothed-count
    probabilities, same LN/EXP (libm parity), same ascending fold orders
    (domains by source rank, words by word rank)."""
    import math

    import pandas as pd

    srcs = sorted(set(pdf["src"].tolist()))
    words = sorted(set(pdf["w"].tolist()))
    di = {s: i for i, s in enumerate(srcs)}
    wi = {w: i for i, w in enumerate(words)}
    dd, vv = len(srcs), len(words)
    c = [[0] * vv for _ in range(dd)]
    for s, w, k in zip(pdf["src"].tolist(), pdf["w"].tolist(),
                       pdf["c"].tolist()):
        c[di[s]][wi[w]] = int(k)
    n = [sum(c[d]) for d in range(dd)]
    eta = float(_DM_ETA)

    def pd_(d, w):
        return float(c[d][w] + 1) / float(n[d] + vv)

    s = [1.0 / float(dd)] * dd
    for _ in range(_DM_ITERS):
        u = []
        for d in range(dd):
            excess = 0.0
            for w in range(vv):
                pmix = 0.0
                for e in range(dd):
                    pmix = pmix + s[e] * pd_(e, w)
                excess = excess + pd_(d, w) * math.log(pd_(d, w) / pmix)
            u.append(s[d] * math.exp(eta * excess))
        usum = 0.0
        for x in u:
            usum = usum + x
        s = [u[d] / usum for d in range(dd)]
    total = sum(n)
    return pd.DataFrame(
        {
            "source": srcs,
            "tok": [n[di[s_]] for s_ in srcs],
            "share_ppm": [n[di[s_]] * 1000000 // total for s_ in srcs],
            "weight_nano": [
                math.floor(s[di[s_]] * 1000000000.0) for s_ in srcs
            ],
        }
    )


def _doremi_oracle() -> str:
    pd_of = (
        "CAST(cl[CAST({d} * vv.v + {w} + 1 AS BIGINT)] + 1 AS DOUBLE)"
        " / CAST(nl[CAST({d} + 1 AS BIGINT)] + vv.v AS DOUBLE)"
    )
    pmix = (
        "list_reduce(list_prepend(0.0, list_transform(range(dm.d), e -> "
        + "s[CAST(e + 1 AS BIGINT)] * " + pd_of.format(d="e", w="w")
        + ")), (a, b) -> a + b)"
    )
    excess = (
        "list_reduce(list_prepend(0.0, list_transform(range(vv.v), w -> "
        + pd_of.format(d="{d}", w="w")
        + " * LN(" + pd_of.format(d="{d}", w="w") + " / " + pmix + ")"
        + ")), (a, b) -> a + b)"
    )
    u_expr = (
        "list_transform(range(dm.d), d -> s[CAST(d + 1 AS BIGINT)]"
        f" * EXP({_DM_ETA} * " + excess.format(d="d") + "))"
    )
    return f"""
    WITH cnts AS MATERIALIZED (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT source, unnest(string_split(text, ' ')) AS w
            FROM documents)
      GROUP BY source, w
    ),
    si AS MATERIALIZED (
      SELECT source, ROW_NUMBER() OVER (ORDER BY source) - 1 AS ix
      FROM (SELECT DISTINCT source FROM cnts)
    ),
    wv AS MATERIALIZED (
      SELECT w, ROW_NUMBER() OVER (ORDER BY w) - 1 AS ix
      FROM (SELECT DISTINCT w FROM cnts)
    ),
    dm AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM si),
    vv AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM wv),
    dense AS MATERIALIZED (
      SELECT si.ix AS di, wv.ix AS wj, COALESCE(cnts.c, 0) AS c
      FROM si CROSS JOIN wv
      LEFT JOIN cnts ON cnts.source = si.source AND cnts.w = wv.w
    ),
    cmat AS (
      SELECT list(c ORDER BY di * (SELECT v FROM vv) + wj) AS cl FROM dense
    ),
    nmat AS (
      SELECT list(tn ORDER BY di) AS nl
      FROM (SELECT di, CAST(SUM(c) AS BIGINT) AS tn FROM dense GROUP BY di)
    ),
    it AS (
      WITH RECURSIVE rec(k, s) AS (
        SELECT 0, list_transform(range(dm.d),
                                 i -> CAST(1.0 AS DOUBLE)
                                      / CAST(dm.d AS DOUBLE))
        FROM dm
        UNION ALL
        SELECT k + 1,
               list_transform(range(du), d -> u[CAST(d + 1 AS BIGINT)]
                 / list_reduce(list_prepend(0.0, u), (a, b) -> a + b))
        FROM (
          SELECT k, dm.d AS du, {u_expr} AS u
          FROM rec, cmat, nmat, dm, vv
          WHERE k < {_DM_ITERS}
        )
      )
      SELECT s FROM rec WHERE k = {_DM_ITERS}
    ),
    tt AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM dense)
    SELECT si.source,
           CAST(nm.tn AS BIGINT) AS tok,
           nm.tn * 1000000 // tt.t AS share_ppm,
           CAST(FLOOR((SELECT s FROM it)[CAST(si.ix + 1 AS BIGINT)]
                      * 1000000000.0) AS BIGINT) AS weight_nano
    FROM si
    JOIN (SELECT di, CAST(SUM(c) AS BIGINT) AS tn FROM dense GROUP BY di) nm
      ON nm.di = si.ix, tt
    """


@register("doremi_domain_weights", _doremi_oracle())
def doremi_domain_weights(spark, sf_dir):
    """DoReMi-style domain reweighting (Xie et al. 2023): each source is a
    domain; its "excess loss" against the current mixture is
    KL(domain unigram LM || mixture unigram LM) over add-1-smoothed word
    distributions; weights update multiplicatively
    (w <- w * exp(eta * excess), renormalized) for 8 committed iterations,
    upweighting domains the mixture models worst — the group-DRO flavor of
    the paper with the unigram LM standing in for the proxy model. The
    (sources x vocab) count matrix is built distributed and exact-integer;
    the bounded 20x31 iteration runs in ONE grouped-pandas fold
    (CPython floats, committed ascending fold orders), hash-matched by a
    recursive-CTE oracle carrying the weight LIST and computing each
    step's unnormalized update once in a derived table (probed: DuckDB
    allows the recursive reference inside the subquery). Scale shape:
    one token-count agg; everything after is O(|sources| x |vocab|),
    corpus-size-free."""
    d = _t(spark, sf_dir, "documents")
    cnts = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return (
        cnts.select(F.col("source").alias("src"), "w", "c")
        .withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandas(
            lambda pdf: _doremi_fold(pdf),
            schema="source string, tok long, share_ppm long, weight_nano long",
        )
    )


# ---------------------------------------------------------------------------
# Exact best-of-n reward estimator.
# ---------------------------------------------------------------------------

_BON_NS = (1, 2, 4, 8)  # committed n grid


def _bon_weight_sql(n: int) -> str:
    """C(i-1,n-1)/C(N,n) = n * prod_{j=1}^{n-1}(i-j) / prod_{j=0}^{n-1}(N-j)
    as an explicit product of exact-integer casts — identical text both
    engines (the pass@k product-of-fractions discipline). Zero factors make
    the weight vanish for i < n, so no special-casing."""
    num = " * ".join(
        [f"CAST({n} AS DOUBLE)"]
        + [f"CAST(i - {j} AS DOUBLE)" for j in range(1, n)]
    )
    den = " * ".join(f"CAST(nn - {j} AS DOUBLE)" for j in range(n))
    return f"(({num}) / ({den}))"


def _bon_term_sql() -> str:
    branches = " ".join(
        f"WHEN n = {n} THEN CAST(FLOOR({_bon_weight_sql(n)}"
        " * CAST(r AS DOUBLE) * 1000000000) AS BIGINT)"
        for n in _BON_NS
    )
    return f"CASE {branches} END"


_BON_ORACLE = f"""
    WITH d AS (
      SELECT source,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               * 100
             + CAST(len(string_split(text, ' ')) AS BIGINT) % 100 AS r,
             doc_id
      FROM documents
    ),
    ranked AS MATERIALIZED (
      SELECT source, r,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY r, doc_id)
               AS i,
             CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS nn
      FROM d
    ),
    g AS (
      SELECT ranked.*, CAST(gn.n AS BIGINT) AS n
      FROM ranked
      CROSS JOIN (SELECT unnest([{', '.join(str(n) for n in _BON_NS)}]) AS gn)
        gn(n)
      WHERE gn.n <= ranked.nn
    )
    SELECT source, n, CAST(ANY_VALUE(nn) AS BIGINT) AS n_samples,
           CAST(SUM({_bon_term_sql()}) AS BIGINT) AS bon_nano
    FROM g
    GROUP BY source, n
"""


@register("best_of_n_reward", _BON_ORACLE)
def best_of_n_reward(spark, sf_dir):
    """Exact unbiased best-of-n estimator (Nakano et al. 2021, WebGPT
    App. I; the standard BoN-policy evaluation): with each source's docs
    as the N candidate samples and a committed integer reward
    (100 * distinct-words + token-count % 100),
    E[max reward of n uniform draws without replacement]
    = sum_i C(i-1,n-1)/C(N,n) * r_(i) over the ascending (reward, doc_id)
    order. The combinatorial weight is a product of <= 2n-1 exact-integer
    fractions evaluated in DOUBLE (identical text both engines — the
    pass@k discipline) and every term is floored to nanos BEFORE the sum,
    so parallel summation cannot decide the value. Scale shape: one
    per-source window rank (partitioned — never global), a 4x bounded
    grid explode, one agg."""
    d = _t(spark, sf_dir, "documents").select(
        "source",
        (
            F.size(F.array_distinct(F.split("text", " "))).cast("long") * 100
            + F.size(F.split("text", " ")).cast("long") % 100
        ).alias("r"),
        "doc_id",
    )
    w = Window.partitionBy("source").orderBy("r", "doc_id")
    ranked = d.select(
        "source",
        "r",
        F.row_number().over(w).cast("long").alias("i"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .cast("long")
        .alias("nn"),
    )
    g = ranked.select(
        "source",
        "r",
        "i",
        "nn",
        F.explode(F.array(*[F.lit(n).cast("long") for n in _BON_NS])).alias(
            "n"
        ),
    ).where(F.col("n") <= F.col("nn"))
    return g.groupBy("source", "n").agg(
        F.any_value("nn").cast("long").alias("n_samples"),
        F.sum(F.expr(_bon_term_sql())).cast("long").alias("bon_nano"),
    )


# ---------------------------------------------------------------------------
# Bellman-Ford weighted shortest paths over the nation trade graph.
# ---------------------------------------------------------------------------

_BF_ITERS = 6  # committed relaxation rounds (>= graph diameter here)
_BF_INF = 10**15  # unreachable sentinel (finite + INF < 2^63)
_BF_SRC = 0  # committed source nation key


def _bf_oracle() -> str:
    return f"""
    WITH RECURSIVE nat AS MATERIALIZED (
      SELECT n_nationkey, n_name,
             ROW_NUMBER() OVER (ORDER BY n_nationkey) - 1 AS ix
      FROM nation
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM nat),
    edges AS MATERIALIZED (
      SELECT s.s_nationkey AS u, c.c_nationkey AS v,
             CAST(MIN(CAST(l.l_shipdate AS DATE)
                      - CAST(o.o_orderdate AS DATE)) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
        AND CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
      GROUP BY s.s_nationkey, c.c_nationkey
    ),
    src AS (SELECT ix AS si FROM nat WHERE n_nationkey = {_BF_SRC}),
    wmat AS (
      SELECT list(w ORDER BY ui * (SELECT m FROM m) + vi) AS wl
      FROM (
        SELECT a.ix AS ui, b.ix AS vi,
               COALESCE(e.w, {_BF_INF}) AS w
        FROM nat a CROSS JOIN nat b
        LEFT JOIN edges e ON e.u = a.n_nationkey AND e.v = b.n_nationkey
      )
    ),
    it AS (
      WITH RECURSIVE rec(k, dl) AS (
        SELECT 0, list_transform(range(m.m),
                 i -> CASE WHEN i = src.si
                           THEN CAST(0 AS BIGINT)
                           ELSE CAST({_BF_INF} AS BIGINT) END)
        FROM m, src
        UNION ALL
        SELECT k + 1,
               list_transform(range(m.m), v ->
                 list_reduce(
                   list_prepend(dl[CAST(v + 1 AS BIGINT)],
                     list_transform(range(m.m), u ->
                       dl[CAST(u + 1 AS BIGINT)]
                       + wl[CAST(u * m.m + v + 1 AS BIGINT)])),
                   (a, b) -> LEAST(a, b)))
        FROM rec, wmat, m
        WHERE k < {_BF_ITERS}
      )
      SELECT dl FROM rec WHERE k = {_BF_ITERS}
    )
    SELECT nat.n_nationkey, nat.n_name,
           CASE WHEN (SELECT dl FROM it)[CAST(nat.ix + 1 AS BIGINT)]
                     >= {_BF_INF}
                THEN CAST(-1 AS BIGINT)
                ELSE (SELECT dl FROM it)[CAST(nat.ix + 1 AS BIGINT)] END
             AS dist_days
    FROM nat
    """


@register("bellman_ford_nation_days", _bf_oracle())
def bellman_ford_nation_days(spark, sf_dir):
    """Weighted single-source shortest paths (Bellman-Ford, {K} committed
    relaxation rounds) over the nation trade graph: edge u->v = some
    supplier in u shipped to some customer in v, weight = the minimum
    non-negative fulfillment latency in days (ship date minus order date;
    this synthetic corpus has negative gaps too, which are excluded so
    edge weights stay non-negative — exact integers). The
    weighted twin of graph_bfs_3hop. Spark side relaxes a bounded
    |nations|-row distance frame against the aggregated edge list per
    round (union + min-agg — the pagerank-style bounded iteration);
    the oracle is a recursive CTE carrying the distance LIST over a dense
    INF-sentinel edge matrix (LEAST-fold relaxation). INF = 10^15 keeps
    finite+INF inside int64. Scale shape: one fact-scale edge agg; the
    iteration is O(nations^2) per round, corpus-size-free.""".replace(
        "{K}", str(_BF_ITERS)
    )
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .where(
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            )
            >= 0
        )
        .groupBy(
            F.col("s_nationkey").alias("u"), F.col("c_nationkey").alias("v")
        )
        .agg(
            F.min(
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.col("o_orderdate").cast("date"),
                )
            )
            .cast("long")
            .alias("w")
        )
    )
    dist = nat.select(
        F.col("n_nationkey").alias("node"),
        F.when(F.col("n_nationkey") == _BF_SRC, F.lit(0))
        .otherwise(F.lit(_BF_INF))
        .cast("long")
        .alias("d"),
    )
    for _ in range(_BF_ITERS):
        relax = (
            dist.join(F.broadcast(edges), dist["node"] == edges["u"])
            .select(F.col("v").alias("node"), (F.col("d") + F.col("w")).alias("d"))
        )
        dist = (
            dist.unionByName(relax)
            .groupBy("node")
            .agg(F.min("d").cast("long").alias("d"))
        )
    return nat.join(dist, nat["n_nationkey"] == dist["node"]).select(
        "n_nationkey",
        "n_name",
        F.when(F.col("d") >= _BF_INF, F.lit(-1))
        .otherwise(F.col("d"))
        .cast("long")
        .alias("dist_days"),
    )
