"""Round-9 sixth wave: training-run planning, sampling diagnostics,
calibration, and a dedup-ensemble measurement (each a named published
recipe absent from the registry):

- chinchilla_data_budget: the compute-optimal 20-tokens-per-parameter
  rule (Hoffmann et al. 2022) applied to THIS corpus — per committed
  model size: tokens needed, repeats of the corpus required
  (data-constrained regime, cf. Muennighoff et al. 2023), and training
  FLOPs (6ND) — the planning table every pretraining run starts from.
- importance_weight_ess: Kish/Kong effective sample size of the
  SoftDeDup sampling weights per source — ESS = (sum w)^2 / sum w^2, THE
  standard diagnostic for whether importance weights have degenerated.
- temperature_scaling_grid: post-hoc calibration by temperature search
  (Guo et al. 2017): NLL of the committed (label, score) classifier at a
  committed temperature grid, with the argmin flagged.
- dedup_signal_agreement: ensemble agreement matrix of three near-dup
  signals on the SAME candidate universe (MinHash-LSH candidates):
  exact-Jaccard >= 50%, signature-estimate >= 50%, SimHash Hamming <= 3
  — the measurement behind "which dedup signal do we trust".

Integer discipline (CLAUDE.md): FLOPs products exceed int64 -> engine-
split int128 idiom (Spark DECIMAL(38,0) div / DuckDB HUGEINT //); ESS is
an exact-integer cross-multiplication; every LN/EXP term is floored to
nanos elementwise before summation; threshold comparisons are integer
cross-multiplications.

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's LLM-pipeline axis.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.dedup.minhash import lsh_candidate_pairs, signatures_from_shingles
from hpmr_spark.dedup.shingles import SQL_SHINGLE_CTE, shingle_sets
from hpmr_spark.dedup.simhash import HAM_MAX
from hpmr_spark.functions.hashing import MINHASH_A, MINHASH_B, N_PERM, P32, sql_hash60

# ---------------------------------------------------------------------------
# Chinchilla compute-optimal data budget for THIS corpus.
# ---------------------------------------------------------------------------

_CHIN_SIZES = (10**8, 10**9, 10**10, 10**11)  # committed model sizes (params)
_CHIN_TPP = 20  # committed tokens-per-parameter (Hoffmann et al. 2022)


_CHIN_ORACLE = f"""
    WITH corpus AS (
      SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS d
      FROM documents
    )
    SELECT CAST(g.n AS BIGINT) AS params,
           CAST({_CHIN_TPP} AS BIGINT) * g.n AS tokens_needed,
           corpus.d AS corpus_tokens,
           ({_CHIN_TPP} * g.n + corpus.d - 1) // corpus.d AS repeats_needed,
           CAST(CAST(6 AS HUGEINT) * g.n * ({_CHIN_TPP} * g.n)
                // CAST(1000000000000000 AS HUGEINT) AS BIGINT)
             AS flops_e15
    FROM corpus
    CROSS JOIN (SELECT unnest([{', '.join(str(n) for n in _CHIN_SIZES)}]) AS n) g
"""


@register("chinchilla_data_budget", _CHIN_ORACLE)
def chinchilla_data_budget(spark, sf_dir):
    """Compute-optimal data budgeting (Hoffmann et al. 2022): at the
    committed ~20-tokens-per-parameter rule, each candidate model size
    needs 20N training tokens; against THIS corpus that means
    ceil(20N / corpus_tokens) repeats (the data-constrained regime of
    Muennighoff et al. 2023 — read next to data_repeats_budget's
    diminishing-returns allocation), and 6ND training FLOPs (emitted in
    petaFLOPs: the raw product overflows int64, so it rides the int128
    engine-split idiom). One corpus agg; the grid is 4 literal rows."""
    d = _t(spark, sf_dir, "documents")
    corpus = d.agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("d")
    )
    g = corpus.select(
        "d",
        F.explode(
            F.array(*[F.lit(n).cast("long") for n in _CHIN_SIZES])
        ).alias("params"),
    )
    return g.select(
        "params",
        (F.lit(_CHIN_TPP).cast("long") * F.col("params")).alias(
            "tokens_needed"
        ),
        F.col("d").alias("corpus_tokens"),
        F.expr(f"({_CHIN_TPP} * params + d - 1) div d").alias(
            "repeats_needed"
        ),
        F.expr(
            f"CAST(CAST(6 AS DECIMAL(38,0)) * params * ({_CHIN_TPP} * params)"
            " div CAST(1000000000000000 AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("flops_e15"),
    )


# ---------------------------------------------------------------------------
# Effective sample size of the SoftDeDup importance weights.
# ---------------------------------------------------------------------------


def _ess_oracle() -> str:
    from hpmr_spark.operators.pretrain3_queries import SOFTDEDUP_W_CTES

    return (
        SOFTDEDUP_W_CTES
        + """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w_ppm) AS BIGINT) AS w_sum,
           CAST(CAST(SUM(w_ppm) AS HUGEINT) * CAST(SUM(w_ppm) AS HUGEINT)
                * 1000000
                // (CAST(COUNT(*) AS HUGEINT)
                    * CAST(SUM(w_ppm * w_ppm) AS HUGEINT))
                AS BIGINT) AS ess_ppm
    FROM w
    WHERE w_ppm > 0
    GROUP BY source
"""
    )


@register("importance_weight_ess", _ess_oracle())
def importance_weight_ess(spark, sf_dir):
    """Effective sample size of importance weights (Kish 1965; Kong 1992):
    ESS = (sum w)^2 / sum w^2, emitted as a ppm fraction of the source's
    doc count — 1e6 means the weights are uniform (no degeneration), small
    values mean a few documents dominate the resampled mixture. Applied to
    the SoftDeDup inverse-commonness weights per source (zero-weight docs
    — the most-common extreme — are excluded from the ratio by committed
    predicate; they contribute nothing to either sum). Exact-integer
    cross-multiplication in int128 (w sums reach 1e6 * n_docs). Scale
    shape: the SoftDeDup per-doc pipeline plus one per-source agg."""
    from hpmr_spark.operators.pretrain3_queries import softdedup_doc_weights_df

    w = softdedup_doc_weights_df(_t(spark, sf_dir, "documents"))
    return (
        w.where(F.col("w_ppm") > 0)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("w_ppm").cast("long").alias("w_sum"),
            F.expr(
                "CAST(CAST(SUM(w_ppm) AS DECIMAL(38,0))"
                " * CAST(SUM(w_ppm) AS DECIMAL(38,0)) * 1000000"
                " div (CAST(COUNT(*) AS DECIMAL(38,0))"
                " * CAST(SUM(w_ppm * w_ppm) AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("ess_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-scaling calibration grid.
# ---------------------------------------------------------------------------

_TEMPS = ("0.5", "1.0", "2.0", "4.0")  # committed exact double literals

# p is the clamped score in ppm; lgt its logit; the NLL term is the
# numerically-direct softplus form ln(1 + exp(+-lgt/T)) — ONE committed
# text both engines, floored to nanos elementwise.
_TS_TERM = (
    "CAST(FLOOR(LN(1.0 + EXP(CASE WHEN y = 1 THEN 0.0 - (lgt / {t})"
    " ELSE (lgt / {t}) END)) * 1000000000) AS BIGINT)"
)
_TS_LGT = (
    "LN(CAST(GREATEST(LEAST(score_ppm, 999999), 1) AS DOUBLE))"
    " - LN(CAST(1000000 - GREATEST(LEAST(score_ppm, 999999), 1) AS DOUBLE))"
)


def _ts_oracle() -> str:
    from hpmr_spark.operators.mleval_queries import _SCORED_SQL

    branches = " ".join(
        f"WHEN t_milli = {int(float(t) * 1000)} THEN "
        + _TS_TERM.format(t=t)
        for t in _TEMPS
    )
    return f"""
    WITH s AS ({_SCORED_SQL}),
    l AS (SELECT y, {_TS_LGT} AS lgt FROM s),
    g AS (
      SELECT CAST(gt.t_milli AS BIGINT) AS t_milli, y, lgt
      FROM l CROSS JOIN (SELECT unnest([{', '.join(str(int(float(t) * 1000)) for t in _TEMPS)}]) AS t_milli) gt
    ),
    nll AS (
      SELECT t_milli,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE {branches} END) AS BIGINT)
               // CAST(COUNT(*) AS BIGINT) AS nll_mean_nano
      FROM g GROUP BY t_milli
    ),
    best AS (SELECT MIN(nll_mean_nano) AS b FROM nll)
    SELECT t_milli, n, nll_mean_nano,
           nll_mean_nano = best.b AS is_best
    FROM nll, best
"""


@register("temperature_scaling_grid", _ts_oracle())
def temperature_scaling_grid(spark, sf_dir):
    """Temperature scaling (Guo et al. 2017), the standard post-hoc
    calibration: rescale the classifier logit by 1/T and pick the T
    minimizing validation NLL. Over the registry's committed
    (label, score_ppm) classifier (mleval_queries._scored): logit =
    ln(p) - ln(1-p) on the clamped ppm score, per-example NLL in the
    softplus form ln(1 + exp(-+lgt/T)) floored to nanos elementwise
    (LN/EXP libm-parity commitment), mean by truncating division, argmin
    T flagged via a 1-row broadcast min. Scale shape: one projection,
    a 4x bounded grid, one agg."""
    from hpmr_spark.operators.mleval_queries import _scored

    s = _scored(spark, sf_dir)
    l = s.select("y", F.expr(_TS_LGT).alias("lgt"))
    g = l.select(
        "y",
        "lgt",
        F.explode(
            F.array(
                *[F.lit(int(float(t) * 1000)).cast("long") for t in _TEMPS]
            )
        ).alias("t_milli"),
    )
    branches = None
    for t in _TEMPS:
        cond = F.col("t_milli") == int(float(t) * 1000)
        term = F.expr(_TS_TERM.format(t=t))
        branches = (
            F.when(cond, term) if branches is None else branches.when(cond, term)
        )
    nll = (
        g.groupBy("t_milli")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(branches).cast("long").alias("_s"),
        )
        .select(
            "t_milli",
            "n",
            F.expr("_s div n").alias("nll_mean_nano"),
        )
    )
    best = nll.agg(F.min("nll_mean_nano").alias("b"))
    return nll.crossJoin(F.broadcast(best)).select(
        "t_milli",
        "n",
        "nll_mean_nano",
        (F.col("nll_mean_nano") == F.col("b")).alias("is_best"),
    )


# ---------------------------------------------------------------------------
# Dedup-signal agreement matrix on the LSH candidate universe.
# ---------------------------------------------------------------------------

_AGREE_JAC_PCT = 50  # committed exact/estimate Jaccard threshold (percent)


def _agree_oracle() -> str:
    h32 = f"({sql_hash60('_s')} % {P32})"
    sig_exprs = ", ".join(
        f"list_min(list_transform(h32, _h -> ({MINHASH_A[j]} * _h"
        f" + {MINHASH_B[j]}) % {P32}))"
        for j in range(N_PERM)
    )
    band_pred = " OR ".join(
        f"(a.sig[{2 * bi + 1}] = b.sig[{2 * bi + 1}]"
        f" AND a.sig[{2 * bi + 2}] = b.sig[{2 * bi + 2}])"
        for bi in range(N_PERM // 2)
    )
    matches = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(range({N_PERM}), j ->"
        " CASE WHEN a.sig[CAST(j + 1 AS BIGINT)]"
        " = b.sig[CAST(j + 1 AS BIGINT)]"
        " THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),"
        " (x, y) -> x + y)"
    )
    # 60-bit SimHash from the same shingle sets (hash60 has exactly 60
    # bits; bit 60+ is always 0 and 1<<63 would overflow int64): bit k set
    # iff the sum of +-1 over shingles (sign of bit k) is positive
    simbit = (
        "list_transform(range(60), k -> CASE WHEN"
        " list_reduce(list_prepend(CAST(0 AS BIGINT),"
        " list_transform(h60, _h -> CASE WHEN (_h // (CAST(1 AS BIGINT)"
        " << CAST(k AS INTEGER))) % 2 = 1 THEN CAST(1 AS BIGINT)"
        " ELSE CAST(-1 AS BIGINT) END)), (x, y) -> x + y) > 0"
        " THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    )
    ham = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT),"
        " list_transform(range(60), k -> CASE WHEN"
        " a.simv[CAST(k + 1 AS BIGINT)] <> b.simv[CAST(k + 1 AS BIGINT)]"
        " THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),"
        " (x, y) -> x + y)"
    )
    return f"""
    WITH {SQL_SHINGLE_CTE},
    sigs AS MATERIALIZED (
      SELECT doc_id, sh, [{sig_exprs}] AS sig, {simbit} AS simv
      FROM (SELECT doc_id, sh,
                   list_transform(sh, _s -> {h32}) AS h32,
                   list_transform(sh, _s -> {sql_hash60('_s')}) AS h60
            FROM shingled)
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             100 * len(list_intersect(a.sh, b.sh))
               >= {_AGREE_JAC_PCT} * (len(a.sh) + len(b.sh)
                                      - len(list_intersect(a.sh, b.sh)))
               AS sig_exact,
             100 * {matches} >= {_AGREE_JAC_PCT} * {N_PERM} AS sig_est,
             {ham} <= {HAM_MAX} AS sig_simhash
      FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id AND ({band_pred})
    )
    SELECT sig_exact, sig_est, sig_simhash,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs
    GROUP BY sig_exact, sig_est, sig_simhash
"""


@register("dedup_signal_agreement", _agree_oracle())
def dedup_signal_agreement(spark, sf_dir):
    """Which near-dup signal do we trust? On ONE candidate universe (the
    committed MinHash-LSH banding), the 2x2x2 agreement matrix of three
    standard signals: exact shingle-Jaccard >= 50% (integer
    cross-multiplication), MinHash signature estimate >= 50% (matching
    permutations), and 60-bit SimHash Hamming <= 3 — the SimHash built
    from the SAME shingle sets (sign-sum of each hash60 bit), so the
    matrix isolates signal disagreement, not featurization drift. The
    ensemble-measurement row behind choosing a production dedup signal.
    Scale shape: map-only signatures/simhash, one banded candidate join
    (merge-pinned), per-pair integer predicates, one 8-row agg."""
    docs = _t(spark, sf_dir, "documents")
    sh = shingle_sets(docs)
    sigs = signatures_from_shingles(sh)
    sig_arr = F.array(*[F.col(f"sig_{j}") for j in range(N_PERM)])
    simv = F.expr(
        "transform(sequence(0, 59), k -> CASE WHEN"
        " aggregate(transform(h60, _h -> CASE WHEN (_h div shiftleft(1L,"
        " CAST(k AS INT))) % 2 = 1 THEN 1L ELSE -1L END),"
        " 0L, (x, y) -> x + y) > 0 THEN 1L ELSE 0L END)"
    )
    from hpmr_spark.functions.hashing import spark_sql_hash60

    feats = sh.select(
        "doc_id",
        "sh",
        F.expr(
            f"transform(sh, _s -> {spark_sql_hash60('_s')})"
        ).alias("h60"),
    ).select("doc_id", "sh", simv.alias("simv"))
    cands = lsh_candidate_pairs(sigs)
    sa = sigs.select(F.col("doc_id").alias("doc_a"), sig_arr.alias("siga"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), sig_arr.alias("sigb"))
    fa = feats.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sha"),
        F.col("simv").alias("simva"),
    )
    fb = feats.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("shb"),
        F.col("simv").alias("simvb"),
    )
    j = (
        cands.join(sa.hint("merge"), "doc_a")
        .join(sb.hint("merge"), "doc_b")
        .join(fa.hint("merge"), "doc_a")
        .join(fb.hint("merge"), "doc_b")
    )
    pairs = j.select(
        F.expr(
            "100 * size(array_intersect(sha, shb))"
            f" >= {_AGREE_JAC_PCT} * (size(sha) + size(shb)"
            " - size(array_intersect(sha, shb)))"
        ).alias("sig_exact"),
        F.expr(
            "100 * aggregate(zip_with(siga, sigb, (x, y) ->"
            " CASE WHEN x = y THEN 1L ELSE 0L END), 0L, (a, t) -> a + t)"
            f" >= {_AGREE_JAC_PCT} * {N_PERM}"
        ).alias("sig_est"),
        F.expr(
            "aggregate(zip_with(simva, simvb, (x, y) ->"
            " CASE WHEN x <> y THEN 1L ELSE 0L END), 0L, (a, t) -> a + t)"
            f" <= {HAM_MAX}"
        ).alias("sig_simhash"),
    )
    return pairs.groupBy("sig_exact", "sig_est", "sig_simhash").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
