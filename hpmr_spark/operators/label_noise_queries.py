"""Round-13 wave B: training-dynamics / label-noise data-quality operators
over the embeddings table (vec_id, label ∈ 0..9) — the data-map /
noise-audit passes a curation pipeline runs between training rounds. All
model scores are COMMITTED integer-ppm pseudo-probabilities derived from
md5 arithmetic (the cross-engine synthetic-corpus discipline, r8): the
operators demonstrate the exact pipeline shape and are bit-checkable in
both engines; swapping in real model outputs changes only the score
column.

- confident_learning_noise_census: Confident Learning (Northcutt, Jiang
  & Chuang, JAIR 2021): per-class thresholds t_j = mean_{x: ỹ=j} p_j(x)
  (integer mean: sum div count), then the confident-joint count matrix
  C[i][j] = |{x ∈ X_i : j = argmax_{k: p_k(x) ≥ t_k} p_k(x)}| — examples
  whose every class score falls below its threshold are skipped, exactly
  as in the paper. Off-diagonal mass estimates label noise. The
  committed scores plant ~20% systematic noise (the latent class is
  (label+1) mod 10 for hash-selected examples), so the off-diagonal is
  structurally non-vacuous.
- dataset_cartography_map: Data Maps (Swayamdipta et al., EMNLP 2020):
  per-example confidence (mean over 8 epochs of the true-class score)
  and variability (exact integer second moment: 8·Σp² − (Σp)²), plus
  the correctness count (epochs with p_true > 0.5, the binary-correct
  variant — documented deviation from the argmax form to keep the pass
  one-scan) and the easy/ambiguous/hard region split used to target
  curation.
- forgetting_events_census: Forgetting Events (Toneva et al., ICLR
  2019): per example, count correct→incorrect transitions across the
  8-epoch correctness sequence (an in-row fold over the epoch bits);
  per-label census of never-learned / unforgettable (learned, zero
  forgets) / forgotten examples — the forgetting-based pruning signal.

Scale: every operator is one scan of embeddings × a bounded explode
(10 classes or 8 epochs) + hash-partitioned aggs — linear, no windows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.hashing import spark_sql_hash60, sql_hash60

_CL_NCLS = 10  # embeddings carry labels 0..9 (verified r11)
_DC_EPOCHS = 8


# ---------------------------------------------------------------- helpers
# committed pseudo-probability texts, one per engine ({vid}/{c}/{e} are
# SQL column references):


def _noisy_latent(hash60_fn, vid: str, label: str) -> str:
    """The latent 'model-visible' class: equals the noisy label for 80%
    of examples (committed hash gate), (label+1) mod 10 for the rest."""
    g = hash60_fn(f"'clt:' || CAST({vid} AS STRING)")
    return (
        f"CASE WHEN {g} % 5 < 4 THEN {label}"
        f" ELSE ({label} + 1) % {_CL_NCLS} END"
    )


def _p_ppm(hash60_fn, vid: str, c: str, t: str) -> str:
    """Score of class c for example vid: base hash ppm (< 400000) plus a
    600000 boost on the latent class t — argmax is always t, but the
    sub-threshold gating still decides membership per CL."""
    b = hash60_fn(
        f"'cl:' || CAST({vid} AS STRING) || ':' || CAST({c} AS STRING)"
    )
    return f"({b} % 400000 + CASE WHEN {c} = {t} THEN 600000 ELSE 0 END)"


def _p_true_ppm(hash60_fn, vid: str, e: str) -> str:
    """True-class score of example vid at epoch e: difficulty class
    diff = hash % 3 → easy (650k + hash%300k), hard (hash%300k),
    ambiguous (hash%1000k — swings across epochs)."""
    d = hash60_fn(f"'dcd:' || CAST({vid} AS STRING)")
    q = hash60_fn(
        f"'dc:' || CAST({vid} AS STRING) || ':' || CAST({e} AS STRING)"
    )
    return (
        f"(CASE WHEN {d} % 3 = 0 THEN 650000 + {q} % 300000"
        f" WHEN {d} % 3 = 2 THEN {q} % 300000"
        f" ELSE {q} % 1000000 END)"
    )


# --------------------------------------------- confident learning census

_CL_ORACLE = f"""
    WITH ex AS (
      SELECT vec_id, label AS y,
             {_noisy_latent(sql_hash60, 'vec_id', 'label')} AS t
      FROM embeddings
    ),
    pc AS (
      SELECT vec_id, y, c,
             {_p_ppm(sql_hash60, 'vec_id', 'c', 't')} AS p
      FROM (SELECT vec_id, y, t, unnest(range(0, {_CL_NCLS})) AS c FROM ex)
    ),
    th AS MATERIALIZED (
      SELECT c, CAST(SUM(p) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS thr
      FROM pc WHERE c = y GROUP BY c
    ),
    gated AS (
      SELECT pc.vec_id, pc.y, pc.p, pc.c
      FROM pc JOIN th ON th.c = pc.c WHERE pc.p >= th.thr
    ),
    star AS (
      SELECT vec_id, y, MAX({{'p': p, 'negc': 0 - c}}) AS m
      FROM gated GROUP BY vec_id, y
    ),
    joint AS (
      SELECT y, 0 - (m).negc AS j, CAST(COUNT(*) AS BIGINT) AS n
      FROM star GROUP BY y, 0 - (m).negc
    ),
    grid AS (
      SELECT a.i AS y_noisy, b.j AS y_pred
      FROM (SELECT unnest(range(0, {_CL_NCLS})) AS i) a
      CROSS JOIN (SELECT unnest(range(0, {_CL_NCLS})) AS j) b
    )
    SELECT g.y_noisy, g.y_pred,
           CAST(COALESCE(jt.n, 0) AS BIGINT) AS n,
           (g.y_noisy <> g.y_pred AND COALESCE(jt.n, 0) > 0)
             AS is_noise_cell
    FROM grid g LEFT JOIN joint jt
      ON jt.y = g.y_noisy AND jt.j = g.y_pred
"""


@register("confident_learning_noise_census", _CL_ORACLE)
def confident_learning_noise_census(spark, sf_dir):
    """Confident-joint count matrix (Northcutt et al. 2021) — see module
    docstring. Emits the full {_CL_NCLS}×{_CL_NCLS} grid (stable schema;
    zero cells included); is_noise_cell flags populated off-diagonal
    cells. Thresholds are integer means (sum div count) so the gate is
    engine-exact; argmax over gated classes tie-breaks (p, -c) via
    struct max."""
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id",
        F.col("label").alias("y"),
        F.expr(_noisy_latent(spark_sql_hash60, "vec_id", "label")).alias("t"),
    )
    pc = ex.select(
        "vec_id",
        "y",
        F.explode(F.expr(f"sequence(0, {_CL_NCLS - 1})")).alias("c"),
        "t",
    ).select(
        "vec_id",
        "y",
        "c",
        F.expr(_p_ppm(spark_sql_hash60, "vec_id", "c", "t")).alias("p"),
    )
    th = (
        pc.where(F.col("c") == F.col("y"))
        .groupBy("c")
        .agg(F.expr("CAST(SUM(p) AS BIGINT) div COUNT(*)").alias("thr"))
    )
    star = (
        pc.join(F.broadcast(th), "c")
        .where(F.col("p") >= F.col("thr"))
        .groupBy("vec_id", "y")
        .agg(F.max(F.struct(F.col("p"), (-F.col("c")).alias("negc"))).alias("m"))
        .select("y", (-F.col("m.negc")).alias("j"))
    )
    joint = star.groupBy("y", "j").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    grid = (
        spark.range(_CL_NCLS)
        .select(F.col("id").alias("y_noisy"))
        .crossJoin(
            spark.range(_CL_NCLS).select(F.col("id").alias("y_pred"))
        )
    )
    return grid.join(
        joint,
        (joint.y == grid.y_noisy) & (joint.j == grid.y_pred),
        "left",
    ).select(
        "y_noisy",
        "y_pred",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        (
            (F.col("y_noisy") != F.col("y_pred"))
            & (F.coalesce("n", F.lit(0)) > 0)
        ).alias("is_noise_cell"),
    )


confident_learning_noise_census.__doc__ = (
    confident_learning_noise_census.__doc__.replace(
        "{_CL_NCLS}", str(_CL_NCLS)
    )
)


# --------------------------------------------------- dataset cartography

# region cuts (probed at sf0.01 for non-vacuity: the three difficulty
# classes land ~33/33/33 by construction; the cuts sit between the class
# means): conf ≥ 550000 & low var → easy; conf < 450000 & low var → hard;
# everything else (incl. all high-var examples) → ambiguous
_DC_VAR_CUT = 850_000_000_000  # 8·Σp² − (Σp)² cut (probed at sf0.01:
# easy/hard classes max 8.2e11, ambiguous class min 8.6e11 — the cut
# sits in the gap; regions split ~1/3 each)


_DC_ORACLE = f"""
    WITH pe AS (
      SELECT vec_id, label,
             {_p_true_ppm(sql_hash60, 'vec_id', 'e')} AS p
      FROM (SELECT vec_id, label, unnest(range(0, {_DC_EPOCHS})) AS e
            FROM embeddings)
    ),
    m AS (
      SELECT vec_id, CAST(MAX(label) AS BIGINT) AS label,
             CAST(SUM(p) AS BIGINT) AS s1,
             CAST(SUM(p * p) AS BIGINT) AS s2,
             CAST(SUM(CASE WHEN p > 500000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct
      FROM pe GROUP BY vec_id
    )
    SELECT vec_id, label,
           s1 // {_DC_EPOCHS} AS conf_ppm,
           {_DC_EPOCHS} * s2 - s1 * s1 AS var_scaled,
           n_correct,
           CASE WHEN {_DC_EPOCHS} * s2 - s1 * s1 < {_DC_VAR_CUT}
                     AND s1 // {_DC_EPOCHS} >= 550000 THEN 'easy'
                WHEN {_DC_EPOCHS} * s2 - s1 * s1 < {_DC_VAR_CUT}
                     AND s1 // {_DC_EPOCHS} < 450000 THEN 'hard'
                ELSE 'ambiguous' END AS region
    FROM m
"""


@register("dataset_cartography_map", _DC_ORACLE)
def dataset_cartography_map(spark, sf_dir):
    """Data-map coordinates per example (Swayamdipta et al. 2020) — see
    module docstring. Confidence = Σp div E (integer mean of the
    true-class score over E={_DC_EPOCHS} epochs), variability image =
    E·Σp² − (Σp)² (exact integer, ∝ variance·E²), correctness = #epochs
    with p > 0.5. Region split by committed probed cuts."""
    e = _t(spark, sf_dir, "embeddings")
    pe = e.select(
        "vec_id",
        "label",
        F.explode(F.expr(f"sequence(0, {_DC_EPOCHS - 1})")).alias("e"),
    ).select(
        "vec_id",
        "label",
        F.expr(_p_true_ppm(spark_sql_hash60, "vec_id", "e")).alias("p"),
    )
    m = pe.groupBy("vec_id").agg(
        F.max("label").cast("long").alias("label"),
        F.sum("p").cast("long").alias("s1"),
        F.sum(F.expr("p * p")).cast("long").alias("s2"),
        F.sum(F.expr("CASE WHEN p > 500000 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_correct"),
    )
    return m.select(
        "vec_id",
        "label",
        F.expr(f"s1 div {_DC_EPOCHS}").alias("conf_ppm"),
        F.expr(f"{_DC_EPOCHS} * s2 - s1 * s1").alias("var_scaled"),
        "n_correct",
        F.expr(
            f"CASE WHEN {_DC_EPOCHS} * s2 - s1 * s1 < {_DC_VAR_CUT}"
            f" AND s1 div {_DC_EPOCHS} >= 550000 THEN 'easy'"
            f" WHEN {_DC_EPOCHS} * s2 - s1 * s1 < {_DC_VAR_CUT}"
            f" AND s1 div {_DC_EPOCHS} < 450000 THEN 'hard'"
            f" ELSE 'ambiguous' END"
        ).alias("region"),
    )


dataset_cartography_map.__doc__ = dataset_cartography_map.__doc__.replace(
    "{_DC_EPOCHS}", str(_DC_EPOCHS)
)


# ------------------------------------------------ forgetting events

_FG_ORACLE = f"""
    WITH pe AS (
      SELECT vec_id, label, e,
             CASE WHEN {_p_true_ppm(sql_hash60, 'vec_id', 'e')} > 500000
                  THEN 1 ELSE 0 END AS ok
      FROM (SELECT vec_id, label, unnest(range(0, {_DC_EPOCHS})) AS e
            FROM embeddings)
    ),
    seq AS (
      SELECT vec_id, CAST(MAX(label) AS BIGINT) AS label,
             list(ok ORDER BY e) AS bits,
             CAST(SUM(ok) AS BIGINT) AS n_ok
      FROM pe GROUP BY vec_id
    ),
    f AS (
      SELECT vec_id, label, n_ok,
             CAST(list_sum(list_transform(range(1, {_DC_EPOCHS}),
               i -> CASE WHEN list_extract(bits, CAST(i AS INT)) = 1
                          AND list_extract(bits, CAST(i + 1 AS INT)) = 0
                         THEN 1 ELSE 0 END)) AS BIGINT) AS n_forgets
      FROM seq
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_examples,
           CAST(SUM(CASE WHEN n_ok = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_never_learned,
           CAST(SUM(CASE WHEN n_ok > 0 AND n_forgets = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_unforgettable,
           CAST(SUM(CASE WHEN n_forgets > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_forgotten,
           CAST(SUM(n_forgets) AS BIGINT) AS total_forget_events,
           CAST(MAX(n_forgets) AS BIGINT) AS max_forgets
    FROM f GROUP BY label
"""


@register("forgetting_events_census", _FG_ORACLE)
def forgetting_events_census(spark, sf_dir):
    """Per-label forgetting census (Toneva et al. 2019) — see module
    docstring. A forgetting event is a correct→incorrect transition in
    the 8-epoch correctness sequence; unforgettable = learned with zero
    forgets (the keep-forever pruning signal), never-learned = zero
    correct epochs."""
    e = _t(spark, sf_dir, "embeddings")
    pe = e.select(
        "vec_id",
        "label",
        F.explode(F.expr(f"sequence(0, {_DC_EPOCHS - 1})")).alias("e"),
    ).select(
        "vec_id",
        "label",
        "e",
        F.expr(
            f"CASE WHEN {_p_true_ppm(spark_sql_hash60, 'vec_id', 'e')}"
            " > 500000 THEN 1 ELSE 0 END"
        ).alias("ok"),
    )
    seq = pe.groupBy("vec_id").agg(
        F.max("label").cast("long").alias("label"),
        F.expr("transform(array_sort(collect_list(struct(e, ok))), p -> p.ok)")
        .alias("bits"),
        F.sum("ok").cast("long").alias("n_ok"),
    )
    f = seq.select(
        "vec_id",
        "label",
        "n_ok",
        F.expr(
            f"CAST(aggregate(sequence(1, {_DC_EPOCHS - 1}), 0,"
            " (acc, i) -> acc + CASE WHEN element_at(bits, i) = 1"
            " AND element_at(bits, i + 1) = 0 THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("n_forgets"),
    )
    return f.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_examples"),
        F.sum(F.expr("CASE WHEN n_ok = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_never_learned"),
        F.sum(F.expr("CASE WHEN n_ok > 0 AND n_forgets = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_unforgettable"),
        F.sum(F.expr("CASE WHEN n_forgets > 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_forgotten"),
        F.sum("n_forgets").cast("long").alias("total_forget_events"),
        F.max("n_forgets").cast("long").alias("max_forgets"),
    )
