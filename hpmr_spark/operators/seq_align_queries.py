"""Round-10 wave 4: sequence alignment and curriculum pacing (named
published recipes absent from the registry):

- rouge_l_lead_tail: ROUGE-L (Lin 2004) — the LCS-based summary metric
  next to lead_summary_rouge1's unigram overlap. Per document, the LCS
  between the 8-word lead and the 8-word tail is computed by an IN-ROW
  DP fold: the full 9×9 table rides as an 81-long array accumulator and
  the 64 cells update in row-major order — one committed fold text,
  evaluated by Spark's `aggregate` HOF and DuckDB's `list_reduce`
  (elements are 1-long lists so the accumulator and element types match
  DuckDB's 2-arg-only reducer). F_ppm = 2·LCS·10⁶ div (M+N) — the
  equal-length identity F = 2·LCS/(M+N), pure integers.
- curriculum_competence_pacing: competence-based curriculum (Platanios
  et al. 2019): c(t) = sqrt(t(1−c0²)/T + c0²) with c0² = 1/100, T = 10
  committed steps; difficulty = exact length-rank CDF. The admission
  decision is the pure-integer cross-multiplication
  100·T·rank² ≤ N²·(99t + T) — sqrt appears ONLY in the display column
  (IEEE-correctly-rounded, identical both engines).

Integer discipline (CLAUDE.md): the LCS DP is exact integers end to
end; admission thresholds are int128 cross-multiplications (rank² at
10¹⁰ docs exceeds int64); every division is a documented floor.

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's LLM-pipeline axis.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import _t, register
from hpmr_spark.functions.ranking import global_row_number

# ---------------------------------------------------------------------------
# ROUGE-L via in-row LCS fold
# ---------------------------------------------------------------------------

_RL_M = 8  # lead / tail length (M = N = 8)
_RL_MIN = 16  # only docs with ≥ 16 tokens have disjoint lead/tail


def _lcs_cell(acc: str, i: str, j: str, a: str, b: str, el) -> str:
    """GREATEST(up, left, diag + eq) for 1-based (i, j) over the flattened
    9×9 DP in `acc`; `el(arr, pos)` renders 1-based element access."""
    up = el(acc, f"(({i}) - 1) * 9 + ({j}) + 1")
    left = el(acc, f"({i}) * 9 + ({j}) - 1 + 1")
    diag = el(acc, f"(({i}) - 1) * 9 + ({j}) - 1 + 1")
    eq = (
        f"CASE WHEN {el(a, i)} = {el(b, j)}"
        f" THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    )
    return f"GREATEST({up}, {left}, {diag} + {eq})"


def _lcs_spark(a: str, b: str) -> str:
    def el(arr, pos):
        return f"element_at({arr}, CAST({pos} AS INT))"

    cell = _lcs_cell("acc", "(k div 8 + 1)", "(k % 8 + 1)", a, b, el)
    fold = (
        f"aggregate(sequence(CAST(0 AS BIGINT), CAST(63 AS BIGINT)),"
        f" array_repeat(CAST(0 AS BIGINT), 81),"
        f" (acc, k) -> transform(acc, (v, x) ->"
        f" CASE WHEN x = (k div 8 + 1) * 9 + (k % 8 + 1)"
        f" THEN {cell} ELSE v END))"
    )
    return f"element_at({fold}, 81)"


def _lcs_duck(a: str, b: str) -> str:
    def el(arr, pos):
        return f"{arr}[CAST({pos} AS BIGINT)]"

    # DuckDB list_transform's 2-arg lambda index _x is 1-BASED; Spark's
    # transform index is 0-based — the +1 shift lives only here.
    cell = _lcs_cell("_acc", "(_p[1] // 8 + 1)", "(_p[1] % 8 + 1)", a, b, el)
    elems = "list_transform(range(0, 64), _k -> [CAST(_k AS BIGINT)])"
    init = "list_transform(range(81), _z -> CAST(0 AS BIGINT))"
    fold = (
        f"list_reduce(list_prepend({init}, {elems}),"
        f" (_acc, _p) -> list_transform(_acc, (_v, _x) ->"
        f" CASE WHEN _x - 1 = (_p[1] // 8 + 1) * 9 + (_p[1] % 8 + 1)"
        f" THEN {cell} ELSE _v END))"
    )
    return f"({fold})[81]"


_RL_ORACLE = f"""
    WITH seqs AS (
      SELECT lang,
             list_slice(t, 1, {_RL_M}) AS a,
             list_slice(t, len(t) - {_RL_M - 1}, len(t)) AS b
      FROM (SELECT lang, string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= {_RL_MIN}
    ),
    scored AS (
      SELECT lang, {_lcs_duck("a", "b")} AS lcs FROM seqs
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(lcs) AS BIGINT) AS sum_lcs,
           CAST(SUM(lcs * 1000000 // {_RL_M + _RL_M})
                // COUNT(*) AS BIGINT) AS mean_f_ppm
    FROM scored GROUP BY lang
"""


@register("rouge_l_lead_tail", _RL_ORACLE)
def rouge_l_lead_tail(spark, sf_dir):
    """ROUGE-L (Lin 2004): per document with ≥ 16 tokens, the longest
    common subsequence between the 8-word lead and the 8-word tail —
    the self-redundancy view of the corpus (a high lead/tail LCS flags
    template-like documents; read next to gopher_repetition_fractions).
    F = 2·LCS/(M+N) by the equal-length identity, floored to ppm per doc
    before the per-lang mean (integers only — no parallel float sum).

    Spark shape: entirely in-row — the 9×9 DP rides an 81-long array
    accumulator through ONE `aggregate` HOF fold (JVM-side, no Python,
    no shuffle beyond the final lang agg). The committed fold text is
    engine-shared modulo dialect (DuckDB folds over 1-long lists to
    satisfy list_reduce's acc-type = element-type rule; its lambda index
    is 1-based where Spark's is 0-based). Linear at any scale."""
    d = _t(spark, sf_dir, "documents")
    seqs = (
        d.select("lang", F.split("text", " ").alias("t"))
        .where(F.size("t") >= _RL_MIN)
        .select(
            "lang",
            F.expr(f"slice(t, 1, {_RL_M})").alias("a"),
            F.expr(f"slice(t, size(t) - {_RL_M - 1}, {_RL_M})").alias("b"),
        )
    )
    scored = seqs.select("lang", F.expr(_lcs_spark("a", "b")).alias("lcs"))
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("lcs").cast("long").alias("sum_lcs"),
        F.expr(
            f"CAST(SUM(lcs * 1000000 div {_RL_M + _RL_M})"
            f" div COUNT(*) AS BIGINT)"
        ).alias("mean_f_ppm"),
    )


# ---------------------------------------------------------------------------
# Competence-based curriculum pacing
# ---------------------------------------------------------------------------

_CC_T = 10  # committed pacing steps (t = 0..T)

_CC_ORACLE = f"""
    WITH ranked AS (
      SELECT doc_id, n_chars,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rk
      FROM documents
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
    steps AS (SELECT unnest(generate_series(0, {_CC_T})) AS t),
    admitted AS (
      SELECT s.t, r.rk, r.n_chars
      FROM ranked r, n, steps s
      WHERE CAST(100 AS HUGEINT) * {_CC_T} * r.rk * r.rk
            <= CAST(n.nd AS HUGEINT) * n.nd * (99 * s.t + {_CC_T})
    )
    SELECT CAST(t AS BIGINT) AS step,
           CAST(FLOOR(SQRT((99.0 * t + {_CC_T}) / (100.0 * {_CC_T}))
                * 1000000) AS BIGINT) AS competence_ppm,
           CAST(COUNT(*) AS BIGINT) AS n_admitted,
           CAST(SUM(n_chars) AS BIGINT) AS admitted_chars
    FROM admitted GROUP BY t
"""


@register("curriculum_competence_pacing", _CC_ORACLE)
def curriculum_competence_pacing(spark, sf_dir):
    """Competence-based curriculum (Platanios et al. 2019): at step t of
    T = 10, the model's competence c(t) = sqrt(t(1−c0²)/T + c0²) admits
    the easiest c(t)-fraction of the corpus, with difficulty = the exact
    (n_chars, doc_id) length-rank CDF. Since both sides of
    CDF ≤ c(t) are in [0,1], squaring gives the pure-integer admission
    test 100·T·rank² ≤ N²·(99t + T) — sqrt appears only in the reported
    competence column (IEEE-correctly-rounded, bit-identical engines).
    Emits the pacing schedule: admitted docs and admitted chars per step.

    Spark shape: the exact global rank uses the two-pass bucketed
    machinery (functions/ranking.global_row_number — never a
    partition-less window), the 11 steps ride a broadcast literal frame,
    and the census is one (step)-keyed agg. rank² at 10¹⁰ docs exceeds
    int64 ⟹ int128 engine-split idiom."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = global_row_number(d, ["n_chars", "doc_id"], out="rk")
    n = d.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    steps = spark.range(0, _CC_T + 1).select(F.col("id").alias("t"))
    admitted = (
        ranked.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(steps))
        .where(
            F.expr(
                f"CAST(100 AS DECIMAL(38,0)) * {_CC_T} * rk * rk"
                f" <= CAST(nd AS DECIMAL(38,0)) * nd * (99 * t + {_CC_T})"
            )
        )
    )
    return admitted.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n_admitted"),
        F.sum("n_chars").cast("long").alias("admitted_chars"),
    ).select(
        F.col("t").cast("long").alias("step"),
        F.expr(
            f"CAST(FLOOR(SQRT((99.0 * t + {_CC_T}) / (100.0 * {_CC_T}))"
            f" * 1000000) AS BIGINT)"
        ).alias("competence_ppm"),
        "n_admitted",
        "admitted_chars",
    )
