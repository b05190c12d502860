"""Round-10 wave 12: parameter-advisor planning tables (named textbook
recipes absent from the registry; the chinchilla_data_budget /
parallelism_memory_plan class — closed forms every pipeline plans with,
anchored to THIS corpus where a real rate exists):

- lsh_s_curve_advisor: the MinHash-LSH S-curve (Leskovec/Rajaraman/
  Ullman, "Mining of Massive Datasets" §3.4): collision probability
  P(J) = 1 − (1 − J^r)^b for the committed (b, r) splits of 32
  signature rows, on a Jaccard grid — the table that picks banding
  parameters BEFORE a dedup run (dedup_minhash_lsh's own b = 16, r = 2
  commitment sits in this table). Powers are expanded as explicit
  products of exact dyadic grid points — identical text both engines,
  one final floor.
- power_analysis_table: two-proportion sample-size planning (classic
  power analysis, Cohen 1988): n per arm =
  (z_{α/2}+z_{β})²·(p₁q₁+p₂q₂)/Δ² at committed z constants
  (α = 0.05 two-sided, power 80%), for MDE grid cells around THIS
  corpus's measured purchase rate — the table every A/B platform
  consults before launching (read next to ab_test_z2_gate, which
  decides AFTER).

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's LLM-pipeline axis.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register
from hpmr_spark.functions.littables import values_df
from hpmr_spark.sources.tables import load_events

# ---------------------------------------------------------------------------
# LSH S-curve advisor
# ---------------------------------------------------------------------------

_LSH_SPLITS = ((32, 1), (16, 2), (8, 4), (4, 8))  # b × r = 32 rows
_LSH_J_GRID = tuple(j / 10 for j in range(1, 10))  # 0.1 .. 0.9


def _pow_text(base: str, k: int) -> str:
    """Explicit k-fold product (no POWER — identical left-assoc text)."""
    return "(" + " * ".join([base] * k) + ")"


def _lsh_rows() -> list[tuple[int, int, str, str]]:
    rows = []
    for b, r in _LSH_SPLITS:
        for j in _LSH_J_GRID:
            jlit = f"CAST({j!r} AS DOUBLE)"
            jr = _pow_text(jlit, r)
            miss = f"(CAST(1.0 AS DOUBLE) - {jr})"
            p = f"(CAST(1.0 AS DOUBLE) - {_pow_text(miss, b)})"
            rows.append((b, r, f"{j!r}", p))
    return rows


def _lsh_oracle() -> str:
    selects = "\n    UNION ALL ".join(
        f"SELECT CAST({b} AS BIGINT) AS bands, CAST({r} AS BIGINT) AS rows_,"
        f" CAST({int(float(j) * 10)} AS BIGINT) AS j_deci,"
        f" CAST(FLOOR({p} * 1000000) AS BIGINT) AS collide_ppm"
        for b, r, j, p in _lsh_rows()
    )
    return selects


@register("lsh_s_curve_advisor", _lsh_oracle())
def lsh_s_curve_advisor(spark, sf_dir):
    """MinHash-LSH banding S-curve (MMDS §3.4): for each committed split
    of the 32 signature rows into (bands × rows) and each Jaccard grid
    point, the candidate-collision probability 1 − (1 − J^r)^b — the
    advisor table that justifies dedup_minhash_lsh's committed b = 16,
    r = 2 (steep near the τ = 0.5 threshold). All powers are explicit
    left-associated products of the exact dyadic-free literals —
    identical expression text both engines — floored once to ppm.

    Spark shape: a 36-row literal frame; no data, no shuffle — the
    planning-table class (chinchilla_data_budget's disposition)."""
    rows = [
        (b, r, int(float(j) * 10), p) for b, r, j, p in _lsh_rows()
    ]
    df = values_df(spark, 
        [(b, r, jd) for b, r, jd, _p in rows],
        "bands long, rows_ long, j_deci long",
    )
    # one CASE tree carrying each grid cell's committed product text
    cases = " ".join(
        f"WHEN bands = {b} AND j_deci = {jd}"
        f" THEN CAST(FLOOR({p} * 1000000) AS BIGINT)"
        for b, r, jd, p in rows
    )
    return df.select(
        "bands",
        "rows_",
        "j_deci",
        F.expr(f"CASE {cases} END").alias("collide_ppm"),
    )


# ---------------------------------------------------------------------------
# Two-proportion power analysis
# ---------------------------------------------------------------------------

# committed quantiles: z_{0.025} = 1.959964, z_{0.2} = 0.841621
_PA_ZSUM = "CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE)"
_PA_MDE_PPM = (5000, 10000, 20000, 50000)  # absolute MDE grid (ppm)

_PA_ORACLE = f"""
    WITH base AS (
      SELECT CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS np,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events
    ),
    grid AS (SELECT unnest([{", ".join(str(m) for m in _PA_MDE_PPM)}])
               AS mde_ppm),
    calc AS (
      SELECT base.np, base.n, grid.mde_ppm,
             CAST(base.np AS DOUBLE) / CAST(base.n AS DOUBLE) AS p1,
             CAST(base.np AS DOUBLE) / CAST(base.n AS DOUBLE)
               + CAST(grid.mde_ppm AS DOUBLE) / 1000000.0 AS p2
      FROM base, grid
    )
    SELECT CAST(mde_ppm AS BIGINT) AS mde_ppm,
           CAST(np * 1000000 // n AS BIGINT) AS base_rate_ppm,
           CAST(CEIL(({_PA_ZSUM}) * ({_PA_ZSUM})
             * (p1 * (1 - p1) + p2 * (1 - p2))
             / ((CAST(mde_ppm AS DOUBLE) / 1000000.0)
                * (CAST(mde_ppm AS DOUBLE) / 1000000.0))) AS BIGINT)
             AS n_per_arm
    FROM calc
"""


@register("power_analysis_table", _PA_ORACLE)
def power_analysis_table(spark, sf_dir):
    """Two-proportion sample-size planning (Cohen 1988): at the committed
    α = 0.05 (two-sided) and 80% power quantiles,
    n/arm = (z_{{α/2}}+z_β)²·(p₁q₁+p₂q₂)/Δ² for an MDE grid around THIS
    corpus's measured purchase rate (p₁ exact from the event log; p₂ =
    p₁+Δ). One final double expression per grid row from exact integer
    counts — identical text both engines — ceiled once. The
    before-launch table dual to ab_test_z2_gate's after-data decision.

    Spark shape: one event aggregate crossed with the 4-row MDE grid."""
    ev = load_events(spark, sf_dir)
    base = ev.agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("np"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    grid = values_df(spark, 
        [(m,) for m in _PA_MDE_PPM], "mde_ppm long"
    )
    calc = grid.crossJoin(F.broadcast(base)).select(
        "mde_ppm",
        "np",
        "n",
        F.expr("CAST(np AS DOUBLE) / CAST(n AS DOUBLE)").alias("p1"),
        F.expr(
            "CAST(np AS DOUBLE) / CAST(n AS DOUBLE)"
            " + CAST(mde_ppm AS DOUBLE) / 1000000.0"
        ).alias("p2"),
    )
    return calc.select(
        "mde_ppm",
        F.expr("CAST(np * 1000000 div n AS BIGINT)").alias("base_rate_ppm"),
        F.expr(
            f"CAST(CEIL(({_PA_ZSUM}) * ({_PA_ZSUM})"
            f" * (p1 * (1 - p1) + p2 * (1 - p2))"
            f" / ((CAST(mde_ppm AS DOUBLE) / 1000000.0)"
            f" * (CAST(mde_ppm AS DOUBLE) / 1000000.0))) AS BIGINT)"
        ).alias("n_per_arm"),
    )
