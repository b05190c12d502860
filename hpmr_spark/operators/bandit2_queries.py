"""Adaptive-policy offline evaluation (round 6, wave 6).

ucb1_replay_arms: UCB1 bandit replay (the Li-et-al replay estimator,
here over the first 512 events by (ts, event_id)). Arms are the five
event types (alphabetical index 1..5); reward = value ≥ $25 (integer
cents threshold). At each logged event the CURRENT UCB1 policy picks

  unplayed arm (lowest index) if any n_a = 0, else
  argmax_a  floor((r_a/n_a + sqrt(2·ln t / n_a)) · 1e9)   (tie: lowest a)

and the event counts toward the policy's stats ONLY when the logged
arm equals the pick. The recurrence is irreducibly sequential, so the
engine folds it in pandas over the BOUNDED 512-row replay window (the
token-bucket pattern) and the oracle walks the identical arithmetic as
a 512-level recursive CTE carrying the 5 arm states as columns. The
UCB index is floored to nanos from a LN/SQRT expression — LN is
bit-identical across Spark JVM / DuckDB / CPython on this platform
(tests/test_libm_parity.py) and sqrt/divide are IEEE-correctly-rounded,
so the Python fold and the SQL recursion commit the same integers.

Scale notes (100 TB): the replay window is a committed constant — the
operator is calendar/constant-bounded after one fact-ordered top-512
selection (bucketed two-pass, no global window).

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's analytics axis.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register
from hpmr_spark.sources.tables import load_events

_N_REPLAY = 512
_ARMS = ["click", "error", "purchase", "signup", "view"]
_ARM_CASE = (
    "CASE event_type "
    + " ".join(f"WHEN '{a}' THEN {i + 1}" for i, a in enumerate(_ARMS))
    + " END"
)


def _ucb_fold(pdf):
    import math

    import pandas as pd

    rows = sorted(zip(pdf["us"].tolist(), pdf["eid"].tolist(),
                      pdf["arm"].tolist(), pdf["w"].tolist()))
    n = [0] * 6
    r = [0] * 6
    t = 0
    for _, _, arm, w in rows:
        unplayed = [a for a in range(1, 6) if n[a] == 0]
        if unplayed:
            chosen = unplayed[0]
        else:
            best = max(
                (
                    math.floor(
                        (r[a] / n[a] + math.sqrt(2 * math.log(t) / n[a]))
                        * 1000000000
                    ),
                    -a,
                )
                for a in range(1, 6)
            )
            chosen = -best[1]
        if chosen == arm:
            n[arm] += 1
            r[arm] += w
            t += 1
    return pd.DataFrame(
        {
            "arm": list(range(1, 6)),
            "n_plays": [n[a] for a in range(1, 6)],
            "sum_reward": [r[a] for a in range(1, 6)],
        }
    )


def _idx_sql(a: int) -> str:
    return (
        f"FLOOR((CAST(k.r{a} AS DOUBLE) / k.n{a}"
        f" + SQRT(2 * LN(CAST(k.t AS DOUBLE)) / k.n{a})) * 1000000000)"
    )


_CHOSEN_SQL = (
    "CASE "
    + " ".join(f"WHEN k.n{a} = 0 THEN {a}" for a in range(1, 6))
    + " ELSE 0 - (list_aggregate(["
    + ", ".join(f"{{'v': {_idx_sql(a)}, 'a': {-a}}}" for a in range(1, 6))
    + "], 'max')).a END"
)


def _ucb_oracle() -> str:
    upd_n = ", ".join(
        f"k2.n{a} + CASE WHEN k2.ch = {a} AND k2.arm = {a} THEN 1 ELSE 0 END"
        for a in range(1, 6)
    )
    upd_r = ", ".join(
        f"k2.r{a} + CASE WHEN k2.ch = {a} AND k2.arm = {a} THEN k2.w ELSE 0 END"
        for a in range(1, 6)
    )
    fin = " UNION ALL ".join(
        f"SELECT CAST({a} AS BIGINT) AS arm, CAST(f.n{a} AS BIGINT) AS n_plays,"
        f" CAST(f.r{a} AS BIGINT) AS sum_reward FROM fin f"
        for a in range(1, 6)
    )
    return f"""
    WITH RECURSIVE e AS MATERIALIZED (
      SELECT ROW_NUMBER() OVER (ORDER BY epoch_us(ts), event_id) AS rn,
             {_ARM_CASE} AS arm,
             CASE WHEN CAST(ROUND(value * 100) AS BIGINT) >= 2500
                  THEN 1 ELSE 0 END AS w
      FROM events
      ORDER BY epoch_us(ts), event_id
      LIMIT {_N_REPLAY}
    ),
    nmax AS (SELECT CAST(MAX(rn) AS BIGINT) AS n FROM e),
    walk(k, t, n1, n2, n3, n4, n5, r1, r2, r3, r4, r5) AS (
      SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             0, 0, 0, 0, 0, 0, 0, 0, 0, 0
      UNION ALL
      SELECT k2.k + 1,
             k2.t + CASE WHEN k2.ch = k2.arm THEN 1 ELSE 0 END,
             {upd_n},
             {upd_r}
      FROM (
        SELECT k.*, e.arm, e.w, {_CHOSEN_SQL} AS ch
        FROM walk k JOIN e ON e.rn = k.k + 1
      ) k2
    ),
    fin AS (SELECT w.* FROM walk w, nmax WHERE w.k = nmax.n)
    {fin}
"""


@register("ucb1_replay_arms", _ucb_oracle())
def ucb1_replay_arms(spark, sf_dir):
    """UCB1 replay over the first 512 events — see module docstring.
    Output: 5 rows (arm, n_plays, sum_reward)."""
    ev = load_events(spark, sf_dir)
    base = (
        ev.select(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            F.col("event_id").alias("eid"),
            F.expr(_ARM_CASE).alias("arm"),
            F.when(F.round(F.col("value") * 100).cast("long") >= 2500, 1)
            .otherwise(0)
            .alias("w"),
        )
        .orderBy("us", "eid")
        .limit(_N_REPLAY)
    )
    return (
        base.withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandas(
            lambda pdf: _ucb_fold(pdf),
            schema="arm long, n_plays long, sum_reward long",
        )
    )
