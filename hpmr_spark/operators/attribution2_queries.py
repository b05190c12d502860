"""Marketing-attribution round-out (round 6): Markov removal-effect
attribution and dyadic time-decay credit — the two classic data-driven
attribution models next to the existing last-touch / position-based pair.

Removal effect is the flagship: build the empirical first-order Markov
chain over pre-conversion touch journeys (start → channels → conv/null),
then for each channel re-run a 6-step truncated absorption DP with that
channel's inbound edges removed; the channel's value is the relative drop
in conversion mass. Everything is exact integer ppm arithmetic:
transition probabilities floor once to ppm (int128 cross-multiplication:
Spark DECIMAL(38,0) div / DuckDB HUGEINT // — DuckDB's // on DECIMAL
operands ROUNDS, observed live, so the oracle must stay in HUGEINT), and each DP step multiplies a ≤1e6 mass by
a ≤1e6 ppm probability — products are ≤1e12, BIGINT-safe by construction
at ANY corpus size. The unrolled DP text is GENERATED once and planned on
both engines (the unigram-Viterbi generator pattern,
tokenize2_queries.py), differing only in the integer-division token
(Spark `div` ≡ DuckDB `//`, both truncate — verified round 5).

Scale: journeys are one user-keyed window pass over events (one hash
shuffle); the chain itself is a ≤30-cell aggregate, so the DP runs on a
1-row frame — the 100 TB cost is the single events shuffle.

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's analytics axis.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register
from hpmr_spark.sources.tables import load_events

_CHANNELS = ["click", "view", "signup", "error"]
_SOURCES = ["start"] + _CHANNELS
_DESTS = _CHANNELS + ["conv", "nul"]
_STEPS = 6


def _journey_sql(events: str) -> str:
    """Shared CTE text (both engines parse it): per-user journeys truncated
    at the FIRST purchase; transition rows (src, dst) including start→first
    touch, touch→touch, last touch→conv/nul, and start→conv for users who
    purchased with no prior touch. Tie-breaks: full (ts_us, event_id)
    struct order; a purchase at the same microsecond as a touch sorts by
    event_id — the committed contract."""
    return f"""
    ev AS (
      SELECT user_id, event_id, event_type,
             CAST({events} AS BIGINT) AS ts_us
      FROM events
    ),
    fpr AS (
      SELECT user_id, ts_us AS fp_ts, event_id AS fp_id
      FROM (SELECT user_id, ts_us, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts_us, event_id) AS prn
            FROM ev WHERE event_type = 'purchase') p
      WHERE prn = 1
    ),
    touches AS (
      SELECT e.user_id, e.event_type, e.ts_us, e.event_id,
             (f.user_id IS NOT NULL) AS converts,
             ROW_NUMBER() OVER (PARTITION BY e.user_id
                                ORDER BY e.ts_us, e.event_id) AS rn,
             COUNT(*) OVER (PARTITION BY e.user_id) AS m,
             LAG(e.event_type) OVER (PARTITION BY e.user_id
                                     ORDER BY e.ts_us, e.event_id) AS prev
      FROM ev e LEFT JOIN fpr f ON f.user_id = e.user_id
      WHERE e.event_type <> 'purchase'
        AND (f.user_id IS NULL OR e.ts_us < f.fp_ts
             OR (e.ts_us = f.fp_ts AND e.event_id < f.fp_id))
    ),
    trans AS (
      SELECT CASE WHEN rn = 1 THEN 'start' ELSE prev END AS src,
             event_type AS dst
      FROM touches
      UNION ALL
      SELECT event_type AS src,
             CASE WHEN converts THEN 'conv' ELSE 'nul' END AS dst
      FROM touches WHERE rn = m
      UNION ALL
      SELECT 'start' AS src, 'conv' AS dst
      FROM fpr f
      WHERE NOT EXISTS (SELECT 1 FROM touches t
                        WHERE t.user_id = f.user_id)
    )"""


def _wide_sql(div: str, big: str) -> str:
    """Pivot transition counts to one row of ppm probabilities: p_{s}_{d} =
    floor(n(s→d)·1e6 / Σ_d' n(s→d')) — int128 cross-multiplication, floored
    ONCE (every later multiply is ≤1e6 × ≤1e6)."""
    n_cols = ", ".join(
        f"CAST(SUM(CASE WHEN src = '{s}' AND dst = '{d}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_{s}_{d}"
        for s in _SOURCES
        for d in _DESTS
    )
    tot_cols = ", ".join(
        "(" + " + ".join(f"n_{s}_{d}" for d in _DESTS) + f") AS tot_{s}"
        for s in _SOURCES
    )
    p_cols = ", ".join(
        f"CASE WHEN tot_{s} > 0 THEN CAST(CAST(n_{s}_{d} AS {big})"
        f" * 1000000 {div} tot_{s} AS BIGINT) ELSE 0 END AS p_{s}_{d}"
        for s in _SOURCES
        for d in _DESTS
        if d != "nul"
    )
    return (
        f"counts AS (SELECT {n_cols} FROM trans), "
        f"tots AS (SELECT *, {tot_cols} FROM counts), "
        f"probs AS (SELECT *, {p_cols} FROM tots)"
    )


def _dp_sql(div: str) -> list[str]:
    """Unrolled 6-step absorption DP column expressions, one chain per
    variant: 'f' (full chain) and one chain per removed channel (inbound
    edges to that channel dropped — mass that would enter it is lost).
    Masses are ppm of the start cohort; each step computes
    m_{t+1}(d) = Σ_s m_t(s)·p(s→d) div 1e6 and accumulates conv mass.
    Returns a list of SELECT-fragment strings, one per chained step."""
    variants = [("f", None)] + [(f"r_{c}", c) for c in _CHANNELS]
    steps: list[str] = []
    # step 1: from start only
    cols = []
    for tag, removed in variants:
        for d in _CHANNELS:
            cols.append(
                f"0 AS {tag}_m_{d}_1"
                if d == removed
                else f"(1000000 * p_start_{d} {div} 1000000) AS {tag}_m_{d}_1"
            )
        cols.append(f"(1000000 * p_start_conv {div} 1000000) AS {tag}_conv_1")
    steps.append(", ".join(cols))
    for t in range(2, _STEPS + 1):
        cols = []
        for tag, removed in variants:
            srcs = [c for c in _CHANNELS if c != removed]
            for d in _CHANNELS:
                if d == removed:
                    cols.append(f"0 AS {tag}_m_{d}_{t}")
                    continue
                terms = " + ".join(
                    f"({tag}_m_{s}_{t - 1} * p_{s}_{d} {div} 1000000)"
                    for s in srcs
                )
                cols.append(f"({terms}) AS {tag}_m_{d}_{t}")
            conv_terms = " + ".join(
                f"({tag}_m_{s}_{t - 1} * p_{s}_conv {div} 1000000)"
                for s in srcs
            )
            cols.append(
                f"({tag}_conv_{t - 1} + {conv_terms}) AS {tag}_conv_{t}"
            )
        steps.append(", ".join(cols))
    return steps


def _final_sql(div: str) -> str:
    """4 output rows: per channel the full/removed conversion ppm and the
    removal effect = (full − removed)·1e6 div full (0-guarded)."""
    selects = []
    for c in _CHANNELS:
        selects.append(
            f"SELECT '{c}' AS channel,"
            f" CAST(f_conv_{_STEPS} AS BIGINT) AS conv_full_ppm,"
            f" CAST(r_{c}_conv_{_STEPS} AS BIGINT) AS conv_removed_ppm,"
            f" CAST(CASE WHEN f_conv_{_STEPS} > 0 THEN"
            f" (f_conv_{_STEPS} - r_{c}_conv_{_STEPS}) * 1000000"
            f" {div} f_conv_{_STEPS} ELSE 0 END AS BIGINT)"
            f" AS removal_effect_ppm FROM dp{_STEPS}"
        )
    return " UNION ALL ".join(selects)


def _final_sql_inline(div: str) -> str:
    """Spark-side single-branch twin of _final_sql (r11, guide §2.4 /
    the r6 funnel lesson): the 4-way UNION ALL re-inlines the whole
    journey→pivot→DP CTE chain once per branch (Spark CTEs inline), which
    cost 4 extra planning passes and job barriers for one 1-row frame.
    inline() of a 4-struct array emits the SAME four rows from ONE dp pass.
    The ORACLE keeps the UNION ALL text (DuckDB side untouched)."""
    structs = ", ".join(
        f"named_struct('channel', '{c}',"
        f" 'conv_full_ppm', CAST(f_conv_{_STEPS} AS BIGINT),"
        f" 'conv_removed_ppm', CAST(r_{c}_conv_{_STEPS} AS BIGINT),"
        f" 'removal_effect_ppm', CAST(CASE WHEN f_conv_{_STEPS} > 0 THEN"
        f" (f_conv_{_STEPS} - r_{c}_conv_{_STEPS}) * 1000000"
        f" {div} f_conv_{_STEPS} ELSE 0 END AS BIGINT))"
        for c in _CHANNELS
    )
    return f"SELECT inline(array({structs})) FROM dp{_STEPS}"


def _full_query(div: str, events_us: str, big: str, inline_final: bool = False) -> str:
    dp_ctes = []
    prev = "probs"
    for t, cols in enumerate(_dp_sql(div), start=1):
        dp_ctes.append(f"dp{t} AS (SELECT *, {cols} FROM {prev})")
        prev = f"dp{t}"
    return (
        "WITH "
        + _journey_sql(events_us)
        + ", "
        + _wide_sql(div, big)
        + ", "
        + ", ".join(dp_ctes)
        + " "
        + (_final_sql_inline(div) if inline_final else _final_sql(div))
        + " ORDER BY channel"
    )


@register(
    "attribution_removal_effect",
    _full_query("//", "epoch_us(ts)", "HUGEINT"),
)
def attribution_removal_effect(spark, sf_dir):
    """Markov removal-effect attribution: 6-step truncated absorption
    probability of the empirical journey chain, minus the same DP with
    each channel's inbound edges removed — exact integer ppm throughout
    (see module docstring). One user-keyed events shuffle; the DP runs on
    a single pivoted probability row."""
    load_events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(
        _full_query("div", "unix_micros(ts)", "DECIMAL(38,0)", inline_final=True)
    )


_DECAY_CAP = 20  # only the most recent 20 touches earn credit (2^20 ppm-safe)

_TIME_DECAY_ORACLE = f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type,
             CAST(epoch_us(ts) AS BIGINT) AS ts_us
      FROM events
    ),
    fpr AS (
      SELECT user_id, ts_us AS fp_ts, event_id AS fp_id
      FROM (SELECT user_id, ts_us, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts_us, event_id) AS prn
            FROM ev WHERE event_type = 'purchase') p
      WHERE prn = 1
    ),
    touches AS (
      SELECT e.user_id, e.event_type,
             ROW_NUMBER() OVER (PARTITION BY e.user_id
                                ORDER BY e.ts_us DESC, e.event_id DESC)
               AS rn_end
      FROM ev e JOIN fpr f ON f.user_id = e.user_id
      WHERE e.event_type <> 'purchase'
        AND (e.ts_us < f.fp_ts
             OR (e.ts_us = f.fp_ts AND e.event_id < f.fp_id))
    ),
    kept AS (
      SELECT user_id, event_type, rn_end,
             COUNT(*) OVER (PARTITION BY user_id) AS m_eff
      FROM touches WHERE rn_end <= {_DECAY_CAP}
    ),
    credits AS (
      SELECT event_type,
             CAST(CAST(POWER(2, m_eff - rn_end) AS BIGINT) * 1000000
                  // (CAST(POWER(2, m_eff) AS BIGINT) - 1) AS BIGINT)
               AS credit_ppm
      FROM kept
    )
    SELECT event_type AS channel,
           CAST(SUM(credit_ppm) AS BIGINT) AS total_credit_ppm,
           CAST(COUNT(*) AS BIGINT) AS n_credited_touches
    FROM credits GROUP BY event_type ORDER BY channel
"""


@register("attribution_time_decay", _TIME_DECAY_ORACLE)
def attribution_time_decay(spark, sf_dir):
    """Time-decay attribution with DYADIC weights: among a converting
    user's last {cap} pre-purchase touches, the j-th most recent earns
    2^(m−j)/(2^m − 1) of one conversion — exact integer ppm (2^k is exact
    in BIGINT for k ≤ 20; floor division identical on both engines). The
    cap bounds the exponent at ANY journey length — the overflow guard IS
    the model (older touches earn nothing). One user-keyed window pass."""
    ev = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    from pyspark.sql import Window

    w_first = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .withColumn("prn", F.row_number().over(w_first))
        .where(F.col("prn") == 1)
        .select(
            "user_id",
            F.col("ts_us").alias("fp_ts"),
            F.col("event_id").alias("fp_id"),
        )
    )
    w_end = Window.partitionBy("user_id").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    touches = (
        ev.join(fp, "user_id")
        .where(
            (F.col("event_type") != "purchase")
            & (
                (F.col("ts_us") < F.col("fp_ts"))
                | (
                    (F.col("ts_us") == F.col("fp_ts"))
                    & (F.col("event_id") < F.col("fp_id"))
                )
            )
        )
        .withColumn("rn_end", F.row_number().over(w_end))
        .where(F.col("rn_end") <= _DECAY_CAP)
    )
    w_user = Window.partitionBy("user_id")
    kept = touches.withColumn("m_eff", F.count(F.lit(1)).over(w_user))
    credits = kept.select(
        "event_type",
        F.expr(
            "CAST(CAST(POWER(2, m_eff - rn_end) AS BIGINT) * 1000000"
            " div (CAST(POWER(2, m_eff) AS BIGINT) - 1) AS BIGINT)"
        ).alias("credit_ppm"),
    )
    return (
        credits.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.sum("credit_ppm").cast("long").alias("total_credit_ppm"),
            F.count(F.lit(1)).cast("long").alias("n_credited_touches"),
        )
        .orderBy("channel")
    )
