"""Exact Shapley-value attribution (round 6): the game-theoretic
completion of the attribution family (last-touch / position / time-decay
/ removal-effect). With 4 channels the Shapley sum is 8 subsets per
channel — small enough to enumerate EXACTLY, so no sampling and no
floats: every Shapley value is an integer number of 1/24-conversions
(24 = 4!), and Σ_c φ_c = 24·v(full) holds as an exact identity (asserted
by the oracle construction, checkable by the reader).

Characteristic function: v(S) = number of converting users whose
pre-purchase touch-channel SET intersects S — "the conversions the
campaign keeps if only channels in S exist" (users who convert with zero
touches convert regardless; their marginal contribution is 0 for every
channel, so they are excluded — documented). Touch sets pivot to a
16-cell mask histogram (bit_or of channel bits per user — one user-keyed
shuffle), and all 16 v(S) values plus the 4 Shapley sums are generated
expressions over that single row; the text is shared verbatim by both
engines (pure + and ×, no division at all — stronger than the ppm
discipline).

Scale: one events shuffle (user bit_or) + a 15-cell aggregate.

Reference parity: beyond the reference kv kernel
(/root/reference/src/hpmr.h:1-10) along the brief's analytics axis.
"""

from __future__ import annotations

from math import factorial

from hpmr_spark.catalog import register
from hpmr_spark.sources.tables import load_events

_CHANNELS = ["click", "view", "signup", "error"]  # bit i = channel i
_N = len(_CHANNELS)


def _mask_sql(events_us: str) -> str:
    """Shared text: per converting user, the bit_or mask of pre-purchase
    touch channels (first-purchase truncation, full (ts,id) tie-break —
    the attribution2 journey contract), then the 15-cell mask histogram
    pivoted to one row (m_1..m_15)."""
    bit_case = " ".join(
        f"WHEN event_type = '{c}' THEN {1 << i}"
        for i, c in enumerate(_CHANNELS)
    )
    m_cols = ", ".join(
        f"CAST(SUM(CASE WHEN mask = {m} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS m_{m}"
        for m in range(1, 1 << _N)
    )
    return f"""
    ev AS (
      SELECT user_id, event_id, event_type,
             CAST({events_us} AS BIGINT) AS ts_us
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
    masks AS (
      SELECT e.user_id,
             BIT_OR(CASE {bit_case} END) AS mask
      FROM ev e JOIN fpr f ON f.user_id = e.user_id
      WHERE e.event_type <> 'purchase'
        AND (e.ts_us < f.fp_ts
             OR (e.ts_us = f.fp_ts AND e.event_id < f.fp_id))
      GROUP BY e.user_id
    ),
    hist AS (SELECT {m_cols} FROM masks)"""


def _shapley_sql() -> str:
    """v(S) and φ_c expressions over the histogram row. φ_c is in units
    of 1/24 conversion: φ_c·24 = Σ_{{S⊆C\\{{c}}}} |S|!·(n−1−|S|)!·
    (v(S∪c) − v(S)) — pure integer sums/products."""
    v_cols = []
    for s in range(1 << _N):
        members = [m for m in range(1, 1 << _N) if m & s]
        v_cols.append(
            f"({' + '.join(f'm_{m}' for m in members)}) AS v_{s}"
            if members
            else f"CAST(0 AS BIGINT) AS v_{s}"
        )
    phi_cols = []
    for i, c in enumerate(_CHANNELS):
        bit = 1 << i
        terms = []
        for s in range(1 << _N):
            if s & bit:
                continue
            k = bin(s).count("1")
            w = factorial(k) * factorial(_N - 1 - k)
            terms.append(f"{w} * (v_{s | bit} - v_{s})")
        phi_cols.append(f"({' + '.join(terms)}) AS phi_{c}")
    return (
        "vs AS (SELECT *, "
        + ", ".join(v_cols)
        + " FROM hist), sh AS (SELECT *, "
        + ", ".join(phi_cols)
        + " FROM vs)"
    )


def _final_sql() -> str:
    selects = [
        f"SELECT '{c}' AS channel, CAST(phi_{c} AS BIGINT) AS shapley_24ths,"
        f" CAST(v_{(1 << _N) - 1} AS BIGINT) AS v_full FROM sh"
        for c in _CHANNELS
    ]
    return " UNION ALL ".join(selects) + " ORDER BY channel"


def _query(events_us: str) -> str:
    return (
        "WITH "
        + _mask_sql(events_us)
        + ", "
        + _shapley_sql()
        + " "
        + _final_sql()
    )


@register("attribution_shapley_exact", _query("epoch_us(ts)"))
def attribution_shapley_exact(spark, sf_dir):
    """Exact Shapley attribution over 4 touch channels — see module
    docstring. Output: per channel the Shapley value in exact 1/24ths of
    a conversion plus v(full); Σ shapley_24ths = 24·v_full by the
    efficiency axiom (exact, integers only)."""
    load_events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(_query("unix_micros(ts)"))
