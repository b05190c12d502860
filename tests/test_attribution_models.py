"""Brute-force Python model tests for the GENERATED attribution texts.

The removal-effect DP and the Shapley enumeration are generated SQL
shared (modulo idiom tokens) by both engines — a generator bug would
pass the oracle gate on identical-but-wrong text (the unigram-Viterbi
lesson, CLAUDE.md round 5). These tests rebuild both models from first
principles in plain Python over a tiny synthetic event log and compare
against the Spark query output on that same log.
"""

from __future__ import annotations

import math
from itertools import combinations

import pytest
from pyspark.sql import functions as F

CHANNELS = ["click", "view", "signup", "error"]

# (user_id, seq, event_type): deliberately includes a no-touch converter
# (u6), a non-converter (u4), post-purchase touches (u1), a same-user
# second purchase (u2), and journeys hitting every channel.
EVENTS = [
    (1, 1, "click"), (1, 2, "view"), (1, 3, "purchase"), (1, 4, "error"),
    (2, 1, "view"), (2, 2, "view"), (2, 3, "signup"), (2, 4, "purchase"),
    (2, 5, "purchase"),
    (3, 1, "error"), (3, 2, "click"), (3, 3, "click"), (3, 4, "purchase"),
    (4, 1, "click"), (4, 2, "signup"), (4, 3, "error"),
    (5, 1, "signup"), (5, 2, "purchase"),
    (6, 1, "purchase"),
    (7, 1, "view"), (7, 2, "error"), (7, 3, "view"),
]


def _events_df(spark):
    base = 1_700_000_000_000_000
    rows = [
        (u * 100 + i, u, et, base + i * 1_000_000)
        for (u, i, et) in EVENTS
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_us long"
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )


def _journeys():
    """(touches, converts) per user under the first-purchase contract."""
    out = {}
    by_user = {}
    for u, i, et in EVENTS:
        by_user.setdefault(u, []).append((i, et))
    for u, evs in by_user.items():
        evs.sort()
        fp = next((i for i, et in evs if et == "purchase"), None)
        touches = [
            et for i, et in evs if et != "purchase" and (fp is None or i < fp)
        ]
        out[u] = (touches, fp is not None)
    return out


def _model_removal_effect():
    # transition counts
    trans = {}
    for touches, conv in _journeys().values():
        if not touches:
            if conv:
                trans[("start", "conv")] = trans.get(("start", "conv"), 0) + 1
            continue
        prev = "start"
        for t in touches:
            trans[(prev, t)] = trans.get((prev, t), 0) + 1
            prev = t
        end = "conv" if conv else "nul"
        trans[(prev, end)] = trans.get((prev, end), 0) + 1
    tot = {}
    for (s, d), c in trans.items():
        tot[s] = tot.get(s, 0) + c
    p = {
        (s, d): (c * 1_000_000) // tot[s]
        for (s, d), c in trans.items()
    }

    def dp(removed):
        srcs = ["start"] + [c for c in CHANNELS if c != removed]
        mass = {s: 0 for s in CHANNELS}
        conv = 0
        # step 1 from start
        for d in CHANNELS:
            if d == removed:
                continue
            mass[d] = (1_000_000 * p.get(("start", d), 0)) // 1_000_000
        conv += (1_000_000 * p.get(("start", "conv"), 0)) // 1_000_000
        for _ in range(2, 7):
            new = {s: 0 for s in CHANNELS}
            for d in CHANNELS:
                if d == removed:
                    continue
                new[d] = sum(
                    (mass[s] * p.get((s, d), 0)) // 1_000_000
                    for s in CHANNELS
                    if s != removed
                )
            conv += sum(
                (mass[s] * p.get((s, "conv"), 0)) // 1_000_000
                for s in CHANNELS
                if s != removed
            )
            mass = new
        return conv

    full = dp(None)
    out = {}
    for c in CHANNELS:
        rem = dp(c)
        re = ((full - rem) * 1_000_000) // full if full > 0 else 0
        out[c] = (full, rem, re)
    return out


def _model_shapley():
    masks = {}
    for touches, conv in _journeys().values():
        if not conv or not touches:
            continue
        m = 0
        for t in set(touches):
            m |= 1 << CHANNELS.index(t)
        masks[m] = masks.get(m, 0) + 1

    def v(S):
        return sum(c for m, c in masks.items() if m & S)

    out = {}
    for i, c in enumerate(CHANNELS):
        bit = 1 << i
        phi = 0
        others = [b for b in range(4) if b != i]
        for k in range(4):
            for combo in combinations(others, k):
                S = sum(1 << b for b in combo)
                w = math.factorial(k) * math.factorial(3 - k)
                phi += w * (v(S | bit) - v(S))
        out[c] = (phi, v(15))
    return out


def test_removal_effect_matches_brute_force(spark):
    import hpmr_spark.operators.attribution2_queries as aq

    df = _events_df(spark)
    df.createOrReplaceTempView("events")
    got = {
        r["channel"]: (
            r["conv_full_ppm"],
            r["conv_removed_ppm"],
            r["removal_effect_ppm"],
        )
        for r in spark.sql(
            aq._full_query("div", "unix_micros(ts)", "DECIMAL(38,0)")
        ).collect()
    }
    assert got == _model_removal_effect()


def test_shapley_matches_brute_force(spark):
    import hpmr_spark.operators.shapley_queries as sq

    df = _events_df(spark)
    df.createOrReplaceTempView("events")
    got = {
        r["channel"]: (r["shapley_24ths"], r["v_full"])
        for r in spark.sql(sq._query("unix_micros(ts)")).collect()
    }
    model = _model_shapley()
    assert got == model
    # efficiency axiom: sum phi = 24 * v(full)
    v_full = next(iter(model.values()))[1]
    assert sum(p for p, _ in model.values()) == 24 * v_full
