"""Brute-force model tests for the round-6 sequential folds (the
generated-logic risk class: cross-engine parity cannot catch a bug both
the Spark fold and the recursive-CTE oracle share, so each fold is
checked against an independent exhaustive / hand-simulated model)."""

import itertools

import pandas as pd

from hpmr_spark.operators.bandit2_queries import _ucb_fold
from hpmr_spark.operators.schedopt_queries import _wis_fold

# ---------------------------------------------------------------------------
# Weighted interval scheduling vs exhaustive subset enumeration.
# ---------------------------------------------------------------------------


def _wis_brute(intervals):
    """Max total value over all pairwise-compatible subsets (end < start,
    strict — the committed rule)."""
    best = 0
    n = len(intervals)
    for mask in range(1 << n):
        chosen = [intervals[i] for i in range(n) if mask >> i & 1]
        chosen.sort(key=lambda t: t[1])  # by end
        ok = all(
            chosen[i][1] < chosen[i + 1][0] for i in range(len(chosen) - 1)
        )
        if ok:
            best = max(best, sum(v for _, _, v in chosen))
    return best


def _wis_run(intervals):
    pdf = pd.DataFrame(
        {
            "start_us": [s for s, _, _ in intervals],
            "end_us": [e for _, e, _ in intervals],
            "v": [v for _, _, v in intervals],
        }
    )
    out = _wis_fold(pdf)
    assert out["n_sessions"].iloc[0] == len(intervals)
    assert out["total_value_cents"].iloc[0] == sum(v for _, _, v in intervals)
    return int(out["best_value_cents"].iloc[0])


def test_wis_exhaustive_small_cases():
    cases = [
        [(0, 3, 5), (4, 7, 6), (2, 5, 9)],
        [(0, 10, 100), (1, 2, 30), (3, 4, 30), (5, 6, 30), (7, 8, 30)],
        [(0, 1, 1)],
        [(0, 5, 10), (5, 9, 10)],  # touching ends are INcompatible (strict <)
    ]
    for iv in cases:
        assert _wis_run(iv) == _wis_brute(iv), iv


def test_wis_pseudorandom_exhaustive():
    import random

    rng = random.Random(20260815)
    for _ in range(25):
        n = rng.randrange(1, 9)
        iv = []
        used = set()
        for _ in range(n):
            while True:
                s = rng.randrange(0, 40)
                e = s + rng.randrange(1, 12)
                if (s, e) not in used:  # keep (end, start) orders unique
                    used.add((s, e))
                    break
            iv.append((s, e, rng.randrange(1, 50)))
        # ensure unique (end, start) sort keys (the committed total order)
        if len({(e, s) for s, e, _ in iv}) != len(iv):
            continue
        assert _wis_run(iv) == _wis_brute(iv), iv


# ---------------------------------------------------------------------------
# UCB1 replay vs a hand-written step-by-step simulation.
# ---------------------------------------------------------------------------


def _ucb_run(events):
    """events: list of (us, eid, arm, reward)."""
    pdf = pd.DataFrame(
        {
            "us": [e[0] for e in events],
            "eid": [e[1] for e in events],
            "arm": [e[2] for e in events],
            "w": [e[3] for e in events],
        }
    )
    out = _ucb_fold(pdf).set_index("arm")
    return {
        a: (int(out.loc[a, "n_plays"]), int(out.loc[a, "sum_reward"]))
        for a in range(1, 6)
    }


def test_ucb_exploration_phase_takes_unplayed_in_order():
    # During pure exploration the policy wants arm 1, then 2, ... — only
    # logged events matching the pick count.
    events = [(t, t, a, 1) for t, a in enumerate([1, 2, 3, 4, 5])]
    res = _ucb_run(events)
    assert res == {a: (1, 1) for a in range(1, 6)}


def test_ucb_skips_non_matching_logged_arms():
    # Policy wants arm 1 first; a logged arm-3 event is skipped entirely.
    events = [(0, 0, 3, 1), (1, 1, 1, 1)]
    res = _ucb_run(events)
    assert res[1] == (1, 1)
    assert res[3] == (0, 0)


def test_ucb_exploitation_prefers_rewarded_arm():
    # Explore all 5 arms (arm 1 rewarded, others not), then the UCB index
    # of arm 1 (mean 1) beats the others (mean 0, equal ln t / n bonus):
    # the next arm-1 event counts, a same-time arm-2 event would not.
    events = [(t, t, a, 1 if a == 1 else 0) for t, a in enumerate([1, 2, 3, 4, 5])]
    events += [(10, 10, 2, 1), (11, 11, 1, 1)]
    res = _ucb_run(events)
    assert res[1] == (2, 2)  # the second arm-1 event was accepted
    assert res[2] == (1, 0)  # the later arm-2 event was NOT (policy wanted 1)
