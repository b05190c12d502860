"""Brute-force model tests for the DTW fold (the generated-text risk
class: cross-engine parity cannot catch a bug both formulations share,
so the fold is checked against hand-computed DP values)."""

import pandas as pd

from hpmr_spark.operators.dtw_queries import _dtw_fold


def _run(a, b):
    n = len(a)
    pdf = pd.DataFrame(
        {
            "nk_a": [1] * n,
            "nk_b": [2] * n,
            "rel": list(range(n)),
            "ya": a,
            "yb": b,
        }
    )
    out = _dtw_fold(pdf)
    assert out["m_len"].iloc[0] == n
    return int(out["dtw_cents"].iloc[0])


def test_dtw_hand_computed():
    # cost matrix [[1,2,5],[2,1,2],[5,4,1]] -> optimal path 1+1+1 = 3
    assert _run([0, 3, 6], [1, 2, 5]) == 3


def test_dtw_identical_series_is_zero():
    assert _run([5, 1, 4, 4, 9], [5, 1, 4, 4, 9]) == 0


def test_dtw_single_point():
    assert _run([7], [3]) == 4


def test_dtw_constant_shift():
    # constant series: every cell costs |c1-c2|; path length = 2n-1... but
    # DTW takes the diagonal (n steps): n * |c1-c2|
    assert _run([10, 10, 10], [4, 4, 4]) == 3 * 6


def test_dtw_warping_beats_lockstep():
    # a stretched copy should be near-zero even though lockstep distance
    # (Euclidean) would be large
    assert _run([0, 0, 5, 5], [0, 5, 5, 5]) == 0
