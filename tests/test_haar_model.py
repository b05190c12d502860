"""Model test for the Haar commitment used by haar_wavelet_compress:
with ALL coefficients kept, the committed reconstruction formula
recon64_j = S + Σ sign_j(c)·d_c·2^(6−level) must reproduce 64·y_j
EXACTLY — validating the weight/sign derivation both engines share
(cross-engine equality cannot catch an error in the shared formula)."""

import random


def _forward(y):
    """Unnormalized Haar: 6 levels of pairwise (sum, diff).
    Returns (S, details) with details[(lvl, idx)] = d."""
    cur = list(y)
    details = {}
    for lvl in range(1, 7):
        nxt = []
        for i in range(1, len(cur) // 2 + 1):
            a, b = cur[2 * i - 2], cur[2 * i - 1]
            nxt.append(a + b)
            details[(lvl, i)] = a - b
        cur = nxt
    return cur[0], details


def _recon64(j, s, details):
    total = s
    for (lvl, idx), d in details.items():
        lo = (idx - 1) * (1 << lvl)
        hi = idx * (1 << lvl)
        if lo < j <= hi:
            sign = 1 if j <= lo + (1 << (lvl - 1)) else -1
            total += sign * d * (1 << (6 - lvl))
    return total


def test_haar_full_reconstruction_identity():
    rng = random.Random(0xA11CE)
    for _ in range(10):
        y = [rng.randrange(-(10**9), 10**9) for _ in range(64)]
        s, details = _forward(y)
        assert len(details) == 63
        for j in range(1, 65):
            assert _recon64(j, s, details) == 64 * y[j - 1], j


def test_haar_approx_only_is_mean():
    # Keeping only S reconstructs the (scaled) mean everywhere.
    y = list(range(64))
    s, _ = _forward(y)
    assert s == sum(y)
    for j in range(1, 65):
        assert _recon64(j, s, {}) == s
