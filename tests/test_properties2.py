"""Property tests (hypothesis) for the continuation batches' pure-Python
kernels: the mergeable Misra-Gries compress, the position-attribution
credit allocation, the Poisson-bootstrap weight table, and the sign-split
division used by fixed-point power iteration. All engine-free — each
property pins the math the Spark/SQL twins rely on."""

from hypothesis import given, settings, strategies as st


def _mg_ingest(stream, cap=20):
    """Mirror of the mapInPandas sketch: batch-merge counts then compress
    by subtracting the (cap+1)-th largest (mergeable-summary operation)."""
    state: dict = {}
    for batch in stream:
        for w in batch:
            state[w] = state.get(w, 0) + 1
        if len(state) > cap:
            cut = sorted(state.values(), reverse=True)[cap]
            state = {k: c - cut for k, c in state.items() if c > cut}
    return state


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=30), max_size=200),
        max_size=8,
    )
)
def test_mg_superset_property(batches):
    """Any item with global freq > n/cap must survive the sketch, for any
    batching of the stream (the guarantee heavy_hitters_mg rests on)."""
    cap = 20
    state = _mg_ingest(batches, cap)
    counts: dict = {}
    for b in batches:
        for w in b:
            counts[w] = counts.get(w, 0) + 1
    n = sum(counts.values())
    for w, c in counts.items():
        if c * cap > n:
            assert w in state, (w, c, n)


def _credits(k):
    """Python mirror of _CREDIT_CASE in physical_attr_queries."""
    if k == 1:
        return [1000000]
    if k == 2:
        return [500000, 500000]
    mid = 200000 // (k - 2)
    first = 400000 + (200000 - mid * (k - 2))
    return [first] + [mid] * (k - 2) + [400000]


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=1, max_value=500))
def test_position_credits_always_sum_to_one(k):
    cs = _credits(k)
    assert len(cs) == k
    assert sum(cs) == 1000000
    assert all(c >= 0 for c in cs)


def test_poisson_table_is_normalized_and_close():
    """The committed per-mille Poisson(1) table: thresholds partition
    [0,1000) and the implied pmf tracks e^-1/k! within rounding."""
    import math

    # thresholds from _POIS_CASE: 368, 736, 920, 981, 996, 1000
    bounds = [0, 368, 736, 920, 981, 996, 1000]
    pmf = [bounds[i + 1] - bounds[i] for i in range(6)]
    assert sum(pmf) == 1000
    for k in range(5):
        exact = math.exp(-1) / math.factorial(k) * 1000
        assert abs(pmf[k] - exact) <= 1.0, (k, pmf[k], exact)
    # mean of the discretized distribution stays near 1
    mean = sum(k * p for k, p in enumerate(pmf)) / 1000
    assert 0.95 < mean < 1.05


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=-10**15, max_value=10**15),
    st.integers(min_value=1, max_value=10**12),
)
def test_sign_split_division_is_truncation(w, mx):
    """The sign-split renorm used by pca_power_iteration_int equals
    truncation toward zero of w*1e6/mx — the semantics both the Python
    driver loop and the DuckDB CASE compute."""
    got = (w * 1000000 // mx) if w >= 0 else -((-w) * 1000000 // mx)
    num = w * 1000000
    trunc = abs(num) // mx
    expect = trunc if num >= 0 else -trunc
    assert got == expect
