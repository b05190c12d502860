"""Property-based tests: KeyedMap reducer semantics vs a Python-dict
reference model (the analog of the reference's STL-comparison tests,
SURVEY.md §5 — same workload against the trusted in-memory implementation).
"""

from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hpmr_spark import KeyedMap, Reducer

pairs_strategy = st.lists(
    st.tuples(st.integers(0, 8), st.integers(-1000, 1000)), min_size=1, max_size=40
)


def _model(pairs, merge, init_from_first=True):
    out = {}
    for k, v in pairs:
        out[k] = merge(out[k], v) if k in out else v
    return out


@pytest.mark.parametrize(
    "reducer,merge",
    [
        (Reducer.sum, lambda a, b: a + b),
        (Reducer.min, min),
        (Reducer.max, max),
        (Reducer.keep, lambda a, b: a),
        (Reducer.overwrite, lambda a, b: b),
    ],
    ids=["sum", "min", "max", "keep", "overwrite"],
)
@given(pairs=pairs_strategy)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_reducer_matches_dict_model(spark, reducer, merge, pairs):
    km = KeyedMap.from_pairs(spark, pairs, reducer)
    got = dict(km.items())
    assert got == _model(pairs, merge)


def test_epoch_lineage_stress(spark):
    """10 async_set→sync epochs with periodic checkpoint — state stays
    correct and the plan doesn't blow up (SURVEY.md §7.3 risk b)."""
    km = KeyedMap.from_pairs(spark, [(0, 0)], Reducer.sum)
    expect = defaultdict(int, {0: 0})
    for e in range(10):
        batch = [(i % 5, i + e) for i in range(10)]
        for k, v in batch:
            expect[k] += v
        bdf = spark.createDataFrame(batch, ["k", "v"])
        km = km.set_batch(bdf, "k", "v", Reducer.sum)
        if e % 4 == 3:
            km = km.checkpoint()
    got = dict(km.items())
    assert got == dict(expect)
