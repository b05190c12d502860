"""CI smoke for the README 'API quickstart' examples (VERDICT r6 item 8):
the two reference test ports must run exactly as documented.

Reference parity: range_test.cc:6-16 (MapReduceTest) and
dist_map_test.cc:71-88 (LargeMapReduce, golden value N(N-1)/2).
"""

from pyspark.sql import functions as F

from hpmr_spark.core.keyed_map import KeyedMap
from hpmr_spark.core.prange import prange
from hpmr_spark.reducers import Reducer


def test_readme_range_mapreduce(spark):
    # range_test.cc:6-16 — map ids to keys, keep-first, count distinct keys
    n = 100_000
    dm = prange(spark, 0, n).map_reduce_expr(F.col("id"), F.lit(False), Reducer.keep)
    assert dm.n_keys() == n


def test_readme_distmap_large_mapreduce(spark):
    # dist_map_test.cc:71-88 — 1M-key ingest, mapreduce-sum to one key
    N = 1_000_000
    m = KeyedMap.from_df(
        spark.range(N).select(
            F.col("id").cast("string").alias("k"), F.col("id").alias("v")
        ),
        "k",
        "v",
        Reducer.keep,
    )
    assert m.n_keys() == N
    res = m.map_reduce_expr(F.lit(0), F.col("value"), Reducer.sum)
    assert res.get(0) == N * (N - 1) // 2
