"""Core container parity tests, mirroring the reference's golden-value tests
(SURVEY.md §5): range_test.cc, dist_map_test.cc, concurrent_map_test.cc,
hash_set_test.cc workload shapes at reduced N.
"""

import pytest
from pyspark.sql import functions as F

from hpmr_spark import KeyedMap, KeyedSet, Reducer, prange
from tests.conftest import assert_partition_invariant

N = 10_000


def test_prange_distinct_count(spark):
    # range_test.cc:6-16 — emit each i as a key, expect N distinct keys.
    km = prange(spark, 0, N).map_reduce_expr(F.col("id"), F.lit(1), Reducer.sum)
    assert km.n_keys() == N


def test_prange_mapreduce_sum_golden(spark):
    # dist_map_test.cc:71-88 — map all to one key, sum == N(N-1)/2.
    km = prange(spark, 0, N).map_reduce_expr(F.lit(0), F.col("id"), Reducer.sum)
    assert km.get(0) == N * (N - 1) // 2


def test_prange_python_mapper_sum(spark):
    km = prange(spark, 0, 1000).map_reduce(lambda i: [(i % 10, i)], Reducer.sum)
    total = sum(v for _, v in km.items())
    assert total == 1000 * 999 // 2
    assert km.n_keys() == 10


def test_partition_invariance(spark):
    # Same assertions at different shuffle parallelism (ref: n_procs 1 vs 4).
    assert_partition_invariant(
        spark,
        lambda: prange(spark, 0, N).map_reduce_expr(
            F.col("id") % 97, F.col("id"), Reducer.sum
        ),
        lambda km: (km.n_keys() == 97, km.get(0) == sum(i for i in range(N) if i % 97 == 0)),
    )


def test_reducers_sum_min_max(spark):
    # concurrent_map_test.cc:47-58 reducer algebra; min/max use corrected
    # semantics (SURVEY.md §2.2 — reference bodies are transposed).
    pairs = [("a", 5), ("a", 3), ("a", 9), ("b", 1)]
    assert KeyedMap.from_pairs(spark, pairs, Reducer.sum).get("a") == 17
    assert KeyedMap.from_pairs(spark, pairs, Reducer.min).get("a") == 3
    assert KeyedMap.from_pairs(spark, pairs, Reducer.max).get("a") == 9
    assert KeyedMap.from_pairs(spark, pairs, Reducer.max).get("b") == 1


def test_reducers_keep_overwrite_deterministic(spark):
    # keep = first by arrival order, overwrite = last by arrival order.
    pairs = [("a", 5), ("a", 3), ("a", 9)]
    assert KeyedMap.from_pairs(spark, pairs, Reducer.keep).get("a") == 5
    assert KeyedMap.from_pairs(spark, pairs, Reducer.overwrite).get("a") == 9


def test_custom_reducer_rdd_path(spark):
    # user std::function reducer analog (src/dist_map.h:34) — product merge.
    pairs = [(1, 2), (1, 3), (1, 4), (2, 5)]
    km = KeyedMap.from_pairs(spark, pairs, Reducer.custom(lambda a, b: a * b, "prod"))
    assert km.get(1) == 24
    assert km.get(2) == 5


def test_get_default_and_has_unset(spark):
    # dist_map_test.cc:26-31, hash_set_test.cc membership/delete.
    km = KeyedMap.from_pairs(spark, [("x", 1), ("y", 2)])
    assert km.get("z", default=-1) == -1
    assert km.has("x") and not km.has("z")
    km2 = km.unset("x")
    assert not km2.has("x") and km2.n_keys() == 1


def test_get_many_batched(spark):
    km = KeyedMap.from_pairs(spark, [(i, i * i) for i in range(100)])
    got = km.get_many([3, 7, 200])
    assert got == {3: 9, 7: 49}


def test_set_batch_epoch_merge(spark):
    # async_set → sync epochs: batch writes merge into state.
    km = KeyedMap.from_pairs(spark, [("a", 1), ("b", 2)])
    batch = km.df.sparkSession.createDataFrame([("a", 10), ("c", 3)], ["k", "v"])
    merged = km.set_batch(batch, "k", "v", Reducer.sum)
    assert merged.get("a") == 11 and merged.get("b") == 2 and merged.get("c") == 3
    overwritten = km.set_batch(batch, "k", "v", Reducer.overwrite)
    assert overwritten.get("a") == 10 and overwritten.get("b") == 2


def test_set_batch_beats_user_order_col(spark):
    # A map built via from_df with a real-world order column (epoch-micros
    # scale, ≫ 2^40) must still let set_batch's overwrite win: the batch
    # order is derived from max(existing)+1, not a fixed epoch base.
    big = 1_700_000_000_000_000  # epoch-micros ballpark
    src = spark.createDataFrame(
        [("a", 1, big), ("a", 2, big + 5), ("b", 7, big)], ["k", "v", "ord"]
    )
    km = KeyedMap.from_df(src, "k", "v", Reducer.overwrite, order_col="ord")
    assert km.get("a") == 2
    batch = spark.createDataFrame([("a", 99)], ["k", "v"])
    assert km.set_batch(batch, "k", "v", Reducer.overwrite).get("a") == 99
    assert km.set_batch(batch, "k", "v", Reducer.keep).get("a") == 2


def test_chained_map_reduce(spark):
    # DistMap::mapreduce chaining (src/dist_map.h:256-279 result is same type).
    km = prange(spark, 0, 1000).map_reduce_expr(F.col("id") % 100, F.lit(1), Reducer.sum)
    km2 = km.map_reduce_expr(F.col("value"), F.lit(1), Reducer.sum)
    # every one of the 100 keys has count 10 → histogram {10: 100}
    assert km2.get(10) == 100
    assert km2.n_keys() == 1


def test_clear_and_epochs(spark):
    km = KeyedMap.from_pairs(spark, [("a", 1)])
    assert km.clear().n_keys() == 0


def test_keyed_set_ops(spark):
    s1 = KeyedSet.from_keys(spark, [1, 2, 3, 4])
    s2 = KeyedSet.from_keys(spark, [3, 4, 5])
    assert s1.n_keys() == 4
    assert s1.has(2) and not s1.has(9)
    assert s1.union(s2).n_keys() == 5
    assert s1.intersect(s2).n_keys() == 2
    assert s1.difference(s2).n_keys() == 2
    assert s1.unset(1).n_keys() == 3


def test_keyed_set_dedup_on_ingest(spark):
    # hash_set_test.cc:57-71 pattern — duplicate inserts collapse.
    df = spark.range(1000).select((F.col("id") % 100).alias("k"))
    s = KeyedSet.from_df(df, "k")
    assert s.n_keys() == 100


def test_lookup_join_literal_map(spark):
    # hot-lookup idiom: small map becomes a literal Catalyst map column
    km = KeyedMap.from_pairs(spark, [(1, "a"), (2, "b")])
    df = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    out = {r["k"]: r["value"] for r in km.lookup_join(df, "k").collect()}
    assert out == {1: "a", 2: "b", 3: None}
    assert km.to_dict() == {1: "a", 2: "b"}


def test_keyed_set_bulk_membership(spark):
    df = spark.createDataFrame([(i, f"r{i}") for i in range(10)], ["k", "payload"])
    s = KeyedSet.from_keys(spark, [2, 4, 6])
    assert s.filter_members(df, "k").count() == 3
    assert s.filter_non_members(df, "k").count() == 7


def test_custom_partitioner_placement(spark, sf_dir):
    """Every key lands in the partition its hash says — the DistHasher
    contract (placement, not just counts)."""
    from hpmr_spark.sources.tables import load_table

    n, mult = 8, 2654435761
    o = load_table(spark, sf_dir, "orders").select("o_custkey").limit(2000)
    rdd = o.rdd.map(lambda r: (r[0], 1)).partitionBy(
        n, lambda k: (k * mult % 4294967296) % n
    )

    def misplaced(idx, it):
        bad = sum(1 for k, _ in it if (k * mult % 4294967296) % n != idx)
        yield bad

    assert sum(rdd.mapPartitionsWithIndex(misplaced).collect()) == 0


def test_top_k_api(spark):
    """KeyedMap.top_k — the user-facing scale-safe replacement for
    Window.orderBy: TakeOrdered selection + rank over the k-row result, with
    the (value, key) total order making ties deterministic."""
    from hpmr_spark.plans.explain import simple_plan

    km = KeyedMap.from_pairs(
        spark, [(1, 50), (2, 90), (3, 90), (4, 10), (5, 70)]
    )
    got = [(r["key"], r["value"], r["rank"]) for r in km.top_k(3).collect()]
    assert got == [(2, 90, 1), (3, 90, 2), (5, 70, 3)]
    asc = [(r["key"], r["rank"]) for r in km.top_k(2, descending=False).collect()]
    assert asc == [(4, 1), (1, 2)]
    assert "TakeOrderedAndProject" in simple_plan(km.top_k(3))


def test_quantiles_api(spark):
    """KeyedMap.quantiles ≡ NTILE over (value, key) with no single-partition
    window in the plan."""
    from pyspark.sql import Window

    from hpmr_spark.plans.explain import n_single_partition_windows

    km = KeyedMap.from_pairs(spark, [(i, (i * 37) % 100) for i in range(200)])
    got = {r["key"]: r["bucket"] for r in km.quantiles(4).collect()}
    ref = {
        r["key"]: r["b"]
        for r in km.df.select(
            "key", F.ntile(4).over(Window.orderBy("value", "key")).cast("long").alias("b")
        ).collect()
    }
    assert got == ref
    assert n_single_partition_windows(km.quantiles(4)) == 0
