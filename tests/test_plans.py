"""Plan-quality regression tests: lock in the physical plans that survive a
100× scale-up — pushdown, pruning, broadcast joins, map-side combine.
These assert on .explain('formatted') output, not results."""

import pytest

import hpmr_spark.all_queries  # noqa: F401
from hpmr_spark.catalog import QUERIES
from hpmr_spark.plans.explain import (
    formatted_plan,
    has_broadcast_join,
    n_shuffles,
    scan_info,
)


def test_filter_and_projection_reach_scan(spark, sf_dir):
    df = QUERIES["filter_projection_pushdown"](spark, sf_dir)
    scans = scan_info(df)
    assert scans, "no parquet scan found in plan"
    s = scans[0]
    assert "l_shipdate" in s["pushed_filters"] and "l_quantity" in s["pushed_filters"], (
        f"filters not pushed: {s['pushed_filters']}"
    )
    # projection pruning: only the 3 referenced columns read, not all 11
    assert set(s["read_columns"]) == {"l_orderkey", "l_quantity", "l_shipdate"}, (
        f"scan reads too much: {s['read_columns']}"
    )


def test_revenue_agg_prunes_columns(spark, sf_dir):
    df = QUERIES["mapreduce_revenue_by_order"](spark, sf_dir)
    s = scan_info(df)[0]
    assert set(s["read_columns"]) == {"l_orderkey", "l_extendedprice", "l_discount"}


def test_dim_join_broadcasts(spark, sf_dir):
    df = QUERIES["join_broadcast_part_revenue"](spark, sf_dir)
    assert has_broadcast_join(df)
    # fact side should not shuffle for the join itself; one exchange for the agg
    assert n_shuffles(df) <= 2, formatted_plan(df)


def test_multiway_join_broadcasts_dims(spark, sf_dir):
    df = QUERIES["join_multiway_region_revenue"](spark, sf_dir)
    assert has_broadcast_join(df)


def test_keyed_agg_single_shuffle(spark, sf_dir):
    """The mapreduce kernel must be exactly one shuffle (partial agg map-side,
    final agg reduce-side) — the reference's async_set+sync epoch shape."""
    df = QUERIES["mapreduce_revenue_by_order"](spark, sf_dir)
    assert n_shuffles(df) == 1, formatted_plan(df)


def test_partial_aggregation_present(spark, sf_dir):
    plan = formatted_plan(QUERIES["mapreduce_revenue_by_order"](spark, sf_dir))
    assert "HashAggregate" in plan
    assert plan.count("HashAggregate") >= 2, "no partial+final agg split"


def test_bucketed_join_no_exchange_under_join(spark, sf_dir):
    """Co-located bucketed join: SortMergeJoin reads pre-bucketed tables —
    zero Exchange under the join; the only shuffle is the final aggregation."""
    df = QUERIES["bucketed_join_revenue"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan
    assert n_shuffles(df) == 1, plan  # agg only — join side exchange-free


def test_topk_no_global_sort(spark, sf_dir):
    plan = formatted_plan(QUERIES["topk_global_orders"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_partitioned_sink_read_prunes_partitions(spark, sf_dir):
    """Reading back a lang-partitioned write with lang='en' must prune at the
    partition level (directory skip), not as a data filter, and the scan
    must read only the referenced data columns."""
    from hpmr_spark.operators.relational9 import sink_partitioned_pruned

    df = sink_partitioned_pruned(spark, sf_dir)
    plan = formatted_plan(df)
    assert "PartitionFilters: [isnotnull(lang" in plan and "= en)" in plan, plan
    s = scan_info(df)[0]
    assert set(s["read_columns"]) == {"source", "n_chars"}, s["read_columns"]
