"""Physical-plan assertions for the join-hint operator and the exact
allocation invariant of position-based attribution."""

from pyspark.sql import functions as F

import hpmr_spark.all_queries  # noqa: F401
from hpmr_spark.catalog import QUERIES, _t


def test_merge_hint_changes_strategy_not_answer(spark, sf_dir):
    hinted = QUERIES["join_hint_smj_revenue"](spark, sf_dir)
    plan_hinted = hinted._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan_hinted

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    default = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )
    plan_default = default._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_default  # Catalyst's unhinted pick

    a = sorted(map(tuple, hinted.collect()))
    b = sorted(map(tuple, default.collect()))
    assert a == b


def test_attribution_credits_sum_to_one_per_conversion(spark, sf_dir):
    """Every converting user's credits must total exactly 1e6 ppm —
    the largest-remainder allocation invariant."""
    from hpmr_spark.operators.physical_attr_queries import _CREDIT_CASE
    from hpmr_spark.sources.tables import load_events
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("p_us"))
    )
    touch = (
        ev.join(fp, "user_id")
        .where(
            (F.col("event_type") != "purchase")
            & (F.unix_micros("ts") < F.col("p_us"))
        )
        .select("user_id", F.unix_micros("ts").alias("t_us"), "event_id")
    )
    wa = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    wd = Window.partitionBy("user_id").orderBy(F.desc("t_us"), F.desc("event_id"))
    wk = Window.partitionBy("user_id")
    per_user = (
        touch.select(
            "user_id",
            F.row_number().over(wa).alias("rn_asc"),
            F.row_number().over(wd).alias("rn_desc"),
            F.count(F.lit(1)).over(wk).alias("k"),
        )
        .groupBy("user_id")
        .agg(F.sum(F.expr(_CREDIT_CASE)).alias("total"))
        .collect()
    )
    assert per_user
    for r in per_user:
        assert r.total == 1000000, r.user_id
