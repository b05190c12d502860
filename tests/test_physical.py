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


def test_aqe_skew_join_splits_partition(spark):
    """AQE's runtime skew-join handling (the zero-code complement to
    operators/skew.py's salting): a 90%-one-key join must come back as
    SortMergeJoin(skew=true) with an AQEShuffleRead that is 'coalesced
    and skewed' — proof the hot partition was SPLIT at runtime, the
    mitigation a 1000-executor deployment leans on when keys skew
    unpredictably. Thresholds are lowered to make the local fixture's
    partitions register as skewed; results are checked exactly too."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").groupBy().agg(
            F.sum("v").alias("sv"), F.count("*").alias("n")
        )
        row = j.collect()[0]
        # exact expectation: key 0 matches the 180000 non-multiple rows
        # PLUS id=0 itself; right keys 10..990 (multiples of 10) match once
        tens = [k for k in range(10, 1000, 10)]
        assert row["n"] == 180001 + len(tens)
        assert row["sv"] == sum(
            v for v in range(200000) if v % 10 != 0
        ) + 0 + sum(tens)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
        assert "coalesced and skewed" in plan, plan[:1500]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
