"""Python-model cross-checks for round-3 algorithms (the reference's golden
-test discipline, SURVEY.md §5): each operator is re-implemented in a few
lines of plain Python on a tiny fixture and must agree exactly."""

import math

from pyspark.sql import functions as F


def test_lpa_model_two_cliques(spark):
    """Two 3-cliques joined by one bridge edge: after 3 synchronous
    min-tie-break rounds each clique converges to its minimum label, and
    the model replays the exact update rule."""
    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    both = edges + [(b, a) for a, b in edges]
    nodes = sorted({a for a, _ in both})
    lab = {n: n for n in nodes}
    for _ in range(3):
        new = {}
        for n in nodes:
            neigh = [lab[d] for s, d in both if s == n]
            counts = {}
            for x in neigh:
                counts[x] = counts.get(x, 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[n] = best
        lab = new

    from pyspark.sql import Window

    ed = spark.createDataFrame(both, "src long, dst long")
    l = ed.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    for _ in range(3):
        n = (
            ed.join(l.select(F.col("node").alias("dst"), "lab"), "dst")
            .groupBy(F.col("src").alias("node"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("lab"))
        best = (
            n.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("node", F.col("lab").alias("blab"))
        )
        l = l.join(best, "node", "left").select(
            "node", F.coalesce("blab", "lab").alias("lab")
        )
    got = {r["node"]: r["lab"] for r in l.collect()}
    assert got == lab


def test_interpolation_model(spark, sf_dir):
    """interpolate_hourly_gaps must equal the pure-python sign-split linear
    interpolation replayed over the same hourly aggregate."""
    import hpmr_spark.all_queries  # noqa: F401
    from hpmr_spark.catalog import QUERIES
    from hpmr_spark.sources.tables import load_events

    ev = load_events(spark, sf_dir)
    hourly = sorted(
        (r["hr"], r["cents"])
        for r in ev.where(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
        .collect()
    )
    want = {}
    for i, (hr, cents) in enumerate(hourly):
        if i + 1 < len(hourly):
            nhr, ncents = hourly[i + 1]
            gap = int((nhr - hr).total_seconds()) // 3600
        else:
            nhr, ncents, gap = None, None, 1
        want[hr] = (True, cents)
        for step in range(1, gap):
            d = ncents - cents
            if d >= 0:
                v = cents + d * step // gap
            else:
                v = cents - ((-d) * step // gap)
            from datetime import timedelta

            want[hr + timedelta(hours=step)] = (False, v)
    got = {
        r["hr"]: (r["observed"], r["cents"])
        for r in QUERIES["interpolate_hourly_gaps"](spark, sf_dir).collect()
    }
    assert got == want


def test_spearman_model(spark, sf_dir):
    """spearman_freq_revenue's rho must match scipy-free python Spearman
    with average ranks over the same per-customer metrics."""
    import hpmr_spark.all_queries  # noqa: F401
    from hpmr_spark.catalog import QUERIES
    from hpmr_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    rows = (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        )
        .collect()
    )
    xs = [r["freq"] for r in rows]
    ys = [r["cents"] for r in rows]

    def avg_rank2(vals):
        # doubled average rank, exactly as the query computes it
        s = sorted(vals)
        first = {}
        cnt = {}
        for i, v in enumerate(s):
            first.setdefault(v, i + 1)
            cnt[v] = cnt.get(v, 0) + 1
        return [2 * first[v] + cnt[v] - 1 for v in vals]

    rx, ry = avg_rank2(xs), avg_rank2(ys)
    n = len(rx)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(a * a for a in rx)
    syy = sum(a * a for a in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    want = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    got = QUERIES["spearman_freq_revenue"](spark, sf_dir).collect()[0]
    assert got["n"] == n
    assert abs(got["spearman_rho"] - want) < 1e-12
