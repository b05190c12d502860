"""Brute-force Python models for the round-10 wave-7 operators
(rl_planning_queries), on the sf0.001 slice."""

import hashlib
import math

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_gae_model(spark):
    from hpmr_spark.operators.rl_planning_queries import (
        _GAE_CAP,
        gae_advantage_replay,
    )
    from hpmr_spark.sources.tables import load_events

    rows = (
        load_events(spark, SF)
        .selectExpr(
            "user_id",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS tu",
            "event_id",
            "CASE WHEN event_type = 'purchase'"
            " THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END AS r",
        )
        .collect()
    )
    by_user = {}
    for r in rows:
        v = _h60(f"vf:{r['event_id']}") % 1000
        by_user.setdefault(int(r["user_id"]), []).append(
            (int(r["tu"]), int(r["event_id"]), int(r["r"]), v)
        )
    expect = {}
    for u, evs in by_user.items():
        evs.sort()
        tr = evs[:_GAE_CAP]
        n = len(tr)
        rs = [e[2] for e in tr]
        vs = [e[3] for e in tr]
        ds = [
            float(rs[t]) + 0.9 * (float(vs[t + 1]) if t < n - 1 else 0.0)
            - float(vs[t])
            for t in range(n)
        ]
        a = 0.0
        sf = 0.0
        for d in reversed(ds):
            a = d + 0.855 * a
            sf = sf + math.floor(a * 1e9)
        expect[u] = (n, math.floor(a * 1e9), int(sf))
    got = {
        int(r["user_id"]): (
            int(r["n_steps"]),
            int(r["a0_nano"]),
            int(r["asum_nano"]),
        )
        for r in gae_advantage_replay(spark, SF).collect()
    }
    assert got == expect


def test_condorcet_model(spark):
    from hpmr_spark.operators.rl_planning_queries import (
        condorcet_copeland_winner,
    )

    cust = {
        int(r["c_custkey"]): int(r["c_nationkey"])
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    nat = {
        int(r["n_nationkey"]): int(r["n_regionkey"])
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    cnts = {}
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        key = (nat[cust[int(r["o_custkey"])]], r["o_orderpriority"])
        cnts[key] = cnts.get(key, 0) + 1
    regions = sorted({k[0] for k in cnts})
    prios = sorted({k[1] for k in cnts})
    rank = {}
    for reg in regions:
        order = sorted(
            (p for p in prios if (reg, p) in cnts),
            key=lambda p: (-cnts[(reg, p)], p),
        )
        for i, p in enumerate(order, start=1):
            rank[(reg, p)] = i
    nr = len(regions)
    expect = {}
    for pa in prios:
        beat = lose = pairs = 0
        for pb in prios:
            if pa == pb:
                continue
            wins = sum(
                1
                for reg in regions
                if (reg, pa) in rank
                and (reg, pb) in rank
                and rank[(reg, pa)] < rank[(reg, pb)]
            )
            pairs += 1
            if wins * 2 > nr:
                beat += 1
            elif wins * 2 < nr:
                lose += 1
        expect[pa] = (beat - lose, beat, 1 if beat == pairs else 0)
    got = {
        r["priority"]: (
            int(r["copeland"]),
            int(r["n_beats"]),
            int(r["is_condorcet"]),
        )
        for r in condorcet_copeland_winner(spark, SF).collect()
    }
    assert got == expect


def test_parallelism_model(spark):
    from hpmr_spark.operators.rl_planning_queries import (
        _PM_BATCH_TOKENS,
        _PM_GPUS,
        _PM_SIZES,
        parallelism_memory_plan,
    )

    ct = sum(
        len(r["text"].split(" "))
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    )
    expect = {}
    for n in _PM_SIZES:
        for tp in (1, 8):
            for z in (0, 1):
                shard = tp * ((_PM_GPUS // tp) if z else 1)
                expect[(n, tp, z)] = (
                    _PM_GPUS // tp,
                    16 * n * 1000 // shard // 1073741824,
                    20 * n // _PM_BATCH_TOKENS,
                    (20 * n + ct - 1) // ct,
                )
    got = {
        (int(r["params"]), int(r["tp"]), int(r["zero3"])): (
            int(r["dp_ways"]),
            int(r["mem_gb_milli"]),
            int(r["train_steps"]),
            int(r["corpus_epochs"]),
        )
        for r in parallelism_memory_plan(spark, SF).collect()
    }
    assert got == expect
