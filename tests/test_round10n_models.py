"""Brute-force Python model for the round-10 wave-15 operator
(survival2_queries), on the sf0.001 slice: the KM curve is re-derived in
plain Python (independent of both engines' SQL) and RMST integrated over
the same committed ppm floors."""

import math

SF = "/root/testdata/sf0.001"


def test_rmst_model(spark):
    from hpmr_spark.operators.survival2_queries import rmst_survival_time
    from hpmr_spark.sources.tables import load_events

    rows = (
        load_events(spark, SF)
        .selectExpr(
            "user_id",
            "unix_micros(CAST(ts AS TIMESTAMP)) AS tu",
            "event_type",
        )
        .collect()
    )
    per = {}
    for r in rows:
        u = int(r["user_id"])
        t = int(r["tu"])
        t0, terr, tlast = per.get(u, (None, None, None))
        t0 = t if t0 is None else min(t0, t)
        tlast = t if tlast is None else max(tlast, t)
        if r["event_type"] == "error":
            terr = t if terr is None else min(terr, t)
        per[u] = (t0, terr, tlast)
    obs = [
        ((terr - t0) if terr is not None else (tlast - t0), terr is not None)
        for t0, terr, tlast in per.values()
    ]
    total = len(obs)
    # grouped death table, KM in the committed log-domain ppm floors
    g = {}
    for dur, died in obs:
        cnt, d = g.get(dur, (0, 0))
        g[dur] = (cnt + 1, d + died)
    lt = 0
    cum_nano = 0
    zeroed = False
    curve = []
    for dur in sorted(g):
        cnt, d = g[dur]
        n_risk = total - lt
        if d > 0:
            if n_risk > d:
                cum_nano += math.floor(
                    math.log(n_risk / (n_risk - d)) * 1e9
                )
            else:
                zeroed = True
            s_ppm = (
                0
                if zeroed
                else math.floor(math.exp(-cum_nano / 1e9) * 1e6)
            )
            curve.append((dur, s_ppm))
        lt += cnt
    k = len(curve)
    t1 = curve[0][0]
    tau = curve[-1][0]
    inner = sum(
        curve[i][1] * (curve[i + 1][0] - curve[i][0]) for i in range(k - 1)
    )
    rmst = (1000000 * t1 + inner) // 1000000
    ratio = (1000000 * t1 + inner) // max(tau, 1)
    row = rmst_survival_time(spark, SF).collect()[0]
    assert (
        int(row["n_death_times"]),
        int(row["tau_us"]),
        int(row["rmst_us"]),
        int(row["rmst_ratio_ppm"]),
    ) == (k, tau, rmst, ratio)
    # RMST is bounded by the horizon and positive
    assert 0 < rmst <= tau
