"""Brute-force Python models for the round-10 wave-13 operators
(cascade_scan_queries), on the sf0.001 slice."""

import hashlib

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_cascade_model(spark):
    from hpmr_spark.operators.cascade_scan_queries import (
        _CA_CHEAP_COST,
        _CA_EXP_COST,
        _CA_TAUS,
        cascade_routing_frontier,
    )
    from hpmr_spark.operators.mleval_queries import _scored

    rows = [
        (int(r["vec_id"]), int(r["y"]), int(r["score_ppm"]))
        for r in _scored(spark, SF).collect()
    ]
    expect = {}
    for tau in _CA_TAUS:
        n = len(rows)
        routed = acc = 0
        for vid, y, s1 in rows:
            s2 = _h60(f"exp:{vid}") % 400000 + y * 600000
            margin = abs(s1 - 500000)
            if margin < tau:
                routed += 1
                yhat = 1 if s2 >= 500000 else 0
            else:
                yhat = 1 if s1 >= 500000 else 0
            acc += yhat == y
        expect[tau] = (
            n,
            routed,
            routed * 1000000 // n,
            acc * 1000000 // n,
            n * _CA_CHEAP_COST + routed * _CA_EXP_COST,
        )
    got = {
        int(r["tau_ppm"]): (
            int(r["n"]),
            int(r["n_routed"]),
            int(r["route_ppm"]),
            int(r["acc_ppm"]),
            int(r["cost_units"]),
        )
        for r in cascade_routing_frontier(spark, SF).collect()
    }
    assert got == expect
    # the frontier must be a REAL trade: expensive-always (tau=500000)
    # strictly beats cheap-always (tau=0) on accuracy, at higher cost
    assert got[500000][3] > got[0][3]
    assert got[500000][4] > got[0][4]


def test_kadane_model(spark):
    from hpmr_spark.operators.cascade_scan_queries import kadane_max_subarray

    days = {}
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        d = r["o_orderdate"].date()
        days[d] = days.get(d, 0) + int(round(float(r["o_totalprice"]) * 100))
    xs = [c for _d, c in sorted(days.items())]
    ds = [xs[i] - xs[i - 1] for i in range(1, len(xs))]
    best = cur = -(10**15)
    bl = br = cl = 0
    for i, x in enumerate(ds, start=1):
        if cur < 0:
            cur = x
            cl = i
        else:
            cur = cur + x
        if cur > best:
            best = cur
            bl, br = cl, i
    # brute-force cross-check of the value on a slice
    n = len(ds)
    brute = max(
        sum(ds[i:j]) for i in range(min(n, 200)) for j in range(i + 1, min(n, 200) + 1)
    )
    row = kadane_max_subarray(spark, SF).collect()[0]
    assert (
        int(row["n_days"]),
        int(row["best_sum_cents"]),
        int(row["best_start_idx"]),
        int(row["best_end_idx"]),
    ) == (len(xs), best, bl, br)
    # Kadane over the full series is >= any windowed brute-force slice
    assert best >= brute
