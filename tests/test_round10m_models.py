"""Brute-force Python models for the round-10 wave-14 operators
(raking_energy_queries), on the sf0.001 slice."""

import datetime
import math

SF = "/root/testdata/sf0.001"
_EPOCH = datetime.date(1970, 1, 1)


def test_ipf_model(spark):
    from hpmr_spark.operators.raking_energy_queries import (
        _IPF_ITERS,
        _IPF_P,
        _IPF_R,
        ipf_raking_weights,
    )

    cust = {
        int(r["c_custkey"]): int(r["c_nationkey"])
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    nat = {
        int(r["n_nationkey"]): int(r["n_regionkey"])
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    w = [[0.0] * _IPF_P for _ in range(_IPF_R)]
    n = 0
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        reg = nat[cust[int(r["o_custkey"])]]
        pr = int(r["o_orderpriority"][0])
        w[reg][pr - 1] += 1.0
        n += 1
    tgt = float(n) / 5.0
    for step in range(_IPF_ITERS):
        if step % 2 == 0:
            # row scaling — mirror the fold: every cell computed from the
            # PRE-step matrix (the fold builds the whole new array at once)
            nw = [
                [
                    w[i][j] * tgt / sum(w[i])
                    for j in range(_IPF_P)
                ]
                for i in range(_IPF_R)
            ]
        else:
            nw = [
                [
                    w[i][j] * tgt / sum(w[k][j] for k in range(_IPF_R))
                    for j in range(_IPF_P)
                ]
                for i in range(_IPF_R)
            ]
        w = nw
    expect = {
        (i, j + 1): math.floor(w[i][j] * 1000)
        for i in range(_IPF_R)
        for j in range(_IPF_P)
    }
    got = {
        (int(r["region"]), int(r["priority_class"])): int(
            r["raked_weight_milli"]
        )
        for r in ipf_raking_weights(spark, SF).collect()
    }
    assert got == expect
    # after the final ROW... col scaling, column margins hit the target
    for j in range(_IPF_P):
        col = sum(w[i][j] for i in range(_IPF_R))
        assert abs(col - tgt) < 1e-6 * tgt


def test_energy_model(spark):
    from hpmr_spark.operators.raking_energy_queries import (
        energy_distance_twosample,
    )

    days = {}
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        d = r["o_orderdate"].date()
        days[d] = days.get(d, 0) + int(round(float(r["o_totalprice"]) * 100))
    wd = [c // 100 for d, c in days.items() if ((d - _EPOCH).days + 3) % 7 < 5]
    we = [c // 100 for d, c in days.items() if ((d - _EPOCH).days + 3) % 7 >= 5]
    n, m = len(wd), len(we)
    sab = sum(abs(a - b) for a in wd for b in we)
    saa = sum(abs(a - b) for a in wd for b in wd)
    sbb = sum(abs(a - b) for a in we for b in we)
    num = (2 * sab * n * m - saa * m * m - sbb * n * n) * 1000
    e = num // (n * n * m * m)
    row = energy_distance_twosample(spark, SF).collect()[0]
    assert (
        int(row["na"]),
        int(row["nb"]),
        int(row["sum_ab"]),
        int(row["sum_aa"]),
        int(row["sum_bb"]),
        int(row["e_milli_dollars"]),
    ) == (n, m, sab, saa, sbb, e)
    # energy distance is nonnegative (V-statistic form)
    assert e >= 0
