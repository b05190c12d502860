"""Brute-force Python models for the round-10 wave-9 operators
(fairness_quality_queries), on the sf0.001 slice."""

import hashlib
import math

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _scored_py(spark):
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    out = []
    for r in rows:
        # mirror mleval_queries._scored's committed construction via the
        # query itself (imported) to avoid re-deriving _H here
        out.append(r)
    return rows


def test_fairness_model(spark):
    from hpmr_spark.operators.fairness_quality_queries import (
        _FA_THRESH,
        fairness_equalized_odds_audit,
    )
    from hpmr_spark.operators.mleval_queries import _scored

    scored = {
        int(r["vec_id"]): (int(r["y"]), int(r["score_ppm"]))
        for r in _scored(spark, SF).collect()
    }
    grp_of = {
        int(r["vec_id"]): int(r["label"]) % 3
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    per = {}
    for vid, (y, s) in scored.items():
        g = grp_of[vid]
        n, sel, pos, tp, fp = per.get(g, (0, 0, 0, 0, 0))
        yes = s >= _FA_THRESH
        per[g] = (
            n + 1,
            sel + yes,
            pos + y,
            tp + (yes and y == 1),
            fp + (yes and y == 0),
        )
    rates = {}
    for g, (n, sel, pos, tp, fp) in per.items():
        rates[g] = (
            n,
            sel * 1000000 // n,
            tp * 1000000 // pos if pos else None,
            fp * 1000000 // (n - pos) if n - pos else None,
        )
    sels = [r[1] for r in rates.values()]
    tprs = [r[2] for r in rates.values() if r[2] is not None]
    fprs = [r[3] for r in rates.values() if r[3] is not None]
    gaps = (
        max(sels) - min(sels),
        max(tprs) - min(tprs),
        max(fprs) - min(fprs),
    )
    got = {
        int(r["grp"]): (
            int(r["n"]),
            int(r["sel_ppm"]),
            int(r["tpr_ppm"]),
            int(r["fpr_ppm"]),
            int(r["dp_gap_ppm"]),
            int(r["tpr_gap_ppm"]),
            int(r["fpr_gap_ppm"]),
        )
        for r in fairness_equalized_odds_audit(spark, SF).collect()
    }
    for g, (n, sel, tpr, fpr) in rates.items():
        assert got[g] == (n, sel, tpr, fpr, *gaps)


def test_ewma_model(spark):
    from hpmr_spark.operators.fairness_quality_queries import (
        ewma_control_chart,
    )

    days = {}
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        d = r["o_orderdate"].date()
        days[d] = days.get(d, 0) + int(round(float(r["o_totalprice"]) * 100))
    xs = [c // 100 for _d, c in sorted(days.items())]
    n = len(xs)
    sx = sum(xs)
    sxx = sum(x * x for x in xs)
    mu = float(sx) / float(n)
    var = (float(n) * float(sxx) - float(sx) * float(sx)) / (
        float(n) * (float(n) - 1)
    )
    z = mu
    pw = 1.0
    nb = 0
    first = 0.0
    t = 0.0
    for x in xs:
        z = z + (float(x) - z) / 4.0
        pw = pw * 0.5625
        breach = (z - mu) * (z - mu) > 9.0 * var * (1.0 - pw) / 7.0
        if breach:
            nb += 1
            if first == 0.0:
                first = t + 1.0
        t += 1.0
    row = ewma_control_chart(spark, SF).collect()[0]
    assert (
        int(row["n_days"]),
        int(row["n_breach"]),
        int(row["first_breach_t"]),
        int(row["final_z_micro"]),
    ) == (n, nb, int(first), math.floor(z * 1e6))


def test_rbp_model(spark):
    from hpmr_spark.operators.fairness_quality_queries import (
        rbp_ranking_metric,
    )

    cust = {
        int(r["c_custkey"]): int(r["c_nationkey"])
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    spend = {}
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        key = (cust[int(r["o_custkey"])], int(r["o_custkey"]))
        spend[key] = spend.get(key, 0) + int(
            round(float(r["o_totalprice"]) * 100)
        )
    by_nation = {}
    for (nk, ck), cents in spend.items():
        by_nation.setdefault(nk, []).append((-cents, ck))
    expect = {}
    for nk, rows in by_nation.items():
        rows.sort()
        top = rows[:10]
        maxc = -top[0][0]
        num = 0
        for k, (negc, _ck) in enumerate(top, start=1):
            if (4 * -negc) // (maxc + 1) >= 2:
                num += 1 << (10 - k)
        expect[nk] = (len(top), num * 1000000 // 1024)
    got = {
        int(r["nationkey"]): (int(r["n_ranked"]), int(r["rbp_micro"]))
        for r in rbp_ranking_metric(spark, SF).collect()
    }
    assert got == expect
