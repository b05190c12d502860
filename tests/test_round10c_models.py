"""Brute-force Python models for the round-10 wave-3 operators
(symbolic_stats_queries), on the sf0.001 slice."""

import datetime
import hashlib
import math

SF = "/root/testdata/sf0.001"
_EPOCH = datetime.date(1970, 1, 1)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _day_cents(spark):
    days = {}
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        ed = (r["o_orderdate"].date() - _EPOCH).days
        days[ed] = days.get(ed, 0) + int(round(float(r["o_totalprice"]) * 100))
    return days


def test_sax_model(spark):
    from hpmr_spark.operators.symbolic_stats_queries import (
        _SAX_W,
        _SAX_WORD,
        sax_symbolic_motifs,
    )

    days = _day_cents(spark)
    paa = {}
    for ed, c in days.items():
        b = ed // _SAX_W
        s, n = paa.get(b, (0, 0))
        paa[b] = (s + c, n + 1)
    means = {b: s // n for b, (s, n) in paa.items()}
    order = sorted((m, b) for b, m in means.items())
    nb = len(order)
    sym_of = {b: (rk * 4) // nb for rk, (_m, b) in enumerate(order)}
    arr = [str(sym_of[b]) for b in sorted(means)]
    expect = {}
    for i in range(len(arr) - _SAX_WORD + 1):
        w = "".join(arr[i : i + _SAX_WORD])
        expect[w] = expect.get(w, 0) + 1
    got = {
        r["word"]: int(r["cnt"])
        for r in sax_symbolic_motifs(spark, SF).collect()
    }
    assert got == expect


def test_renyi_model(spark):
    from hpmr_spark.operators.symbolic_stats_queries import (
        renyi_efficiency_alpha2,
    )

    cnt = {}
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        for w in r["text"].split(" "):
            cnt[(r["lang"], w)] = cnt.get((r["lang"], w), 0) + 1
    per = {}
    for (lang, _w), c in cnt.items():
        n, s2, v = per.get(lang, (0, 0, 0))
        per[lang] = (n + c, s2 + c * c, v + 1)
    expect = {}
    for lang, (n, s2, v) in per.items():
        h2 = 2 * math.log(n) - math.log(s2)
        expect[lang] = (
            n,
            v,
            math.floor(h2 * 1e9),
            math.floor(h2 / math.log(v) * 1e6),
        )
    got = {
        r["lang"]: (
            int(r["n_tokens"]),
            int(r["n_types"]),
            int(r["h2_nano"]),
            int(r["renyi_eff_ppm"]),
        )
        for r in renyi_efficiency_alpha2(spark, SF).collect()
    }
    assert got == expect


def test_bh_model(spark):
    from hpmr_spark.operators.symbolic_stats_queries import (
        _BH_ALPHA_PPM,
        bh_fdr_control,
    )

    cells = {
        (r["lang"], r["source"])
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    ps = {}
    for lang, src in cells:
        base = _h60(f"bh:{lang}:{src}") % 1000000
        sig = _h60(f"bhsig:{lang}:{src}") % 5
        ps[(lang, src)] = base // 100 if sig == 0 else base
    m = len(ps)
    order = sorted((p, f"{lang}:{src}", lang, src) for (lang, src), p in ps.items())
    kstar = 0
    for i, (p, _tb, _l, _s) in enumerate(order):
        if p * m <= (i + 1) * _BH_ALPHA_PPM:
            kstar = i + 1
    expect = {
        (lang, src): (p, i + 1, 1 if i + 1 <= kstar else 0)
        for i, (p, _tb, lang, src) in enumerate(order)
    }
    got = {
        (r["lang"], r["source"]): (
            int(r["p_ppm"]),
            int(r["rk"]),
            int(r["rejected"]),
        )
        for r in bh_fdr_control(spark, SF).collect()
    }
    assert got == expect
    # the planted signals must actually produce rejections
    assert kstar > 0


def test_mh_model(spark):
    from hpmr_spark.operators.symbolic_stats_queries import (
        mantel_haenszel_pooled_or,
    )

    ret = {}
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        if r["l_returnflag"] == "R":
            ret[int(r["l_orderkey"])] = 1
    cust = {
        int(r["c_custkey"]): int(r["c_nationkey"])
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    nat = {
        int(r["n_nationkey"]): int(r["n_regionkey"])
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    strata = {}
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        region = nat[cust[int(r["o_custkey"])]]
        exp = 1 if r["o_orderpriority"][:2] in ("1-", "2-") else 0
        rr = ret.get(int(r["o_orderkey"]), 0)
        a, b, c, d = strata.get(region, (0, 0, 0, 0))
        if exp and rr:
            a += 1
        elif exp:
            b += 1
        elif rr:
            c += 1
        else:
            d += 1
        strata[region] = (a, b, c, d)
    num = den = ta = tb = tc = td = 0
    for a, b, c, d in strata.values():
        n = a + b + c + d
        num += a * d * 1000000 // n
        den += b * c * 1000000 // n
        ta, tb, tc, td = ta + a, tb + b, tc + c, td + d
    or_ppm = num * 1000000 // den if den > 0 else None
    r = mantel_haenszel_pooled_or(spark, SF).collect()[0]
    assert (
        int(r["n_strata"]),
        int(r["ta"]),
        int(r["tb"]),
        int(r["tc"]),
        int(r["td"]),
        None if r["mh_or_ppm"] is None else int(r["mh_or_ppm"]),
    ) == (len(strata), ta, tb, tc, td, or_ppm)
