"""Brute-force Python models for the round-10 wave-5 operators
(tokenize_serving_queries), on the sf0.001 slice."""

import hashlib
import math

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(spark):
    return [
        (r["lang"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]


def test_wordpiece_model(spark):
    from hpmr_spark.operators.tokenize_serving_queries import (
        _WP_N2,
        _WP_N3,
        wordpiece_maxmatch_tokenize,
    )

    docs = _docs(spark)
    tokcnt = {}
    for _lang, text in docs:
        for w in text.split(" "):
            tokcnt[w] = tokcnt.get(w, 0) + 1

    def top(size, k):
        g = {}
        for w, c in tokcnt.items():
            for i in range(len(w) - size + 1):
                gr = w[i : i + size]
                g[gr] = g.get(gr, 0) + c
        return {x for _c, x in sorted(((-c, x) for x, c in g.items()))[:k]}

    v2, v3 = top(2, _WP_N2), top(3, _WP_N3)

    def pieces(w):
        pos, np = 0, 0
        while pos < len(w):
            if w[pos : pos + 3] in v3:
                pos += 3
            elif w[pos : pos + 2] in v2:
                pos += 2
            else:
                pos += 1
            np += 1
        return np

    per = {}
    for lang, text in docs:
        for w in text.split(" "):
            n, p = per.get(lang, (0, 0))
            per[lang] = (n + 1, p + pieces(w))
    expect = {
        lang: (n, p, p * 1000000 // n) for lang, (n, p) in per.items()
    }
    got = {
        r["lang"]: (int(r["n_words"]), int(r["n_pieces"]), int(r["fertility_ppm"]))
        for r in wordpiece_maxmatch_tokenize(spark, SF).collect()
    }
    assert got == expect
    # the vocab must actually compress: fewer pieces than characters
    total_chars = sum(
        len(w) for _l, t in docs for w in t.split(" ")
    )
    assert sum(p for _n, p in per.values()) < total_chars


def test_moe_model(spark):
    from hpmr_spark.operators.tokenize_serving_queries import (
        _MOE_E,
        moe_router_load_balance,
    )

    toks = [w for _l, t in _docs(spark) for w in t.split(" ")]
    n_routed = [0] * _MOE_E
    p_sum = [0] * _MOE_E
    for w in toks:
        la = [_h60(f"moe:{e}:{w}") % 1000 for e in range(_MOE_E)]
        ea = [math.exp(l / 1000.0) for l in la]
        s = 0.0
        for x in ea:
            s += x
        best = max(range(_MOE_E), key=lambda e: (la[e], -e))
        n_routed[best] += 1
        for e in range(_MOE_E):
            p_sum[e] += math.floor(ea[e] / s * 1e9)
    n = len(toks)
    expect = {
        e: (n_routed[e], n_routed[e] * 1000000 // n, p_sum[e] // n)
        for e in range(_MOE_E)
    }
    got = {
        int(r["expert"]): (
            int(r["n_routed"]),
            int(r["f_ppm"]),
            int(r["p_mean_nano"]),
        )
        for r in moe_router_load_balance(spark, SF).collect()
    }
    assert got == expect


def test_attention_model(spark):
    from hpmr_spark.operators.tokenize_serving_queries import (
        _ATT_D,
        _ATT_M,
        attention_io_cost_model,
    )

    buckets = {}
    for _l, t in _docs(spark):
        n = len(t.split(" "))
        nb = 1
        while nb < n:
            nb *= 2
        buckets[nb] = buckets.get(nb, 0) + 1
    expect = {}
    for nb, nd in buckets.items():
        std = 4 * nb * _ATT_D + 2 * nb * nb
        fl = 4 * nb * _ATT_D + 2 * (nb * nb * _ATT_D * _ATT_D // _ATT_M)
        expect[nb] = (nd, 4 * nb * nb * _ATT_D, std, fl, std * 1000000 // fl)
    got = {
        int(r["seq_bucket"]): (
            int(r["n_docs"]),
            int(r["flops_per_doc"]),
            int(r["io_standard"]),
            int(r["io_flash"]),
            int(r["speedup_ppm"]),
        )
        for r in attention_io_cost_model(spark, SF).collect()
    }
    assert got == expect


def test_dr_model(spark):
    from hpmr_spark.operators.tokenize_serving_queries import doubly_robust_ope
    from hpmr_spark.sources.tables import load_events

    ev = load_events(spark, SF).select("user_id", "event_type", "value").collect()
    arms = ["view", "click", "purchase", "signup", "error"]
    n = len(ev)
    s_g = s_ips = s_dr = 0
    for r in ev:
        u = r["user_id"]
        a = r["event_type"]
        rc = int(round(float(r["value"]) * 100)) if a == "purchase" else 0
        pi = arms[_h60(f"pi:{u}") % 5]
        gm = _h60(f"gm:{u}") % 5000
        g_pi = gm if pi == "purchase" else 0
        g_a = gm if a == "purchase" else 0
        corr = 5 * (rc - g_a) if a == pi else 0
        s_g += g_pi
        s_ips += 5 * rc if a == pi else 0
        s_dr += g_pi + corr

    def tdiv(x, d):
        return x // d if x >= 0 else -((-x) // d)

    row = doubly_robust_ope(spark, SF).collect()[0]
    assert (
        int(row["n"]),
        int(row["dm_value_microcents"]),
        int(row["ips_value_microcents"]),
        int(row["dr_value_microcents"]),
    ) == (n, s_g * 1000000 // n, s_ips * 1000000 // n, tdiv(s_dr * 1000000, n))
