"""Brute-force Python models for the round-10 wave-1 operators
(selection_richness_queries), on the sf0.001 slice: the cross-engine
oracle gate cannot catch a bug in arithmetic BOTH engines share, so the
committed formulas are re-derived in plain Python (CLAUDE.md round-5
rule)."""

import math

SF = "/root/testdata/sf0.001"


def _vecs(spark):
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    return {
        int(r["vec_id"]): [int(math.floor(float(x) * 1000000)) for x in r["embedding"]]
        for r in rows
    }


def _d2(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def test_kcenter_model(spark):
    from hpmr_spark.operators.selection_richness_queries import (
        _KC_K,
        kcenter_greedy_coreset,
    )

    vi = _vecs(spark)
    sel = [min(vi)]
    expect = [(0, sel[0], 0)]
    for step in range(1, _KC_K):
        best = None
        for vid, v in vi.items():
            if vid in sel:
                continue
            mind2 = min(_d2(v, vi[c]) for c in sel)
            # tie-break (mind2 DESC, vec_id ASC)
            key = (-mind2, vid)
            if best is None or key < best[0]:
                best = (key, vid, mind2)
        sel.append(best[1])
        expect.append((step, best[1], best[2]))
    got = sorted(
        (int(r["step"]), int(r["vec_id"]), int(r["maxmin_d2"]))
        for r in kcenter_greedy_coreset(spark, SF).collect()
    )
    assert got == expect


def test_ssl_prototype_consistency(spark):
    """The SSL-prototypes stage commits to the SAME clustering as
    semdedup_centroid_prune (D4 runs both on one k-means): per-cell
    populations must agree, and the prune count must be exactly
    floor(n/4) per cell."""
    from hpmr_spark.operators.dedup_queries import semdedup_centroid_prune
    from hpmr_spark.operators.selection_richness_queries import (
        ssl_prototype_prune,
    )

    ssl = {
        int(r["cell"]): (int(r["n_vectors"]), int(r["n_pruned"]))
        for r in ssl_prototype_prune(spark, SF).collect()
    }
    sem = {
        int(r["cell"]): int(r["n_vectors"])
        for r in semdedup_centroid_prune(spark, SF).collect()
    }
    assert {c: n for c, (n, _) in ssl.items()} == sem
    for _c, (n, p) in ssl.items():
        assert p == n // 4


def test_good_turing_model(spark):
    from hpmr_spark.operators.selection_richness_queries import (
        good_turing_unseen_mass,
    )

    cnt = {}
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        t = r["text"].split(" ")
        for i in range(len(t) - 2):
            g = " ".join(t[i : i + 3])
            cnt[g] = cnt.get(g, 0) + 1
    spec = {}
    for c in cnt.values():
        spec[c] = spec.get(c, 0) + 1
    n = sum(cnt.values())
    expect = {(0, 0): spec.get(1, 0) * 1000000 // n}
    for r, nr in spec.items():
        if r <= 5:
            expect[(r, nr)] = (r + 1) * spec.get(r + 1, 0) * 1000000 // nr
    got = {
        (int(row["r"]), int(row["n_types"])): int(row["est_micro"])
        for row in good_turing_unseen_mass(spark, SF).collect()
    }
    assert got == expect


def test_yule_k_model(spark):
    from hpmr_spark.operators.selection_richness_queries import (
        yule_k_richness,
    )

    cnt = {}
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        for w in r["text"].split(" "):
            cnt[(r["lang"], w)] = cnt.get((r["lang"], w), 0) + 1
    langs = {}
    for (lang, _w), c in cnt.items():
        tot, ty, s2 = langs.get(lang, (0, 0, 0))
        langs[lang] = (tot + c, ty + 1, s2 + c * c)
    expect = {
        lang: (tot, ty, (s2 - tot) * 10**10 // (tot * tot))
        for lang, (tot, ty, s2) in langs.items()
    }
    got = {
        r["lang"]: (
            int(r["n_tokens"]),
            int(r["n_types"]),
            int(r["yule_k_ppm"]),
        )
        for r in yule_k_richness(spark, SF).collect()
    }
    assert got == expect


def test_err_model(spark):
    from hpmr_spark.operators.selection_richness_queries import (
        err_graded_ranking,
    )

    cust = {
        int(r["c_custkey"]): int(r["c_nationkey"])
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    spend = {}
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        ck = int(r["o_custkey"])
        cents = int(round(float(r["o_totalprice"]) * 100))
        key = (cust[ck], ck)
        spend[key] = spend.get(key, 0) + cents
    by_nation = {}
    for (nk, ck), cents in spend.items():
        by_nation.setdefault(nk, []).append((-cents, ck))
    expect = {}
    for nk, rows in by_nation.items():
        rows.sort()
        top = rows[:10]
        maxc = -top[0][0]
        p_cont = 1.0
        err = 0.0
        for i, (negc, _ck) in enumerate(top):
            g = (4 * -negc) // (maxc + 1)
            rel = (1 << g) - 1
            err += (rel / 8.0) * p_cont / float(i + 1)
            p_cont *= (8 - rel) / 8.0
        expect[nk] = (len(top), math.floor(err * 1000000))
    got = {
        int(r["nationkey"]): (int(r["n_ranked"]), int(r["err_ppm"]))
        for r in err_graded_ranking(spark, SF).collect()
    }
    assert got == expect
