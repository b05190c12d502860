"""Brute-force Python models for the round-12 wave-5/6 operators
(brevity penalty, ROC hull, reservoir fold, betweenness, Gale-Shapley),
on the sf0.001 slice plus classic textbook pins."""

import hashlib
import math
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").collect()


# ------------------------------------------------------- brevity penalty


def test_brevity_penalty_model(spark):
    from hpmr_spark.operators.eval_extra_queries import brevity_penalty_census

    lens = {}
    langs = {}
    for r in _docs(spark):
        lens[r["doc_id"]] = len([w for w in r["text"].split(" ") if w])
        langs[r["doc_id"]] = r["lang"]
    st = defaultdict(list)
    for did, c_len in lens.items():
        if did % 2 or did + 1 not in lens:
            continue
        r_len = lens[did + 1]
        if c_len == 0:
            bp = 0
        elif c_len > r_len:
            bp = 1_000_000_000
        else:
            bp = math.floor(math.exp(1.0 - r_len / c_len) * 1e9)
        st[langs[did]].append(bp)
    exp = {
        lang: (
            len(v), sum(v), min(v), sum(1 for x in v if x == 1_000_000_000)
        )
        for lang, v in st.items()
    }
    got = {
        r["lang"]: (
            r["n_pairs"], r["sum_bp_nano"], r["min_bp_nano"],
            r["n_unpenalized"],
        )
        for r in brevity_penalty_census(spark, SF).collect()
    }
    assert got == exp and len(got) == 5


# ------------------------------------------------------------- ROC hull


def test_roc_convex_hull_model(spark):
    from hpmr_spark.operators.eval_extra_queries import (
        _ROC_BUCKETS,
        roc_convex_hull,
    )
    from hpmr_spark.operators.mleval_queries import _scored

    rows = _scored(spark, SF).collect()
    buckets = defaultdict(lambda: [0, 0])
    for r in rows:
        b = r["score_ppm"] * _ROC_BUCKETS // 1_000_000
        buckets[b][0] += 1
        buckets[b][1] += r["y"]
    pts = {(0, 0)}
    for b in buckets:
        tp = sum(p for bb, (c, p) in buckets.items() if bb >= b)
        fp = sum(c - p for bb, (c, p) in buckets.items() if bb >= b)
        pts.add((fp, tp))
    hull = set()
    for (x, y) in pts:
        above = any(
            ax < x < bx and (by - ay) * (x - ax) - (y - ay) * (bx - ax) > 0
            for (ax, ay) in pts
            for (bx, by) in pts
        )
        same_x_dom = any(cx == x and cy > y for (cx, cy) in pts)
        if not above and not same_x_dom:
            hull.add((x, y))
    got = {(r["fp"], r["tp"]) for r in roc_convex_hull(spark, SF).collect()}
    assert got == hull
    # (0,0) survives only when no positive-only bucket gives an fp=0
    # operating point with tp > 0 (equal-x dominance, ADVICE r10)
    assert ((0, 0) in got) == (not any(x == 0 and y > 0 for (x, y) in pts))
    # at most one point per fp value survives (vertical dominance removed)
    xs = [x for (x, _) in got]
    assert len(xs) == len(set(xs))
    # hull points dominate: TPR is concave along the hull (classic ROCCH
    # property — every vertex is optimal under some cost ratio)
    h = sorted(got)
    for i in range(1, len(h) - 1):
        (x0, y0), (x1, y1), (x2, y2) = h[i - 1], h[i], h[i + 1]
        assert (y1 - y0) * (x2 - x1) >= (y2 - y1) * (x1 - x0)


# ------------------------------------------------------------- reservoir


def test_reservoir_sample_fold_model(spark):
    from hpmr_spark.operators.sampling3_queries import (
        _RSV_K,
        reservoir_sample_fold,
    )

    streams = defaultdict(list)
    for r in sorted(_docs(spark), key=lambda r: r["doc_id"]):
        streams[r["lang"]].append(r["doc_id"])
    exp = {}
    for lang, dids in streams.items():
        slots = [-1] * _RSV_K
        t = 0
        for did in dids:
            t += 1
            h = _py_hash60(f"rsv:{did}") % (1 << 40)
            if t <= _RSV_K:
                slots[t - 1] = did
            else:
                j = h % t
                if j < _RSV_K:
                    slots[j] = did
        exp[lang] = (t, tuple(slots))
    got = {
        r["lang"]: (
            r["n_seen"],
            tuple(r[f"slot{i}"] for i in range(1, _RSV_K + 1)),
        )
        for r in reservoir_sample_fold(spark, SF).collect()
    }
    assert got == exp and len(got) == 5


# ----------------------------------------------------------- betweenness


def _trade_graph(spark):
    c = {r["c_custkey"]: r["c_nationkey"]
         for r in spark.read.parquet(f"{SF}/customer.parquet").collect()}
    s = {r["s_suppkey"]: r["s_nationkey"]
         for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()}
    o = {r["o_orderkey"]: r["o_custkey"]
         for r in spark.read.parquet(f"{SF}/orders.parquet").collect()}
    vol = Counter()
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        ck = o.get(r["l_orderkey"])
        if ck is None:
            continue
        vol[(c[ck], s[r["l_suppkey"]])] += int(
            round(r["l_extendedprice"] * 100)
        )
    return vol


def test_brandes_betweenness_model(spark):
    from hpmr_spark.operators.graph_central2_queries import (
        _BW_K,
        brandes_betweenness_trade,
    )

    vol = _trade_graph(spark)
    tot = sum(vol.values())
    edges = set()
    for (a, b), v in vol.items():
        if a != b and v * 625 > tot:
            edges.add((min(a, b), max(a, b)))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    nodes = sorted(adj)
    # BFS with σ counting per source (the Brandes forward pass)
    sp = {}
    for src in nodes:
        d = {src: 0}
        sig = {src: 1}
        frontier = [src]
        k = 0
        while frontier and k < _BW_K:
            k += 1
            nxt = defaultdict(int)
            for u in frontier:
                for v in adj[u]:
                    if v not in d or d[v] == k:
                        nxt[v] += sig[u]
            frontier = []
            for v, c in nxt.items():
                if v not in d:
                    d[v] = k
                    sig[v] = c
                    frontier.append(v)
                elif d[v] == k:
                    sig[v] = c  # accumulated above
        for t, dist in d.items():
            if t != src:
                sp[(src, t)] = (dist, sig[t])
    exp = defaultdict(lambda: [0, 0])
    for (ss, tt), (dst, sigst) in sp.items():
        if ss >= tt:
            continue
        for v in nodes:
            if v in (ss, tt):
                continue
            if (ss, v) in sp and (v, tt) in sp:
                dsv, sigsv = sp[(ss, v)]
                dvt, sigvt = sp[(v, tt)]
                if dsv + dvt == dst:
                    exp[v][0] += 1
                    exp[v][1] += sigsv * sigvt * 1_000_000 // sigst
    got = {
        r["node"]: (r["n_pair_terms"], r["betweenness_ppm"])
        for r in brandes_betweenness_trade(spark, SF).collect()
    }
    assert got == {v: tuple(x) for v, x in exp.items()}


# ---------------------------------------------------------- Gale-Shapley


def _gs_textbook(vol, n=8):
    """Classic deferred acceptance (Gale & Shapley 1962)."""
    def m_pref(m):
        return sorted(range(n), key=lambda w: (-vol[m][w], w))

    def w_rank(w, m):
        return sum(
            1
            for m2 in range(n)
            if vol[m2][w] > vol[m][w] or (vol[m2][w] == vol[m][w] and m2 < m)
        )

    prefs = [m_pref(m) for m in range(n)]
    nxt = [0] * n
    eng = [-1] * n  # woman -> man
    while True:
        free = [
            m
            for m in range(n)
            if m not in eng and nxt[m] < n
        ]
        if not free:
            break
        m = free[0]
        w = prefs[m][nxt[m]]
        nxt[m] += 1
        if eng[w] == -1 or w_rank(w, m) < w_rank(w, eng[w]):
            eng[w] = m
    return eng, w_rank


def test_gale_shapley_textbook_stability():
    # a known-nontrivial instance: proposer-optimality and stability
    vol = [
        [30, 20, 10, 0, 0, 0, 0, 0],
        [20, 30, 10, 0, 0, 0, 0, 0],
        [10, 20, 30, 0, 0, 0, 0, 0],
        [1, 2, 3, 40, 0, 0, 0, 0],
        [0, 0, 0, 0, 50, 40, 0, 0],
        [0, 0, 0, 0, 40, 50, 0, 0],
        [0, 0, 0, 0, 0, 0, 60, 0],
        [0, 0, 0, 0, 0, 0, 0, 70],
    ]
    eng, w_rank = _gs_textbook(vol)
    assert sorted(eng) == list(range(8))  # perfect matching
    # stability: no (m, w) both preferring each other over their match
    match_of_m = {m: w for w, m in enumerate(eng)}
    for m in range(8):
        for w in range(8):
            if match_of_m[m] == w:
                continue
            m_prefers = (vol[m][w], -w) > (
                vol[m][match_of_m[m]], -match_of_m[m]
            )
            w_prefers = w_rank(w, m) < w_rank(w, eng[w])
            assert not (m_prefers and w_prefers), f"blocking pair {m},{w}"


def test_gale_shapley_stable_match_model(spark):
    from hpmr_spark.operators.matching_queries import (
        _N,
        gale_shapley_stable_match,
    )

    volc = _trade_graph(spark)
    vol = [[volc.get((m, w), 0) for w in range(_N)] for m in range(_N)]
    eng, w_rank = _gs_textbook(vol, _N)
    exp = {
        w: (eng[w], vol[eng[w]][w], w_rank(w, eng[w])) for w in range(_N)
    }
    got = {
        r["reviewer"]: (r["proposer"], r["vol_cents"], r["reviewer_rank"])
        for r in gale_shapley_stable_match(spark, SF).collect()
    }
    assert got == exp and len(got) == _N
    # stability of the ENGINE's matching on the real matrix
    match_of_m = {m: w for w, (m, _, _) in got.items()}
    for m in range(_N):
        for w in range(_N):
            if match_of_m[m] == w:
                continue
            m_prefers = (vol[m][w], -w) > (
                vol[m][match_of_m[m]], -match_of_m[m]
            )
            w_prefers = w_rank(w, m) < w_rank(w, got[w][0])
            assert not (m_prefers and w_prefers)
