"""Brute-force Python models for the round-9 second/third-wave operators
(pretrain3_queries + mixing_eval_queries): the cross-engine oracle gate
cannot catch a bug in arithmetic or a spec BOTH engines share, so each
committed pipeline is re-derived independently in plain Python (hashlib /
fractions / numpy) on the sf0.001 slice."""

import hashlib
import math
from fractions import Fraction

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (Spark `div` ≡ DuckDB `//`);
    Python's // floors, which differs on negative numerators."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _docs(spark):
    return [
        (r["doc_id"], r["lang"], r["source"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]


# ----------------------------------------------------- BERT MLM masking


def test_mlm_masking_model(spark):
    from hpmr_spark.operators.pretrain3_queries import mlm_masking_bert

    docs = _docs(spark)
    vocab = sorted({w for _, _, _, t in docs for w in t.split(" ")})
    v = len(vocab)
    exp = {}
    for doc_id, lang, _, text in docs:
        toks = text.split(" ")
        n_sel = n_mask = n_rand = n_keep = pos_sum = rank_sum = 0
        for i, w in enumerate(toks, start=1):
            if _h60(f"mlm|{doc_id}|{i}|{w}") % 100 < 15:
                n_sel += 1
                pos_sum += i
                role = _h60(f"mlmrole|{doc_id}|{i}") % 10
                if role <= 7:
                    n_mask += 1
                elif role == 8:
                    n_rand += 1
                    rank_sum += _h60(f"mlmrepl|{doc_id}|{i}") % v + 1
                else:
                    n_keep += 1
        exp[doc_id] = (len(toks), n_sel, n_mask, n_rand, n_keep, pos_sum,
                       rank_sum)
    got = {r["doc_id"]: r for r in mlm_masking_bert(spark, SF).collect()}
    assert len(got) == len(exp)
    for doc_id, (nt, ns, nm, nr, nk, ps, rs) in exp.items():
        g = got[doc_id]
        assert (g["n_tok"], g["n_sel"], g["n_mask"], g["n_rand"],
                g["n_keep"], g["sel_pos_sum"], g["repl_rank_sum"]) == (
            nt, ns, nm, nr, nk, ps, rs)
    # the 80/10/10 split is hash-gated, not quota'd — but corpus-wide it
    # must be in the right ballpark
    tot_sel = sum(e[1] for e in exp.values())
    tot_mask = sum(e[2] for e in exp.values())
    assert tot_sel > 0 and 0.6 < tot_mask / tot_sel < 0.95


# ----------------------------------------------- prefix KV-cache sharing


def test_prefix_cache_model(spark):
    from hpmr_spark.operators.pretrain3_queries import prefix_cache_sharing

    docs = _docs(spark)
    got = {r["k"]: r for r in prefix_cache_sharing(spark, SF).collect()}
    for k in (1, 2, 4, 8):
        groups = {}
        tok_tot = 0
        for _, _, _, text in docs:
            toks = text.split(" ")
            if len(toks) >= k:
                key = " ".join(toks[:k])
                groups[key] = groups.get(key, 0) + 1
                tok_tot += len(toks)
        saved = sum((c - 1) * k for c in groups.values())
        g = got[k]
        assert g["n_prefixes"] == len(groups)
        assert g["n_docs"] == sum(groups.values())
        assert g["shared_docs"] == sum(c for c in groups.values() if c >= 2)
        assert g["saved_tok"] == saved
        assert g["saving_ppm"] == saved * 1000000 // max(tok_tot, 1)
    # deeper prefixes can only shrink sharing
    assert got[1]["saved_tok"] // 1 >= 0
    assert got[1]["shared_docs"] >= got[8]["shared_docs"]


# ------------------------------------------- padding waste bucket advisor


def _ntile(rn: int, n: int, b: int) -> int:
    size, rem = n // b, n % b
    cut = rem * (size + 1)
    if rn <= cut:
        return (rn - 1) // (size + 1) + 1
    return rem + (rn - cut - 1) // size + 1


def test_padding_waste_model(spark):
    from hpmr_spark.operators.pretrain3_queries import (
        seqlen_bucket_padding_waste,
    )

    docs = _docs(spark)
    lens = sorted((len(t.split(" ")), d) for d, _, _, t in docs)
    n = len(lens)
    got = {
        (r["n_buckets"], r["bucket"]): r
        for r in seqlen_bucket_padding_waste(spark, SF).collect()
    }
    for b in (1, 2, 4, 8):
        buckets = {}
        for rn, (ln, _) in enumerate(lens, start=1):
            buckets.setdefault(_ntile(rn, n, b), []).append(ln)
        for bk, ls in buckets.items():
            g = got[(b, bk)]
            assert g["n_docs"] == len(ls)
            assert g["max_len"] == max(ls)
            assert g["sum_len"] == sum(ls)
            padded = len(ls) * max(ls)
            assert g["waste_ppm"] == (padded - sum(ls)) * 1000000 // padded
    # equi-depth buckets are sorted by length: bucket i's max <= bucket
    # i+1's max; more buckets never increase total padded volume
    pad = {
        b: sum(g["n_docs"] * g["max_len"] for (bb, _), g in got.items()
               if bb == b)
        for b in (1, 2, 4, 8)
    }
    assert pad[1] >= pad[2] >= pad[4] >= pad[8]


# ------------------------------------------------- SoftDeDup commonness


def test_softdedup_model(spark):
    from hpmr_spark.operators.pretrain3_queries import (
        softdedup_commonness_weights,
    )

    docs = _docs(spark)
    cnt = {}
    per_doc_grams = {}
    for doc_id, _, src, text in docs:
        toks = text.split(" ")
        grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        per_doc_grams[doc_id] = (src, len(toks), grams)
        for g in grams:
            cnt[g] = cnt.get(g, 0) + 1
    t = sum(cnt.values())
    common = {}
    for doc_id, (src, n_tok, grams) in per_doc_grams.items():
        s = sum(
            math.floor((math.log(cnt[g]) - math.log(t)) * 1000000000)
            for g in grams
        )
        common[doc_id] = (src, n_tok, _tdiv(s, n_tok - 2))
    cmin = min(c for _, _, c in common.values())
    cmax = max(c for _, _, c in common.values())
    per_src = {}
    for src, n_tok, c in common.values():
        w = (cmax - c) * 1000000 // max(cmax - cmin, 1)
        agg = per_src.setdefault(src, [0, 0, 0, 0])
        agg[0] += 1
        agg[1] += n_tok
        agg[2] += c
        agg[3] += n_tok * w
    got = {r["source"]: r for r in
           softdedup_commonness_weights(spark, SF).collect()}
    assert len(got) == len(per_src)
    for src, (nd, tok, csum, effm) in per_src.items():
        g = got[src]
        assert g["n_docs"] == nd
        assert g["tok_total"] == tok
        assert g["mean_common_nano"] == _tdiv(csum, nd)
        assert g["eff_tok"] == _tdiv(effm, 1000000)
        # downweighting can only shrink the effective mass
        assert g["eff_tok"] <= g["tok_total"]


# ------------------------------------------------------ UniMax waterfall


def test_unimax_model(spark):
    from hpmr_spark.operators.mixing_eval_queries import (
        _UM_BUDGET_MULT,
        _UM_EPOCH_CAP,
        unimax_language_budget,
    )

    docs = _docs(spark)
    per_lang = {}
    for _, lang, _, text in docs:
        per_lang[lang] = per_lang.get(lang, 0) + len(text.split(" "))
    rows = sorted(per_lang.items(), key=lambda kv: (kv[1], kv[0]))
    total = sum(per_lang.values())
    remaining = _UM_BUDGET_MULT * total
    exp = {}
    for idx, (lang, ntok) in enumerate(rows):
        share = remaining // (len(rows) - idx)
        alloc = min(share, _UM_EPOCH_CAP * ntok)
        remaining -= alloc
        exp[lang] = (ntok, alloc, alloc * 1000000 // ntok)
    got = {r["lang"]: r for r in unimax_language_budget(spark, SF).collect()}
    assert len(got) == len(exp)
    tot_alloc = 0
    for lang, (ntok, alloc, ppm) in exp.items():
        g = got[lang]
        assert (g["n_tok"], g["alloc_tok"], g["epochs_ppm"]) == (
            ntok, alloc, ppm)
        assert g["alloc_tok"] <= _UM_EPOCH_CAP * ntok  # cap invariant
        tot_alloc += g["alloc_tok"]
    assert tot_alloc <= _UM_BUDGET_MULT * total  # budget invariant


# ------------------------------------------ DoReMi multiplicative weights


def test_doremi_model(spark):
    import numpy as np

    from hpmr_spark.operators.mixing_eval_queries import (
        _DM_ITERS,
        doremi_domain_weights,
    )

    docs = _docs(spark)
    srcs = sorted({s for _, _, s, _ in docs})
    words = sorted({w for _, _, _, t in docs for w in t.split(" ")})
    di = {s: i for i, s in enumerate(srcs)}
    wi = {w: i for i, w in enumerate(words)}
    c = np.zeros((len(srcs), len(words)), dtype=np.int64)
    for _, _, s, t in docs:
        for w in t.split(" "):
            c[di[s], wi[w]] += 1
    n = c.sum(axis=1)
    p = (c + 1).astype(float) / (n + len(words)).astype(float)[:, None]
    s = np.full(len(srcs), 1.0 / len(srcs))
    for _ in range(_DM_ITERS):
        pmix = s @ p  # mixture distribution over words
        excess = (p * np.log(p / pmix[None, :])).sum(axis=1)
        u = s * np.exp(excess)
        s = u / u.sum()
    got = {r["source"]: r for r in doremi_domain_weights(spark, SF).collect()}
    assert len(got) == len(srcs)
    wsum = sum(g["weight_nano"] for g in got.values())
    assert abs(wsum - 1000000000) <= len(srcs)  # floor(s*1e9) sums to ~1e9
    for src in srcs:
        g = got[src]
        assert g["tok"] == int(n[di[src]])
        assert g["share_ppm"] == int(n[di[src]]) * 1000000 // int(n.sum())
        # numpy reduction order differs from the committed fold order, so
        # allow a few nanos of drift — a spec bug would be off by far more
        assert abs(g["weight_nano"] - math.floor(s[di[src]] * 1e9)) <= 16
    # the most KL-divergent domain must have gained weight vs uniform
    assert max(g["weight_nano"] for g in got.values()) > 10**9 // len(srcs)


# ------------------------------------------------- best-of-n estimator


def test_bon_weights_identity():
    """The order-statistics identity behind the estimator, in exact
    Fractions: sum over all C(N,n) subsets of max(reward) equals
    sum_i C(i-1,n-1) * r_(i) — so the per-i weights are exactly
    C(i-1,n-1)/C(N,n)."""
    from itertools import combinations

    rewards = [3, 1, 4, 1, 5, 9, 2, 6]  # ties included
    r = sorted(rewards)
    big_n = len(r)
    for n in (1, 2, 4):
        brute = Fraction(
            sum(max(sub) for sub in combinations(r, n)), math.comb(big_n, n)
        )
        formula = sum(
            Fraction(math.comb(i - 1, n - 1), math.comb(big_n, n)) * r[i - 1]
            for i in range(1, big_n + 1)
        )
        assert brute == formula


def test_bon_query_model(spark):
    from hpmr_spark.operators.mixing_eval_queries import best_of_n_reward

    docs = _docs(spark)
    per_src = {}
    for doc_id, _, src, text in docs:
        toks = text.split(" ")
        r = len(set(toks)) * 100 + len(toks) % 100
        per_src.setdefault(src, []).append((r, doc_id))
    got = {(r["source"], r["n"]): r
           for r in best_of_n_reward(spark, SF).collect()}
    for src, pairs in per_src.items():
        pairs.sort()
        big_n = len(pairs)
        for n in (1, 2, 4, 8):
            if n > big_n:
                assert (src, n) not in got
                continue
            total = 0
            for i in range(1, big_n + 1):
                # the committed float-expression order: numerator product,
                # denominator product, one divide, * r, * 1e9, floor
                num = float(n)
                for j in range(1, n):
                    num = num * float(i - j)
                den = float(big_n)
                for j in range(1, n):
                    den = den * float(big_n - j)
                total += math.floor((num / den) * float(pairs[i - 1][0])
                                    * 1000000000)
            g = got[(src, n)]
            assert g["n_samples"] == big_n
            assert g["bon_nano"] == total
        # more samples never hurt: E[max of n] is nondecreasing in n
        ns = sorted(nn for (s2, nn) in got if s2 == src)
        vals = [got[(src, nn)]["bon_nano"] for nn in ns]
        assert vals == sorted(vals)


# -------------------------------------------------- Bellman-Ford k rounds


def test_bellman_ford_model(spark):
    from hpmr_spark.operators.mixing_eval_queries import (
        _BF_INF,
        _BF_ITERS,
        _BF_SRC,
        bellman_ford_nation_days,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    ).collect()
    od = {r["o_orderkey"]: (r["o_custkey"], r["o_orderdate"])
          for r in spark.read.parquet(f"{SF}/orders.parquet").collect()}
    cn = {r["c_custkey"]: r["c_nationkey"]
          for r in spark.read.parquet(f"{SF}/customer.parquet").collect()}
    sn = {r["s_suppkey"]: r["s_nationkey"]
          for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()}
    nats = sorted(
        r["n_nationkey"]
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    )
    edges = {}
    for r in li:
        cust, odate = od[r["l_orderkey"]]
        u, v = sn[r["l_suppkey"]], cn[cust]
        if u == v:
            continue
        days = (r["l_shipdate"].date() - odate.date()).days
        if days < 0:
            continue
        k = (u, v)
        edges[k] = min(edges.get(k, 10**18), days)
    dist = {x: (0 if x == _BF_SRC else _BF_INF) for x in nats}
    for _ in range(_BF_ITERS):
        new = dict(dist)
        for (u, v), w in edges.items():
            if dist[u] + w < new[v]:
                new[v] = dist[u] + w
        dist = new
    got = {r["n_nationkey"]: r["dist_days"]
           for r in bellman_ford_nation_days(spark, SF).collect()}
    assert len(got) == len(nats)
    for x in nats:
        exp = -1 if dist[x] >= _BF_INF else dist[x]
        assert got[x] == exp
    assert got[_BF_SRC] == 0
