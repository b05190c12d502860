"""Brute-force Python models for the round-12 operators (optrain,
rag_eval, quant_block, retrieval_serve), on the sf0.001 slice plus
hand-computed textbook examples where the recipe has one."""

import math
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").collect()


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").collect()


# ------------------------------------------------------------------- Adam


def _adam_replay(gs):
    # replicate the committed SQL text exactly: (1.0e0 - 0.9e0) evaluates
    # to 0.09999999999999998, not the literal 0.1 — one ulp matters after
    # the nano floor
    th = m = v = 0.0
    p1 = p2 = 1.0
    for g in gs:
        p1 *= 0.9
        p2 *= 0.999
        m = 0.9 * m + (1.0 - 0.9) * g
        v = 0.999 * v + (1.0 - 0.999) * g * g
        th = th - 0.01 * (m / (1.0 - p1)) / (math.sqrt(v / (1.0 - p2)) + 1e-8)
    return th, m, v


def test_adam_textbook_first_step():
    # Kingma & Ba Algorithm 1, first step with g=0.5: bias correction
    # makes m̂ = g and v̂ = g², so θ₁ = −α·g/(|g|+ε) ≈ −α·sign(g)
    th, m, v = _adam_replay([0.5])
    assert abs(m - 0.05) < 1e-15 and abs(v - 0.00025) < 1e-18
    assert abs(th - (-0.01 * 0.5 / (0.5 + 1e-8))) < 1e-12


def test_adam_update_fold_model(spark):
    from hpmr_spark.operators.optrain_queries import adam_update_fold

    seq = defaultdict(list)
    for r in _orders(spark):
        cents = int(round(r["o_totalprice"] * 100))
        seq[r["o_custkey"]].append(
            (r["o_orderkey"], (cents % 2001 - 1000) / 1000.0)
        )
    exp = {}
    for ck, gs in seq.items():
        th, m, v = _adam_replay([g for _, g in sorted(gs)])
        exp[ck] = (
            len(gs),
            math.floor(th * 1e9),
            math.floor(m * 1e9),
            math.floor(v * 1e9),
        )
    got = {
        r["custkey"]: (r["n_steps"], r["theta_nano"], r["m_nano"], r["v_nano"])
        for r in adam_update_fold(spark, SF).collect()
    }
    assert got == exp and len(got) > 100


# ------------------------------------------------------------------- GRPO


def test_grpo_group_advantages_model(spark):
    from hpmr_spark.operators.optrain_queries import grpo_group_advantages

    groups = defaultdict(list)
    rows = _orders(spark)
    for r in rows:
        rd = int(round(r["o_totalprice"] * 100)) // 100
        groups[r["o_custkey"]].append((r["o_orderkey"], rd))
    exp = {}
    for ck, mem in groups.items():
        n = len(mem)
        s = sum(rd for _, rd in mem)
        q = sum(rd * rd for _, rd in mem)
        for ok, rd in mem:
            if n * q - s * s <= 0:
                adv = 0
            else:
                adv = math.floor(
                    (n * rd - s) / math.sqrt(n * q - s * s) * 1e6
                )
            exp[ok] = (ck, rd, n, adv)
    got = {
        r["orderkey"]: (
            r["custkey"], r["reward_dollars"], r["group_n"], r["adv_micro"]
        )
        for r in grpo_group_advantages(spark, SF).collect()
    }
    assert got == exp and len(got) == len(rows)


# ------------------------------------------------------- gradient noise


def test_gradient_noise_scale_model(spark):
    from hpmr_spark.operators.optrain_queries import gradient_noise_scale

    cnt = Counter(r["o_custkey"] for r in _orders(spark))
    nat = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/customer.parquet").collect():
        cents = int(round(r["c_acctbal"] * 100))
        f1 = abs(cents) // 100 * (1 if cents >= 0 else -1)
        nat[r["c_nationkey"]].append((f1, cnt.get(r["c_custkey"], 0)))
    exp = {}
    for nk, fs in nat.items():
        n = len(fs)
        s1 = sum(a for a, _ in fs)
        q1 = sum(a * a for a, _ in fs)
        s2 = sum(b for _, b in fs)
        q2 = sum(b * b for _, b in fs)
        tr = n * (q1 + q2) - (s1 * s1 + s2 * s2)
        g2 = s1 * s1 + s2 * s2
        ppm = -1 if g2 == 0 else (tr * 1_000_000) // g2 if tr >= 0 else -(
            (-tr * 1_000_000) // g2
        )
        # tr(Σ) ≥ 0 always (it is a variance sum) — the sign split above
        # is belt-and-braces for the int128 div replica
        exp[nk] = (n, tr, g2, ppm)
    got = {
        r["nation"]: (r["n"], r["tr_sigma_num"], r["g2_num"], r["gns_ppm"])
        for r in gradient_noise_scale(spark, SF).collect()
    }
    assert got == exp and len(got) == 25


# --------------------------------------------------------- logistic SGD


def test_logistic_sgd_fold_model(spark):
    from hpmr_spark.operators.optrain_queries import logistic_sgd_fold

    seq = defaultdict(list)
    for r in _orders(spark):
        x = (int(round(r["o_totalprice"] * 100)) // 100) / 1e6
        y = 1.0 if r["o_orderstatus"] == "F" else 0.0
        seq[r["o_custkey"]].append((r["o_orderkey"], x, y))
    exp = {}
    for ck, mem in seq.items():
        w = b = 0.0
        correct = 0
        for _, x, y in sorted(mem):
            z = w * x + b
            if (z > 0 and y > 0.5) or (z <= 0 and y < 0.5):
                correct += 1
            p = 1.0 / (1.0 + math.exp(-z))
            w += 0.1 * (y - p) * x
            b += 0.1 * (y - p)
        exp[ck] = (
            len(mem), correct, math.floor(w * 1e9), math.floor(b * 1e9)
        )
    got = {
        r["custkey"]: (r["n_steps"], r["n_correct"], r["w_nano"], r["b_nano"])
        for r in logistic_sgd_fold(spark, SF).collect()
    }
    assert got == exp


# ---------------------------------------------------------- token F1


def test_token_f1_textbook():
    # the SQuAD-eval identity: F1 of pred "a b c d" vs gold "b c c e"
    # P = 2/4, R = 2/4 → F1 = 0.5 = 2·overlap/(lp+lg) = 4/8
    p, g = Counter("a b c d".split()), Counter("b c c e".split())
    ov = sum(min(p[w], g[w]) for w in p)
    assert ov == 2 and 2 * ov * 1_000_000 // (4 + 4) == 500_000


def test_token_f1_paired_docs_model(spark):
    from hpmr_spark.operators.rag_eval_queries import token_f1_paired_docs

    texts = {r["doc_id"]: r["text"] for r in _docs(spark)}
    exp = {}
    for did in texts:
        if did % 2 or did + 1 not in texts:
            continue
        p = Counter(w for w in texts[did].split(" ") if w)
        g = Counter(w for w in texts[did + 1].split(" ") if w)
        ov = sum(min(c, g[w]) for w, c in p.items())
        lp, lg = sum(p.values()), sum(g.values())
        exp[did] = (did + 1, ov, 2 * ov * 1_000_000 // (lp + lg))
    got = {
        r["pred_id"]: (r["gold_id"], r["overlap"], r["f1_ppm"])
        for r in token_f1_paired_docs(spark, SF).collect()
    }
    assert got == exp and len(got) == 250


# ------------------------------------------------------ context recall


def test_context_recall_topk_model(spark):
    from hpmr_spark.operators.rag_eval_queries import (
        _CR_K,
        _CR_QMOD,
        context_recall_topk,
    )

    docs = _docs(spark)
    tok = {
        r["doc_id"]: set(w for w in r["text"].split(" ") if w) for r in docs
    }
    meta = {r["doc_id"]: (r["lang"], r["source"]) for r in docs}
    exp = {}
    for qid in tok:
        if qid % _CR_QMOD:
            continue
        ql, qsrc = meta[qid]
        scores = []
        for did in tok:
            if did == qid or meta[did][0] != ql:
                continue
            ov = len(tok[qid] & tok[did])
            if ov > 0:
                scores.append((-ov, did))
        top = {did for _, did in sorted(scores)[:_CR_K]}
        gold = {d for d in tok if meta[d][1] == qsrc and d != qid}
        exp[qid] = (
            len(gold),
            len(top & gold),
            len(top & gold) * 1_000_000 // len(gold),
        )
    got = {
        r["query_id"]: (r["n_gold"], r["n_hit"], r["recall_ppm"])
        for r in context_recall_topk(spark, SF).collect()
    }
    assert got == exp and len(got) == 10


# --------------------------------------------------- citation support


def test_citation_ngram_support_model(spark):
    from hpmr_spark.operators.rag_eval_queries import citation_ngram_support

    texts = {r["doc_id"]: r["text"].split(" ") for r in _docs(spark)}

    def grams(ws):
        return [
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        ] if len(ws) >= 3 else []

    exp = {}
    for did, ws in texts.items():
        if did % 2 or did + 1 not in texts:
            continue
        pg = grams(ws)
        if not pg:
            continue
        ctx = set(grams(texts[did + 1]))
        sup = sum(1 for g in pg if g in ctx)
        exp[did] = (did + 1, len(pg), sup, sup * 1_000_000 // len(pg))
    got = {
        r["pred_id"]: (r["ctx_id"], r["total"], r["supported"], r["support_ppm"])
        for r in citation_ngram_support(spark, SF).collect()
    }
    assert got == exp


# ------------------------------------------------------------ block quant


def _vmic(emb):
    return [math.floor(float(x) * 1_000_000) for x in emb]


def _tz_div(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_absmax_int8_block_quant_model(spark):
    from hpmr_spark.operators.quant_block_queries import (
        absmax_int8_block_quant,
    )

    exp = {}
    for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect():
        v = _vmic(r["embedding"])
        for blk in range(len(v) // 16):
            seg = v[blk * 16 : blk * 16 + 16]
            a = max(abs(x) for x in seg)
            qs = [0 if a == 0 else _tz_div(x * 127, a) for x in seg]
            err = sum(abs(127 * x - q * a) for x, q in zip(seg, qs))
            sat = sum(1 for q in qs if abs(q) == 127)
            exp[(r["vec_id"], blk)] = (a, err, sat)
    got = {
        (r["vec_id"], r["block"]): (
            r["absmax_micro"], r["err_l1_scaled"], r["n_saturated"]
        )
        for r in absmax_int8_block_quant(spark, SF).collect()
    }
    assert got == exp


def test_msfp_block_float_census_model(spark):
    from hpmr_spark.operators.quant_block_queries import (
        msfp_block_float_census,
    )

    exp = {}
    for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect():
        v = _vmic(r["embedding"])
        for blk in range(len(v) // 8):
            seg = v[blk * 8 : blk * 8 + 8]
            a = max(abs(x) for x in seg)
            e2 = max(a.bit_length() - 7, 0) if a else 0
            p2 = 1 << e2
            qs = [_tz_div(x, p2) for x in seg]
            assert all(abs(q) <= 127 for q in qs)  # mantissa fits 7 bits
            err = sum(abs(x - q * p2) for x, q in zip(seg, qs))
            fl = sum(1 for x, q in zip(seg, qs) if q == 0 and x != 0)
            exp[(r["vec_id"], blk)] = (a, e2, err, fl)
    got = {
        (r["vec_id"], r["block"]): (
            r["absmax_micro"], r["exp2"], r["err_l1"], r["n_flushed"]
        )
        for r in msfp_block_float_census(spark, SF).collect()
    }
    assert got == exp


# ------------------------------------------------------------------ WAND


def _py_hash60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_wand_upper_bound_prune_model(spark):
    from hpmr_spark.operators.retrieval_serve_queries import (
        _WAND_K,
        _WAND_NTERM,
        _WAND_QMOD,
        wand_upper_bound_prune,
    )

    docs = _docs(spark)
    tf = defaultdict(Counter)
    for r in docs:
        for w in r["text"].split(" "):
            if w:
                tf[r["doc_id"]][w] += 1
    nd = len(docs)
    df = Counter()
    for d in tf.values():
        for w in d:
            df[w] += 1
    idf = {w: math.floor(math.log(nd / c) * 1e9) for w, c in df.items()}
    ub = defaultdict(int)
    for d in tf.values():
        for w, c in d.items():
            ub[w] = max(ub[w], c * idf[w])
    exp = {}
    for qid in tf:
        if qid % _WAND_QMOD:
            continue
        terms = sorted(tf[qid], key=lambda w: (_py_hash60(w), w))[:_WAND_NTERM]
        cand = defaultdict(lambda: [0, 0])
        for t in terms:
            for did, d in tf.items():
                if t in d:
                    cand[did][0] += d[t] * idf[t]
                    cand[did][1] += ub[t]
        theta = sorted(
            ((full, -did) for did, (full, _) in cand.items()), reverse=True
        )[: _WAND_K][-1][0]
        prun = sum(1 for full, ubs in cand.values() if ubs < theta)
        exp[qid] = (
            len(cand), theta, prun, prun * 1_000_000 // len(cand)
        )
    got = {
        r["query_id"]: (
            r["n_candidates"], r["theta_nano"], r["n_prunable"], r["prune_ppm"]
        )
        for r in wand_upper_bound_prune(spark, SF).collect()
    }
    assert got == exp and len(got) == 5


# ----------------------------------------------------------- draft accept


def test_bigram_greedy_draft_accept_model(spark):
    from hpmr_spark.operators.retrieval_serve_queries import (
        bigram_greedy_draft_accept,
    )

    docs = _docs(spark)
    bg = Counter()
    pairs = []
    for r in docs:
        ws = r["text"].split(" ")
        for i in range(len(ws) - 1):
            bg[(ws[i], ws[i + 1])] += 1
            pairs.append((r["lang"], ws[i], ws[i + 1]))
    draft = {}
    for (w, nxt), c in bg.items():
        cur = draft.get(w)
        if cur is None or (-c, nxt) < cur:
            draft[w] = (-c, nxt)
    st = defaultdict(lambda: [0, 0])
    for lang, w, nxt in pairs:
        st[lang][0] += 1
        if draft[w][1] == nxt:
            st[lang][1] += 1
    exp = {
        lang: (n, a, a * 1_000_000 // n) for lang, (n, a) in st.items()
    }
    got = {
        r["lang"]: (r["n_pairs"], r["n_accept"], r["accept_ppm"])
        for r in bigram_greedy_draft_accept(spark, SF).collect()
    }
    assert got == exp and len(got) == 5


# ---------------------------------------------------------------- SimRank


def test_simrank_bipartite_iter1_model(spark):
    from hpmr_spark.operators.retrieval_serve_queries import (
        _SR_TOPK,
        simrank_bipartite_iter1,
    )

    orders_of = defaultdict(set)
    for r in spark.read.parquet(f"{SF}/lineitem.parquet").collect():
        orders_of[r["l_partkey"]].add(r["l_orderkey"])
    scored = []
    parts = sorted(orders_of)
    by_order = defaultdict(set)
    for p, os_ in orders_of.items():
        for o in os_:
            by_order[o].add(p)
    pair_common = Counter()
    for o, ps in by_order.items():
        ps = sorted(ps)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_common[(ps[i], ps[j])] += 1
    for (a, b), c in pair_common.items():
        ppm = c * 8 * 100000 // (len(orders_of[a]) * len(orders_of[b]))
        scored.append((-ppm, a, b, c))
    top = sorted(scored)[:_SR_TOPK]
    exp = {(a, b): (c, -nppm) for nppm, a, b, c in top}
    got = {
        (r["pa"], r["pb"]): (r["n_common"], r["simrank_ppm"])
        for r in simrank_bipartite_iter1(spark, SF).collect()
    }
    assert got == exp and len(got) == _SR_TOPK
