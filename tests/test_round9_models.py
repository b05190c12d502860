"""Brute-force Python models for the round-9 operators: the cross-engine
oracle gate cannot catch a bug in arithmetic or a spec BOTH engines share,
so each committed pipeline is re-derived independently in plain Python on
the sf0.001 slice (CLAUDE.md round-5 rule; same pattern as
test_round8_models.py)."""

import math

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return [
        (r["doc_id"], r["lang"], r["source"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]


# ------------------------------------------------- Gopher repetition rules


def _py_gopher(text: str):
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    toks = text.split(" ")
    n_tok, n_chars = len(toks), len(text)
    tops = {}
    for n in (2, 3, 4):
        cnt = {}
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            cnt[g] = cnt.get(g, 0) + 1
        if not cnt:
            tops[n] = 0
            continue
        # committed tie-break: (count DESC, hash60(gram) ASC) — the
        # shuffle key is the hash, never the string (disk-scale rule)
        g, c = sorted(cnt.items(), key=lambda kv: (-kv[1], h60(kv[0])))[0]
        tops[n] = c * len(g) * 1000000 // n_chars
    # duplicated-5-gram token coverage via exact interval union
    cnt5 = {}
    for i in range(len(toks) - 4):
        g = " ".join(toks[i : i + 5])
        cnt5[g] = cnt5.get(g, 0) + 1
    covered = set()
    for i in range(len(toks) - 4):
        g = " ".join(toks[i : i + 5])
        if cnt5[g] >= 2:
            covered.update(range(i, i + 5))
    return (
        n_tok,
        n_chars,
        tops[2],
        tops[3],
        tops[4],
        len(covered) * 1000000 // n_tok,
    )


def test_gopher_repetition_model(spark):
    from hpmr_spark.operators.pretrain2_queries import (
        gopher_repetition_fractions,
    )

    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["total_chars"],
            r["top2_ppm"],
            r["top3_ppm"],
            r["top4_ppm"],
            r["dup5_cover_ppm"],
        )
        for r in gopher_repetition_fractions(spark, SF).collect()
    }
    docs = _docs(spark)
    assert len(got) == len(docs)
    for doc_id, _lang, _src, text in docs:
        assert got[doc_id] == _py_gopher(text), f"doc {doc_id}"


# ------------------------------------------------------- CCNet ppl buckets


def test_ccnet_buckets_model(spark):
    from hpmr_spark.operators.pretrain2_queries import ccnet_ppl_buckets

    docs = _docs(spark)
    cnt = {}
    for _d, _l, _s, text in docs:
        for w in text.split(" "):
            cnt[w] = cnt.get(w, 0) + 1
    tot = sum(cnt.values())
    cost = {w: math.floor(math.log(tot / c) * 1000000) for w, c in cnt.items()}
    nll = {}
    for doc_id, lang, _s, text in docs:
        toks = text.split(" ")
        s = sum(cost[w] for w in toks)
        nll[doc_id] = (lang, len(toks), s // len(toks))
    by_lang = {}
    for doc_id, (lang, _n, v) in nll.items():
        by_lang.setdefault(lang, []).append((v, doc_id))
    bucket = {}
    for lang, vs in by_lang.items():
        vs.sort()
        n = len(vs)
        for r, (_v, doc_id) in enumerate(vs, start=1):
            bucket[doc_id] = (
                "head" if 3 * r <= n else ("middle" if 3 * r <= 2 * n else "tail")
            )
    got = {r["doc_id"]: r for r in ccnet_ppl_buckets(spark, SF).collect()}
    assert len(got) == len(docs)
    for doc_id, (lang, n_tok, v) in nll.items():
        g = got[doc_id]
        assert (g["lang"], g["n_tokens"], g["nll_unano"], g["bucket"]) == (
            lang,
            n_tok,
            v,
            bucket[doc_id],
        ), f"doc {doc_id}"


# --------------------------------------------------- bitext margin mining


def test_bitext_margin_model(spark):
    from hpmr_spark.operators.pretrain2_queries import bitext_margin_mining

    rows = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    n2 = {
        i: sum(math.floor(x * x * 1000000) for x in v) for i, v in vecs.items()
    }
    A = sorted(i for i in vecs if i % 2 == 0)
    B = sorted(i for i in vecs if i % 2 == 1)
    score = {}
    for x in A:
        for y in B:
            dot = sum(
                math.floor(a * b * 1000000)
                for a, b in zip(vecs[x], vecs[y])
            )
            score[(x, y)] = math.floor(
                dot * 1000000000.0 / math.sqrt(float(n2[x]) * float(n2[y]))
            )
    sumx = {
        x: sum(
            s
            for s, _y in sorted(
                ((score[(x, y)], y) for y in B), key=lambda t: (-t[0], t[1])
            )[:4]
        )
        for x in A
    }
    sumy = {
        y: sum(
            s
            for s, _x in sorted(
                ((score[(x, y)], x) for x in A), key=lambda t: (-t[0], t[1])
            )[:4]
        )
        for y in B
    }
    margin = {
        (x, y): math.floor(s * 8000000000.0 / (sumx[x] + sumy[y]))
        for (x, y), s in score.items()
        if sumx[x] + sumy[y] != 0
    }
    bestx = {
        x: min(((-margin[(x, y)], y) for y in B))[1] for x in A
    }
    besty = {
        y: min(((-margin[(x, y)], x) for x in A))[1] for y in B
    }
    expect = {
        (x, y): (score[(x, y)], margin[(x, y)])
        for x in A
        for y in [bestx[x]]
        if besty[y] == x
    }
    got = {
        (r["x_id"], r["y_id"]): (r["score_nano"], r["margin_nano"])
        for r in bitext_margin_mining(spark, SF).collect()
    }
    assert got == expect


# ------------------------------------------------ systematic resampling


def test_systematic_resample_model(spark):
    from hpmr_spark.operators.pretrain2_queries import (
        _RESAMPLE_N,
        systematic_resample_counts,
    )

    docs = sorted(
        (r["doc_id"], len(r["text"].split(" ")))
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    )
    tot = sum(n for _d, n in docs)
    step = max(1, tot // _RESAMPLE_N)
    u = step // 2
    # brute-force: place the N points, count per doc by interval walk
    points = [u + k * step for k in range(_RESAMPLE_N)]
    counts = {}
    cum = 0
    for doc_id, n in docs:
        lo, hi = cum, cum + n
        c = sum(1 for p in points if lo <= p < hi)
        if c:
            counts[doc_id] = c
        cum = hi
    got = {
        r["doc_id"]: r["n_copies"]
        for r in systematic_resample_counts(spark, SF).collect()
    }
    assert got == counts
    assert sum(got.values()) == _RESAMPLE_N


# ------------------------------------------------ Bradley-Terry sanity


def test_bradley_terry_properties(spark):
    """The MM fold itself IS Python (mirrored by the recursive-CTE oracle);
    pin the invariants an MM bug would break: strengths positive, sum to
    ~1e9, and strict win-rate dominance implies strength dominance."""
    from hpmr_spark.operators.pretrain2_queries import (
        bradley_terry_lang_strength,
    )

    rows = bradley_terry_lang_strength(spark, SF).collect()
    assert len(rows) >= 2
    total = sum(r["strength_nano"] for r in rows)
    assert all(r["strength_nano"] > 0 for r in rows)
    assert abs(total - 1_000_000_000) <= len(rows)  # floor slack
    best = max(rows, key=lambda r: r["wins"])
    worst = min(rows, key=lambda r: r["wins"])
    if best["wins"] > worst["wins"]:
        assert best["strength_nano"] > worst["strength_nano"]


# ------------------------------------------------ T5 span corruption


def _hash60_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_span_corruption_model(spark):
    from hpmr_spark.operators.pretrain2_queries import (
        _SPAN_GATE,
        _SPAN_LEN,
        _SPAN_STRIDE,
        span_corruption_transform,
    )

    got = {r["doc_id"]: r for r in span_corruption_transform(spark, SF).collect()}
    docs = _docs(spark)
    assert len(got) == len(docs)
    for doc_id, _l, _s, text in docs:
        toks = text.split(" ")
        n = len(toks)
        starts = [
            i
            for i in range(1, n + 1)
            if i % _SPAN_STRIDE == 1
            and i + _SPAN_LEN - 1 <= n
            and _hash60_py(f"{doc_id}_{i}") % 100 < _SPAN_GATE
        ]
        sid = {s: k + 1 for k, s in enumerate(starts)}
        covered = {}
        for s in starts:
            for i in range(s, s + _SPAN_LEN):
                covered[i] = (sid[s], s)
        corrupt, target = [], []
        for i in range(1, n + 1):
            w = toks[i - 1]
            if i in covered:
                k, s = covered[i]
                if i == s:
                    corrupt.append(f"<X{k}>")
                    target.append(f"<X{k}> {w}")
                else:
                    target.append(w)
            else:
                corrupt.append(w)
        g = got[doc_id]
        assert g["n_spans"] == len(starts), doc_id
        assert g["n_masked"] == len(covered), doc_id
        assert g["masked_ppm"] == len(covered) * 1000000 // n, doc_id
        assert g["corrupt_fp"] == _hash60_py(" ".join(corrupt)), doc_id
        assert g["target_fp"] == _hash60_py(" ".join(target)), doc_id


# ------------------------------------------------ filter funnel


def test_filter_funnel_model(spark):
    from hpmr_spark.operators.pretrain2_queries import (
        _FUNNEL_RULES,
        pipeline_filter_funnel,
    )

    docs = _docs(spark)
    flags = []
    for _d, _l, _s, text in docs:
        toks = text.split(" ")
        n_tok, n_chars = len(toks), len(text)
        n_distinct = len(set(toks))
        max_c = max(toks.count(w) for w in set(toks))
        flags.append(
            [
                10 <= n_tok <= 500,
                n_distinct * 100 >= 35 * n_tok,
                max_c * 100 <= 12 * n_tok,
                3 * n_tok <= n_chars - (n_tok - 1) <= 12 * n_tok,
            ]
        )
    got = {r["stage"]: r for r in pipeline_filter_funnel(spark, SF).collect()}
    assert len(got) == len(_FUNNEL_RULES)
    for k in range(len(_FUNNEL_RULES)):
        n_pass = sum(1 for f in flags if f[k])
        surv = sum(1 for f in flags if all(f[: k + 1]))
        g = got[k + 1]
        assert (g["rule"], g["n_pass_rule"], g["survivors"]) == (
            _FUNNEL_RULES[k][0],
            n_pass,
            surv,
        ), k


# ------------------------------------------------ hard negative mining


def test_hard_negative_model(spark):
    from hpmr_spark.operators.pretrain2_queries import (
        _HN_K,
        _HN_QMOD,
        hard_negative_mining,
    )

    rows = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    ).collect()
    vecs = {r["vec_id"]: ([float(x) for x in r["embedding"]], r["label"]) for r in rows}
    n2 = {
        i: sum(math.floor(x * x * 1000000) for x in v)
        for i, (v, _l) in vecs.items()
    }
    expect = {}
    for qid, (qv, ql) in vecs.items():
        if qid % _HN_QMOD != 0:
            continue
        cand = []
        for cid, (cv, cl) in vecs.items():
            if cl == ql:
                continue
            dot = sum(
                math.floor(a * b * 1000000) for a, b in zip(qv, cv)
            )
            s = math.floor(dot * 1000000000.0 / math.sqrt(float(n2[qid]) * float(n2[cid])))
            cand.append((-s, cid))
        cand.sort()
        for rank, (negs, cid) in enumerate(cand[:_HN_K], start=1):
            expect[(qid, cid)] = (rank, -negs)
    got = {
        (r["query_id"], r["neg_id"]): (r["rank"], r["score_nano"])
        for r in hard_negative_mining(spark, SF).collect()
    }
    assert got == expect


# ------------------------------------------------ cluster-balanced sample


def test_cluster_balanced_properties(spark):
    """Assignment arithmetic is the semdedup machinery (model-tested in
    round 8); pin the balancing contract: per-cell cap respected, ranks
    dense from 1, occupancy consistent, selection is the committed hash
    rank (re-derived for one cell)."""
    from hpmr_spark.operators.pretrain2_queries import (
        _BAL_KEEP,
        _BAL_SALT,
        cluster_balanced_sample,
    )

    rows = cluster_balanced_sample(spark, SF).collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, rs in by_cell.items():
        ranks = sorted(r["rank_in_cell"] for r in rs)
        occ = rs[0]["cell_occupancy"]
        assert all(r["cell_occupancy"] == occ for r in rs)
        assert ranks == list(range(1, min(occ, _BAL_KEEP) + 1)), cell
        # the kept set must be the occ's lowest committed hash ranks —
        # verify the ordering within the kept set matches the hash
        keyed = sorted(
            (_hash60_py(f"{_BAL_SALT}rk:{r['vec_id']}"), r["vec_id"],
             r["rank_in_cell"])
            for r in rs
        )
        assert [k[2] for k in keyed] == list(range(1, len(keyed) + 1)), cell


# ------------------------------------------------ winnowing fingerprints


def test_winnowing_model(spark):
    from hpmr_spark.operators.pretrain2_queries import (
        _WIN_K,
        _WIN_W,
        winnowing_fingerprints,
    )

    docs = _docs(spark)
    grams_by_doc = {}
    for doc_id, _l, _s, text in docs:
        toks = text.split(" ")
        grams_by_doc[doc_id] = [
            _hash60_py(" ".join(toks[i : i + _WIN_K]))
            for i in range(len(toks) - _WIN_K + 1)
        ]
    sel_by_doc = {}
    for doc_id, hs in grams_by_doc.items():
        sel = set()
        for t in range(len(hs) - _WIN_W + 1):
            # rightmost minimum in window [t, t+W)
            best = min(
                range(t, t + _WIN_W), key=lambda i: (hs[i], -i)
            )
            sel.add((best + 1, hs[best]))  # 1-based positions
        sel_by_doc[doc_id] = sel
    doc_count = {}
    for doc_id, sel in sel_by_doc.items():
        for _p, h in set((0, h) for _p, h in sel):
            doc_count[h] = doc_count.get(h, 0) + 1
    got = {r["doc_id"]: r for r in winnowing_fingerprints(spark, SF).collect()}
    assert set(got) == {d for d, s in sel_by_doc.items() if s}
    for doc_id, sel in sel_by_doc.items():
        if not sel:
            continue
        g = got[doc_id]
        assert g["n_grams"] == len(grams_by_doc[doc_id]), doc_id
        assert g["n_fp"] == len(sel), doc_id
        shared = sum(1 for _p, h in sel if doc_count[h] >= 2)
        assert g["n_shared_fp"] == shared, doc_id
        assert g["fp_checksum"] == sum(h for _p, h in sel) % 9223372036854775783, doc_id
