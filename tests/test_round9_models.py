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
        # full (count DESC, gram ASC) tie-break, exactly as committed
        g, c = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
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
