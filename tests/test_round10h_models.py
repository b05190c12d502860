"""Brute-force Python models for the round-10 wave-8 operators
(string_membership_queries), on the sf0.001 slice. The Jaro-Winkler model
follows the TEXTBOOK algorithm independently (window matching with used
flags, transpositions over matched sequences) — if the committed fold
deviates from Jaro's definition, this catches what cross-engine parity
cannot."""

import hashlib
import math

SF = "/root/testdata/sf0.001"


def _jw_micro(a: str, b: str):
    ma, mb = len(a), len(b)
    w = max(max(ma, mb) // 2 - 1, 0)
    used = [False] * mb
    mi, mj = [], []
    for i in range(ma):
        lo, hi = max(0, i - w), min(mb - 1, i + w)
        for j in range(lo, hi + 1):
            if not used[j] and b[j] == a[i]:
                used[j] = True
                mi.append(i)
                mj.append(j)
                break
    m = len(mi)
    if m == 0:
        return 0, 0
    bs = [b[j] for j in sorted(mj)]
    t2 = sum(1 for k in range(m) if a[mi[k]] != bs[k])
    den = 6 * ma * mb * m
    jnum = 2 * m * m * mb + 2 * m * m * ma + (2 * m - t2) * ma * mb
    ell = 0
    for p in range(min(ma, mb, 4)):
        if a[p] == b[p]:
            ell += 1
        else:
            break
    return m, (10 * jnum + ell * (den - jnum)) * 1000000 // (10 * den)


def test_jaro_winkler_model(spark):
    from hpmr_spark.operators.string_membership_queries import (
        jaro_winkler_pairs,
    )

    vocab = sorted(
        {
            w
            for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
            for w in r["text"].split(" ")
        }
    )
    expect = {}
    for a, b in zip(vocab, vocab[1:]):
        m, sim = _jw_micro(a, b)
        expect[(a, b)] = (m, sim)
    got = {
        (r["word_a"], r["word_b"]): (int(r["n_matches"]), int(r["sim_micro"]))
        for r in jaro_winkler_pairs(spark, SF).collect()
    }
    assert got == expect
    # sanity on the classic textbook example semantics: identical strings
    assert _jw_micro("martha", "martha")[1] == 1000000
    # Winkler prefix boost: MARTHA/MARHTA = 0.961111 (textbook value)
    assert _jw_micro("martha", "marhta")[1] == 961111
    # DWAYNE/DUANE = 0.84 (textbook value)
    assert _jw_micro("dwayne", "duane")[1] == 840000


def test_mink_model(spark):
    from hpmr_spark.operators.string_membership_queries import (
        _MK_PCT,
        mink_prob_membership,
    )

    docs = [
        (int(r["doc_id"]), r["source"], r["text"].split(" "))
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    cnt = {}
    for _d, _s, toks in docs:
        for w in toks:
            cnt[w] = cnt.get(w, 0) + 1
    n = sum(cnt.values())

    def tdiv(x, d):
        return x // d if x >= 0 else -((-x) // d)

    per_src = {}
    for _d, src, toks in docs:
        lps = sorted(
            math.floor((math.log(cnt[w]) - math.log(n)) * 1e9) for w in toks
        )
        k = (len(toks) * _MK_PCT + 99) // 100
        mink = tdiv(sum(lps[:k]), k)
        cnt_s, tot_s, mx = per_src.get(src, (0, 0, None))
        per_src[src] = (
            cnt_s + 1,
            tot_s + mink,
            mink if mx is None else max(mx, mink),
        )
    expect = {
        src: (c, tdiv(t, c), mx) for src, (c, t, mx) in per_src.items()
    }
    got = {
        r["source"]: (
            int(r["n_docs"]),
            int(r["mean_mink_nano"]),
            int(r["max_mink_nano"]),
        )
        for r in mink_prob_membership(spark, SF).collect()
    }
    assert got == expect
