"""Brute-force Python models for the round-7 operators: the cross-engine
oracle gate cannot catch a bug in arithmetic BOTH engines share, so the
committed formulas are re-derived in plain Python on a small slice
(CLAUDE.md round-5 rule; same pattern as test_round4_models.py)."""

import math

from pyspark.sql import functions as F

from hpmr_spark.operators.dsir_queries import _B, _TARGET


def _pydocs(spark, sf_dir="/root/testdata/sf0.001"):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    ).collect()


def _hash60_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_dsir_model(spark):
    from hpmr_spark.operators.dsir_queries import dsir_importance_select

    rows = _pydocs(spark)
    # Python model: identical bucket hash, Laplace smoothing, nano floors
    tb, rb = {}, {}
    nt = nr = 0
    per_doc = {}
    lang_of = {}
    for r in rows:
        lang_of[r.doc_id] = r.lang
        for w in r.text.split(" "):
            b = _hash60_py("dsir|" + w) % _B
            rb[b] = rb.get(b, 0) + 1
            nr += 1
            if r.lang == _TARGET:
                tb[b] = tb.get(b, 0) + 1
                nt += 1
            per_doc.setdefault(r.doc_id, {})
            per_doc[r.doc_id][b] = per_doc[r.doc_id].get(b, 0) + 1
    lr = {
        b: math.floor(
            (
                math.log(tb.get(b, 0) + 1)
                - math.log(nt + _B)
                - math.log(cnt_r + 1)
                + math.log(nr + _B)
            )
            * 1_000_000_000
        )
        for b, cnt_r in rb.items()
    }
    scores = {
        d: sum(k * lr[b] for b, k in bs.items()) for d, bs in per_doc.items()
    }
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r.doc_id, r.logweight_nano)
        for r in dsir_importance_select(spark, "/root/testdata/sf0.001").collect()
    ]
    assert got == want


def test_gopher_model(spark):
    from hpmr_spark.operators.dsir_queries import gopher_quality_rules

    rows = _pydocs(spark)
    stops = {"the", "be", "to", "of", "and", "that", "have", "with", "a", "is"}
    agg = {}
    for r in rows:
        ws = r.text.split(" ")
        nw = len(ws)
        letters = len(r.text.replace(" ", ""))
        n_hash = r.text.count("#")
        n_ell = r.text.count("...")  # non-overlapping, same as replace-count
        alpha = sum(1 for w in ws if any("a" <= c <= "z" for c in w))
        stop = sum(1 for w in ws if w in stops)
        rs = (
            1 if 50 <= nw <= 100000 else 0,
            1 if 3 * nw <= letters <= 10 * nw else 0,
            1 if 10 * (n_hash + n_ell) <= nw else 0,
            1 if 10 * alpha >= 8 * nw else 0,
            1 if stop >= 2 else 0,
        )
        a = agg.setdefault(r.lang, [0, 0, 0, 0, 0, 0, 0])
        a[0] += 1
        for i in range(5):
            a[1 + i] += rs[i]
        a[6] += int(all(rs))
    got = {
        r.lang: (
            r.n_docs,
            r.pass_wordcount,
            r.pass_wordlen,
            r.pass_symbols,
            r.pass_alpha,
            r.pass_stopwords,
            r.pass_all,
            r.pass_all_ppm,
        )
        for r in gopher_quality_rules(spark, "/root/testdata/sf0.001").collect()
    }
    for lang, a in agg.items():
        ppm = a[6] * 1_000_000 // a[0]
        assert got[lang] == (a[0], a[1], a[2], a[3], a[4], a[5], a[6], ppm), lang
