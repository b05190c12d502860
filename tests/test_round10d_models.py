"""Brute-force Python models for the round-10 wave-4 operators
(seq_align_queries), on the sf0.001 slice."""

import math

SF = "/root/testdata/sf0.001"


def _lcs(a, b):
    m, n = len(a), len(b)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            dp[i][j] = max(
                dp[i - 1][j],
                dp[i][j - 1],
                dp[i - 1][j - 1] + (1 if a[i - 1] == b[j - 1] else 0),
            )
    return dp[m][n]


def test_rouge_l_model(spark):
    from hpmr_spark.operators.seq_align_queries import (
        _RL_M,
        _RL_MIN,
        rouge_l_lead_tail,
    )

    per = {}
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        t = r["text"].split(" ")
        if len(t) < _RL_MIN:
            continue
        lcs = _lcs(t[:_RL_M], t[-_RL_M:])
        n, s, f = per.get(r["lang"], (0, 0, 0))
        per[r["lang"]] = (n + 1, s + lcs, f + lcs * 1000000 // (2 * _RL_M))
    expect = {lang: (n, s, f // n) for lang, (n, s, f) in per.items()}
    got = {
        r["lang"]: (int(r["n_docs"]), int(r["sum_lcs"]), int(r["mean_f_ppm"]))
        for r in rouge_l_lead_tail(spark, SF).collect()
    }
    assert got == expect
    # sanity: at least one doc somewhere shares a word between lead & tail
    assert sum(s for _n, s, _f in per.values()) > 0


def test_curriculum_model(spark):
    from hpmr_spark.operators.seq_align_queries import (
        _CC_T,
        curriculum_competence_pacing,
    )

    docs = sorted(
        (int(r["n_chars"]), int(r["doc_id"]))
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    )
    nd = len(docs)
    expect = {}
    for t in range(_CC_T + 1):
        adm = [
            (nc, did)
            for rk, (nc, did) in enumerate(docs, start=1)
            if 100 * _CC_T * rk * rk <= nd * nd * (99 * t + _CC_T)
        ]
        expect[t] = (
            math.floor(
                math.sqrt((99.0 * t + _CC_T) / (100.0 * _CC_T)) * 1000000
            ),
            len(adm),
            sum(nc for nc, _ in adm),
        )
    got = {
        int(r["step"]): (
            int(r["competence_ppm"]),
            int(r["n_admitted"]),
            int(r["admitted_chars"]),
        )
        for r in curriculum_competence_pacing(spark, SF).collect()
    }
    assert got == expect
    # monotone admission, full corpus at t = T
    assert got[_CC_T][1] == nd
    for t in range(1, _CC_T + 1):
        assert got[t][1] >= got[t - 1][1]
