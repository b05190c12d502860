"""Brute-force Python models for the round-9 sixth wave
(planning_eval_queries), on the sf0.001 slice."""

import hashlib
import math
import re

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(spark):
    return [
        (r["doc_id"], r["lang"], r["source"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]


def _softdedup_doc_weights(docs):
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
        q = abs(s) // (n_tok - 2)
        common[doc_id] = (src, n_tok, q if s >= 0 else -q)
    cmin = min(c for _, _, c in common.values())
    cmax = max(c for _, _, c in common.values())
    return {
        doc_id: (src, n_tok, c,
                 (cmax - c) * 1000000 // max(cmax - cmin, 1))
        for doc_id, (src, n_tok, c) in common.items()
    }


# -------------------------------------------------------------- chinchilla


def test_chinchilla_model(spark):
    from hpmr_spark.operators.planning_eval_queries import (
        _CHIN_SIZES,
        _CHIN_TPP,
        chinchilla_data_budget,
    )

    docs = _docs(spark)
    d = sum(len(t.split(" ")) for _, _, _, t in docs)
    got = {r["params"]: r for r in chinchilla_data_budget(spark, SF).collect()}
    assert set(got) == set(_CHIN_SIZES)
    for n in _CHIN_SIZES:
        g = got[n]
        assert g["tokens_needed"] == _CHIN_TPP * n
        assert g["corpus_tokens"] == d
        assert g["repeats_needed"] == (_CHIN_TPP * n + d - 1) // d
        assert g["flops_e15"] == 6 * n * (_CHIN_TPP * n) // 10**15


# --------------------------------------------------------------------- ESS


def test_importance_weight_ess_model(spark):
    from hpmr_spark.operators.planning_eval_queries import (
        importance_weight_ess,
    )

    docs = _docs(spark)
    w = _softdedup_doc_weights(docs)
    per_src = {}
    for src, _, _, w_ppm in w.values():
        if w_ppm <= 0:
            continue
        a = per_src.setdefault(src, [0, 0, 0])
        a[0] += 1
        a[1] += w_ppm
        a[2] += w_ppm * w_ppm
    got = {r["source"]: r for r in importance_weight_ess(spark, SF).collect()}
    assert len(got) == len(per_src)
    for src, (n, s1, s2) in per_src.items():
        g = got[src]
        assert g["n_docs"] == n
        assert g["w_sum"] == s1
        assert g["ess_ppm"] == s1 * s1 * 1000000 // (n * s2)
        # ESS can never exceed the sample count
        assert g["ess_ppm"] <= 1000000


# ------------------------------------------------------ temperature scaling


def test_temperature_scaling_model(spark):
    from hpmr_spark.operators.planning_eval_queries import (
        _TEMPS,
        temperature_scaling_grid,
    )

    rows = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "label"
    ).collect()
    base = []
    for r in rows:
        y = r["label"] % 2
        score = _h60(str(r["vec_id"])) % 700000 + y * 300000
        p = max(min(score, 999999), 1)
        lgt = math.log(float(p)) - math.log(float(1000000 - p))
        base.append((y, lgt))
    exp = {}
    for t in _TEMPS:
        tf = float(t)
        s = 0
        for y, lgt in base:
            z = (0.0 - (lgt / tf)) if y == 1 else (lgt / tf)
            s += math.floor(math.log(1.0 + math.exp(z)) * 1e9)
        exp[int(tf * 1000)] = (len(base), s // len(base))
    best = min(v[1] for v in exp.values())
    got = {r["t_milli"]: r for r in
           temperature_scaling_grid(spark, SF).collect()}
    assert len(got) == len(exp)
    for tm, (n, nll) in exp.items():
        g = got[tm]
        assert (g["n"], g["nll_mean_nano"]) == (n, nll)
        assert g["is_best"] == (nll == best)
    assert sum(1 for g in got.values() if g["is_best"]) >= 1


# ------------------------------------------------------- signal agreement


def test_dedup_signal_agreement_model(spark):
    from hpmr_spark.functions.hashing import MINHASH_A, MINHASH_B, N_PERM, P32
    from hpmr_spark.operators.planning_eval_queries import (
        _AGREE_JAC_PCT,
        dedup_signal_agreement,
    )

    docs = _docs(spark)
    sh, sig, simv = {}, {}, {}
    for doc_id, _, _, text in docs:
        toks = re.findall(r"[a-z0-9]+", text.lower())
        if len(toks) < 3:
            continue
        grams = list(dict.fromkeys(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ))
        sh[doc_id] = set(grams)
        h60 = [_h60(g) for g in grams]
        h32 = [h % P32 for h in h60]
        sig[doc_id] = [
            min((MINHASH_A[j] * h + MINHASH_B[j]) % P32 for h in h32)
            for j in range(N_PERM)
        ]
        simv[doc_id] = [
            1 if sum(1 if (h >> k) & 1 else -1 for h in h60) > 0 else 0
            for k in range(60)
        ]
    ids = sorted(sig)
    exp = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            hit = any(
                sig[a][2 * bi] == sig[b][2 * bi]
                and sig[a][2 * bi + 1] == sig[b][2 * bi + 1]
                for bi in range(N_PERM // 2)
            )
            if not hit:
                continue
            inter = len(sh[a] & sh[b])
            uni = len(sh[a] | sh[b])
            ex = 100 * inter >= _AGREE_JAC_PCT * uni
            m = sum(1 for j in range(N_PERM) if sig[a][j] == sig[b][j])
            est = 100 * m >= _AGREE_JAC_PCT * N_PERM
            ham = sum(
                1 for k in range(60) if simv[a][k] != simv[b][k]
            )
            sim = ham <= 3
            key = (ex, est, sim)
            exp[key] = exp.get(key, 0) + 1
    got = {(r["sig_exact"], r["sig_est"], r["sig_simhash"]): r["n_pairs"]
           for r in dedup_signal_agreement(spark, SF).collect()}
    assert got == exp
    assert sum(exp.values()) > 0
