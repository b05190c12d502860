"""Brute-force Python models for the round-9 fifth wave
(decode_profile_queries): independent re-derivations on the sf0.001
slice — hashlib for the MinHash permutations, a dict-based beam search,
and an O(n^2 w) float matrix profile."""

import hashlib
import math

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return [
        (r["doc_id"], r["lang"], r["source"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]


# ------------------------------------------------------------- beam search


def test_beam_search_model(spark):
    from hpmr_spark.operators.decode_profile_queries import (
        _BEAM_SEED,
        _BEAM_STEPS,
        _BEAM_W,
        lm_beam_search_decode,
    )

    docs = _docs(spark)
    big, ctx = {}, {}
    for _, _, _, text in docs:
        toks = text.split(" ")
        for i in range(len(toks) - 1):
            big[(toks[i], toks[i + 1])] = big.get((toks[i], toks[i + 1]), 0) + 1
            ctx[toks[i]] = ctx.get(toks[i], 0) + 1
    beam = [(_BEAM_SEED, _BEAM_SEED, 0)]  # (seq, last, score_nano)
    exp = {}
    for k in range(1, _BEAM_STEPS + 1):
        cand = []
        for seq, last, score in beam:
            for (w1, w2), n in big.items():
                if w1 != last:
                    continue
                step = math.floor(
                    math.log(float(n) / float(ctx[w1])) * 1e9
                )
                cand.append((seq + " " + w2, w2, score + step))
        cand.sort(key=lambda t: (-t[2], t[0]))
        beam = cand[:_BEAM_W]
        for rk, (seq, last, score) in enumerate(beam, start=1):
            exp[(k, rk)] = (seq, last, score)
    got = {(r["step"], r["rank"]): (r["seq"], r["last_word"], r["score_nano"])
           for r in lm_beam_search_decode(spark, SF).collect()}
    assert got == exp
    # beam-1 at step k must score >= beam-2 (the tie-break is total)
    for k in range(1, _BEAM_STEPS + 1):
        assert exp[(k, 1)][2] >= exp[(k, 2)][2]


# ---------------------------------------------------------- matrix profile


def test_matrix_profile_model(spark):
    from hpmr_spark.operators.decode_profile_queries import (
        _MP_W,
        matrix_profile_daily,
    )

    rows = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    day = {}
    for r in rows:
        d = (r["o_orderdate"].date() - __import__("datetime").date(1970, 1, 1)).days
        day[d] = day.get(d, 0) + int(round(r["o_totalprice"] * 100))
    day = {d: c // 100 for d, c in day.items()}  # committed dollar downscale
    wins = {}
    for d in day:
        vec = [day.get(d + k) for k in range(_MP_W)]
        if any(v is None for v in vec):
            continue
        s1, s2 = sum(vec), sum(v * v for v in vec)
        if _MP_W * s2 - s1 * s1 <= 0:
            continue
        wins[d] = (vec, s1, s2)
    exp = {}
    for da, (va, s1a, s2a) in wins.items():
        best = None
        for db, (vb, s1b, s2b) in wins.items():
            if abs(da - db) < _MP_W:
                continue
            dot = sum(x * y for x, y in zip(va, vb))
            num = float(_MP_W * dot - s1a * s1b)
            den = math.sqrt(
                float(_MP_W * s2a - s1a * s1a)
                * float(_MP_W * s2b - s1b * s1b)
            )
            d2 = math.floor(
                (2.0 * _MP_W * (1.0 - num / den)) * 1e9
            )
            if best is None or (d2, db) < best:
                best = (d2, db)
        exp[da] = best
    got = {r["d"]: (r["mp_d2_nano"], r["mp_nn_day"])
           for r in matrix_profile_daily(spark, SF).collect()}
    assert len(got) == len(exp)
    # the model's float-expression order matches the committed SQL text, so
    # distances and the struct-min neighbor must agree exactly (1 nano of
    # slack retained for the sum-order of the python dot product)
    for d, (d2, nn) in exp.items():
        gd2, gnn = got[d]
        assert abs(gd2 - d2) <= 1
        assert gnn == nn or abs(gd2 - d2) <= 1
    # invariants: d2 in [0, 4w] scaled, self-exclusion respected
    for d, (gd2, gnn) in got.items():
        assert -1 <= gd2 <= 4 * _MP_W * 10**9
        assert abs(d - gnn) >= _MP_W


# --------------------------------------------------- minhash estimate error


def test_minhash_estimate_error_model(spark):
    import re

    from hpmr_spark.functions.hashing import MINHASH_A, MINHASH_B, N_PERM, P32
    from hpmr_spark.operators.decode_profile_queries import (
        minhash_estimate_error,
    )

    docs = _docs(spark)
    sh, sig = {}, {}
    for doc_id, _, _, text in docs:
        toks = re.findall(r"[a-z0-9]+", text.lower())
        if len(toks) < 3:
            continue
        grams = list(dict.fromkeys(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ))
        sh[doc_id] = set(grams)
        h32 = [
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % P32
            for g in grams
        ]
        sig[doc_id] = [
            min((MINHASH_A[j] * h + MINHASH_B[j]) % P32 for h in h32)
            for j in range(N_PERM)
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
            m = sum(1 for j in range(N_PERM) if sig[a][j] == sig[b][j])
            est = m * 1000000 // N_PERM
            inter = len(sh[a] & sh[b])
            uni = len(sh[a] | sh[b])
            exact = inter * 1000000 // uni
            exp[(a, b)] = (est, exact, abs(est - exact))
    got = {(r["doc_a"], r["doc_b"]): (r["est_ppm"], r["exact_ppm"],
                                      r["abs_err_ppm"])
           for r in minhash_estimate_error(spark, SF).collect()}
    assert got == exp
    assert len(got) > 0, "no candidate pair: the measurement is vacuous"
