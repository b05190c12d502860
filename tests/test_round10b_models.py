"""Brute-force Python models for the round-10 wave-2 operators
(eval_robust_queries), on the sf0.001 slice."""

import hashlib

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_youden_model(spark):
    from hpmr_spark.operators.eval_robust_queries import youden_j_threshold
    from hpmr_spark.operators.mleval_queries import _scored

    rows = [(int(r["y"]), int(r["score_ppm"])) for r in _scored(spark, SF).collect()]
    npos = sum(y for y, _ in rows)
    n = len(rows)
    nneg = n - npos
    best = None
    for t in sorted({s for _, s in rows}):
        tp = sum(1 for y, s in rows if y == 1 and s >= t)
        fp = sum(1 for y, s in rows if y == 0 and s >= t)
        jnum = tp * nneg - fp * npos
        key = (-jnum, t)
        if best is None or key < best[0]:
            best = (key, t, tp, fp)
    _, t, tp, fp = best
    jnum = tp * nneg - fp * npos
    expect = (t, tp, fp, npos - tp, nneg - fp, jnum * 1000000 // (npos * nneg))
    r = youden_j_threshold(spark, SF).collect()[0]
    got = (
        int(r["threshold_ppm"]),
        int(r["tp"]),
        int(r["fp"]),
        int(r["fn"]),
        int(r["tn"]),
        int(r["j_ppm"]),
    )
    assert got == expect


def test_dpo_model(spark):
    from hpmr_spark.operators.eval_robust_queries import dpo_margin_stats

    docs = sorted(
        (r["lang"], int(r["doc_id"]), int(r["n_chars"]))
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    )
    by_lang = {}
    for lang, did, nc in docs:
        by_lang.setdefault(lang, []).append((did, nc))
    expect = {}
    for lang, rows in by_lang.items():
        rows.sort()
        margins = []
        for i in range(0, len(rows) - 1, 2):
            a, b = rows[i], rows[i + 1]
            # chosen = max by (n_chars, doc_id)
            w, l = max(a, b, key=lambda p: (p[1], p[0])), min(
                a, b, key=lambda p: (p[1], p[0])
            )
            r_w = _h60(f"dpo:{w[0]}") % 1000000 + w[1] * 1000
            r_l = _h60(f"dpo:{l[0]}") % 1000000 + l[1] * 1000
            diff = (r_w - r_l) * 100
            m = diff // 1000 if diff >= 0 else -((-diff) // 1000)
            margins.append(m)
        if margins:
            sm = sum(margins)
            mean = sm // len(margins) if sm >= 0 else -((-sm) // len(margins))
            expect[lang] = (
                len(margins),
                sum(1 for m in margins if m > 0) * 1000000 // len(margins),
                mean,
            )
    got = {
        r["lang"]: (
            int(r["n_pairs"]),
            int(r["acc_ppm"]),
            int(r["mean_margin_nano"]),
        )
        for r in dpo_margin_stats(spark, SF).collect()
    }
    assert got == expect


def test_krippendorff_model(spark):
    from hpmr_spark.operators.eval_robust_queries import (
        krippendorff_alpha_nominal,
    )

    doc_ids = [
        int(r["doc_id"])
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    labels = {}
    for d in doc_ids:
        base = _h60(f"ka:b:{d}") % 3
        for r in range(3):
            gate = _h60(f"ka:n:{r}:{d}") % 10
            flip = _h60(f"ka:f:{r}:{d}") % 2
            labels[(d, r)] = (base + 1 + flip) % 3 if gate < 2 else base
    do2 = 0
    marg = {}
    for d in doc_ids:
        cnt = {}
        for r in range(3):
            lab = labels[(d, r)]
            cnt[lab] = cnt.get(lab, 0) + 1
            marg[lab] = marg.get(lab, 0) + 1
        do2 += 9 - sum(c * c for c in cnt.values())
    n = sum(marg.values())
    s2 = sum(c * c for c in marg.values())
    num = 2 * (n * n - s2) - do2 * (n - 1)
    alpha_ppm = num * 1000000 // (2 * (n * n - s2))
    r = krippendorff_alpha_nominal(spark, SF).collect()[0]
    assert (
        int(r["n_units"]),
        int(r["n_ratings"]),
        int(r["do2"]),
        int(r["num"]),
        int(r["alpha_ppm"]),
    ) == (len(doc_ids), n, do2, num, alpha_ppm)
    # sanity: noisy-but-correlated raters land strictly between chance and 1
    assert 0 < alpha_ppm < 1000000


def test_randomization_model(spark):
    from hpmr_spark.operators.eval_robust_queries import (
        _RT_B,
        randomization_test_mean_diff,
    )

    days = {}
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        ed = (r["o_orderdate"].date() - __import__("datetime").date(1970, 1, 1)).days
        days[ed] = days.get(ed, 0) + int(round(float(r["o_totalprice"]) * 100))
    na = sum(1 for ed in days if (ed + 3) % 7 < 5)
    sa = sum(c for ed, c in days.items() if (ed + 3) % 7 < 5)
    nb = len(days) - na
    sb = sum(days.values()) - sa
    t_obs = abs(sa * nb - sb * na)
    n_ge = 0
    for b in range(1, _RT_B + 1):
        pna = psa = pnb = psb = 0
        for ed, c in days.items():
            if _h60(f"rt:{b}:{ed}") % 7 < 5:
                pna += 1
                psa += c
            else:
                pnb += 1
                psb += c
        if pna > 0 and pnb > 0:
            if abs(psa * pnb - psb * pna) * (na * nb) >= t_obs * (pna * pnb):
                n_ge += 1
    r = randomization_test_mean_diff(spark, SF).collect()[0]
    assert (
        int(r["n_days"]),
        int(r["n_perms"]),
        int(r["n_ge"]),
        int(r["mean_diff_cents"]),
        int(r["p_ppm"]),
    ) == (
        len(days),
        _RT_B,
        n_ge,
        t_obs // (na * nb),
        (1 + n_ge) * 1000000 // (_RT_B + 1),
    )
