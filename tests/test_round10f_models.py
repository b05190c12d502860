"""Brute-force Python models for the round-10 wave-6 operators
(storage_quant_queries, hpo_ot_queries), on the sf0.001 slice."""

import hashlib
import math

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_cdc_model(spark):
    from hpmr_spark.operators.storage_quant_queries import (
        _CDC_MOD,
        _CDC_W,
        cdc_chunk_dedup,
    )

    chunks = []
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        text = r["text"]
        cuts = [0]
        if len(text) >= _CDC_W:
            for p in range(_CDC_W, len(text) + 1):
                if _h60(text[p - _CDC_W : p]) % _CDC_MOD == 0:
                    cuts.append(p)
        if cuts[-1] != len(text):
            cuts.append(len(text))
        for i in range(len(cuts) - 1):
            chunks.append(text[cuts[i] : cuts[i + 1]])
    n = len(chunks)
    nd = len(set(chunks))
    row = cdc_chunk_dedup(spark, SF).collect()[0]
    assert (
        int(row["n_chunks"]),
        int(row["n_distinct_chunks"]),
        int(row["dup_chunk_ppm"]),
        int(row["mean_chunk_len_milli"]),
    ) == (n, nd, (n - nd) * 1000000 // n, sum(len(c) for c in chunks) * 1000 // n)
    # dedup must actually find shared chunks in a 31-word corpus
    assert nd < n


def test_nf4_model(spark):
    from hpmr_spark.operators.storage_quant_queries import (
        _NF4_MICRO,
        nf4_quantize_error,
    )

    per = {}
    tot = 0
    for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect():
        v = [math.floor(float(x) * 1000000) for x in r["embedding"]]
        s = max(abs(x) for x in v)
        for x in v:
            tot += 1
            best = min(
                (abs(x * 1000000 - lv * s), i, x * 1000000 - lv * s)
                for i, lv in enumerate(_NF4_MICRO)
            )
            _err, idx, e = best
            cnt, sse = per.get(idx, (0, 0))
            per[idx] = (cnt + 1, sse + e * e)
    expect = {
        i: (cnt, cnt * 1000000 // tot, sse // 10**12)
        for i, (cnt, sse) in per.items()
    }
    got = {
        int(r["level_idx"]): (
            int(r["n_assigned"]),
            int(r["share_ppm"]),
            int(r["sse_micro2"]),
        )
        for r in nf4_quantize_error(spark, SF).collect()
    }
    assert got == expect
    # levels must carry the committed values
    lv = {
        int(r["level_idx"]): int(r["level_micro"])
        for r in nf4_quantize_error(spark, SF).collect()
    }
    for i, m in lv.items():
        assert m == _NF4_MICRO[i]


def test_successive_halving_model(spark):
    from hpmr_spark.operators.hpo_ot_queries import (
        _SH_RUNGS,
        _SH_SENTINEL,
        successive_halving_replay,
    )

    docs = [
        (r["lang"], r["source"], int(r["doc_id"]), int(r["n_chars"]))
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    cells = sorted({(l, s) for l, s, _d, _n in docs})
    metric = {}
    for r in range(_SH_RUNGS):
        lim = 2**r
        agg = {}
        for l, s, d, n in docs:
            if _h60(f"sh:{d}") % 8 < lim:
                c, t = agg.get((l, s), (0, 0))
                agg[(l, s)] = (c + 1, t + n)
        for cell in cells:
            c, t = agg.get(cell, (0, 0))
            metric[(cell, r)] = t * 1000 // c if c else _SH_SENTINEL
    surv = list(cells)
    expect = {}
    for r in range(_SH_RUNGS):
        cur = sorted(
            (metric[(cell, r)], cell[0], cell[1]) for cell in surv
        )
        if r < _SH_RUNGS - 1:
            k = (len(surv) + 1) // 2
            nxt = [(l, s) for _m, l, s in cur[:k]]
        else:
            nxt = surv
        expect[r] = (len(surv), len(nxt), cur[0][0])
        surv = nxt
    got = {
        int(r["rung"]): (
            int(r["n_arms"]),
            int(r["n_kept"]),
            int(r["best_milli"]),
        )
        for r in successive_halving_replay(spark, SF).collect()
    }
    assert got == expect


def test_sinkhorn_model(spark):
    from hpmr_spark.operators.hpo_ot_queries import (
        _OT_B,
        _OT_ITERS,
        sinkhorn_ot_langs,
    )

    docs = [
        (r["lang"], int(r["n_chars"]))
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    langs = sorted({l for l, _n in docs})
    la, lb = langs[0], langs[-1]
    ac = [0] * _OT_B
    bc = [0] * _OT_B
    for l, n in docs:
        i = min(7, n // 100)
        if l == la:
            ac[i] += 1
        if l == lb:
            bc[i] += 1
    am = [x / sum(ac) for x in ac]
    bm = [x / sum(bc) for x in bc]
    K = [[math.exp(-abs(i - j)) for j in range(_OT_B)] for i in range(_OT_B)]
    u = [1.0] * _OT_B
    v = [1.0] * _OT_B
    for _ in range(_OT_ITERS):
        # left-to-right sums to mirror the generated '+'-chain exactly
        nu = []
        for i in range(_OT_B):
            den = 0.0
            for j in range(_OT_B):
                den = den + K[i][j] * v[j]
            nu.append(am[i] / den)
        nv = []
        for j in range(_OT_B):
            den = 0.0
            for i in range(_OT_B):
                den = den + K[i][j] * nu[i]
            nv.append(bm[j] / den)
        u, v = nu, nv
    cost = 0.0
    for i in range(_OT_B):
        for j in range(_OT_B):
            cost = cost + u[i] * K[i][j] * v[j] * abs(i - j)
    row = sinkhorn_ot_langs(spark, SF).collect()[0]
    assert (row["lang_a"], row["lang_b"]) == (la, lb)
    assert int(row["sinkhorn_cost_nano"]) == math.floor(cost * 1e9)


def test_cdc_empty_text_guard(spark):
    # ADVICE r8: empty text collapses the cut array to [0] and the
    # unguarded sequence(1, 0) DESCENDS -> ANSI element_at throw. The
    # CASE-wrapped slicer must yield an empty chunk array instead.
    from pyspark.sql import functions as F

    from hpmr_spark.operators.storage_quant_queries import _cdc_spark

    df = spark.createDataFrame(
        [("",), ("ab",), ("the quick brown fox jumps over the lazy dog",)],
        ["text"],
    ).select(F.expr(_cdc_spark()).alias("chunks"), "text")
    rows = {r["text"]: r["chunks"] for r in df.collect()}
    assert rows[""] == []
    # short-but-nonempty text still yields the single whole-text chunk
    assert rows["ab"] == ["ab"]
    assert "".join(rows["the quick brown fox jumps over the lazy dog"]) == (
        "the quick brown fox jumps over the lazy dog"
    )
