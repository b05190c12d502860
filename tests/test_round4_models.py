"""Round-4 model/property tests: invariants of the new operators that the
value-hash oracle can't express (monotonicity, conservation laws, guard
behavior), mirroring tests/test_round3_models.py's role."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _q(name):
    from __spark_entry__ import queries

    return queries()[name]


def test_apportionment_conserves_budget(spark):
    """Hamilton apportionment must hand out EXACTLY the budget (the whole
    point versus float rounding) and each language's quota must differ
    from exact proportionality by less than 1 unit."""
    rows = _q("corpus_mix_apportionment")(spark, SF).collect()
    total_quota = sum(r["quota"] for r in rows)
    assert total_quota == 1_000_000
    tok_total = sum(r["tokens"] for r in rows)
    for r in rows:
        exact = 1_000_000 * r["tokens"] / tok_total
        assert abs(r["quota"] - exact) < 1.0, (r["lang"], r["quota"], exact)
    assert all(r["extra"] in (0, 1) for r in rows)


def test_km_survival_monotone_nonincreasing(spark):
    """A survival curve can never rise; it starts ≤ 1e6 ppm and every step
    multiplies by (1 - d/n) ≤ 1."""
    rows = sorted(
        _q("km_survival_curve")(spark, SF).collect(), key=lambda r: r["dur_us"]
    )
    assert rows, "no death times found"
    prev = 1_000_000
    for r in rows:
        assert 0 <= r["surv_ppm"] <= prev, (r["dur_us"], r["surv_ppm"], prev)
        prev = r["surv_ppm"]
        assert r["d"] >= 1 and r["n_risk"] >= r["d"]


def test_session_cap_bounds(spark):
    """Capped sessions can only SPLIT islands: n_sessions >= n_islands,
    and every count is positive."""
    rows = _q("session_cap_split")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_sessions"] >= r["n_islands"] >= 1
        assert r["max_session_events"] >= 1


def test_minhash_merge_law_holds(spark):
    """sig(A ∪ B) == elementwise min of shard signatures, on every
    permutation — the mergeability that makes the sketch shard-parallel."""
    rows = _q("minhash_merge_property")(spark, SF).collect()
    assert len(rows) == 32
    assert all(r["merged_equals_full"] for r in rows)


def test_retrieval_metrics_in_range(spark):
    """MRR ∈ {0} ∪ [1e9/5, 1e9], nDCG ∈ [0, 1e6]; a query with a relevant
    hit at rank 1 and n_rel == 5 must have nDCG == 1e6 exactly."""
    rows = _q("retrieval_mrr_ndcg")(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["mrr_ppb"] == 0 or 200_000_000 <= r["mrr_ppb"] <= 1_000_000_000
        assert 0 <= r["ndcg_ppm"] <= 1_000_000
        if r["n_rel"] == 5:
            assert r["ndcg_ppm"] == 1_000_000


def test_conformal_coverage_near_nominal(spark):
    """Split-conformal at α=0.1 guarantees ≥ 90% coverage in expectation;
    on a finite exchangeable sample allow slack but catch gross breakage
    (e.g. a wrong rank or comparison direction would tank it)."""
    row = _q("conformal_threshold_coverage")(spark, SF).collect()[0]
    assert row["n_cal"] > 0 and row["n_test"] > 0
    assert row["coverage_ppm"] >= 820_000, row["coverage_ppm"]


def test_bounded_rank_duplicates_degrade_to_competition_rank(spark):
    """The round-4 guard: fully-duplicate (primary, tiebreak) pairs no
    longer merge into one output row — each input row survives with the
    competition rank (count strictly before + 1)."""
    from hpmr_spark.functions.ranking import bounded_rank

    df = spark.createDataFrame(
        [(10, 1), (10, 1), (9, 2), (8, 3)], "v long, t long"
    )
    rows = bounded_rank(df, "v", "t", primary_desc=True, out="rank").collect()
    assert len(rows) == 4  # no silent merge
    by = sorted((r["v"], r["t"], r["rank"]) for r in rows)
    # duplicates (10,1) both rank 1; (9,2) has TWO rows strictly before -> 3
    assert by == [(8, 3, 4), (9, 2, 3), (10, 1, 1), (10, 1, 1)]


def test_knn_vote_agrees_with_python_model(spark):
    """Exact 5-NN vote re-computed in pure Python over the same floored
    integer dots must reproduce the engine's predictions row for row."""
    import math

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    vecs = {r["vec_id"]: (r["embedding"], r["label"]) for r in emb}

    def fl(x):
        return math.floor(float(x) * 1_000_000)

    expected = {}
    for qid, (qe, qlabel) in vecs.items():
        if qid % 50 != 0:
            continue
        scored = []
        for cid, (ce, clabel) in vecs.items():
            if cid == qid:
                continue
            dot = sum(fl(a) * fl(b) for a, b in zip(qe, ce))
            scored.append((-dot, cid, clabel))
        scored.sort()
        top = scored[:5]
        counts = {}
        for _, _, lab in top:
            counts[lab] = counts.get(lab, 0) + 1
        pred = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        expected[qid] = int(pred)
    got = {
        r["vec_id"]: r["pred_label"]
        for r in _q("knn_label_vote_eval")(spark, SF).collect()
    }
    assert got == expected


def test_token_bucket_count_vs_collect(spark):
    """The grouped-pandas fold class sanity (CLAUDE.md: self-cogroup
    miscompiled under count() in Spark 4.1): the applyInPandas token
    bucket must agree between count() and collect()."""
    df = _q("token_bucket_replay")(spark, SF)
    assert df.count() == len(df.collect()) == 150


def test_token_bucket_conservation(spark):
    """allowed + denied must equal each user's event count, and the final
    bucket level stays within [0, cap]."""
    rows = {r["user_id"]: r for r in _q("token_bucket_replay")(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    counts = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").count().withColumnRenamed("count", "n").collect()
    }
    assert set(rows) == set(counts)
    for uid, r in rows.items():
        assert r["n_allowed"] + r["n_denied"] == counts[uid]
        assert 0 <= r["end_tokens_micro"] <= 5_000_000


def test_token_bucket_inrow_fold_vs_python_replay(spark):
    """r12: the fold moved from grouped-pandas to an in-row aggregate()
    HOF — pin the registered query against a direct Python replay of the
    committed integer recurrence (sort by (ts_us, event_id), floor
    refill, min-clamp), including tie ordering."""
    from hpmr_spark.sources.tables import load_events

    ev = load_events(spark, SF).selectExpr(
        "user_id", "event_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us"
    )
    by_user = {}
    for r in ev.collect():
        by_user.setdefault(r["user_id"], []).append((r["ts_us"], r["event_id"]))
    expected = {}
    for uid, evs in by_user.items():
        tokens, allowed, denied, prev = 5_000_000, 0, 0, None
        for ts, _eid in sorted(evs):
            if prev is not None:
                tokens = min(5_000_000, tokens + (ts - prev) // 600)
            if tokens >= 1_000_000:
                allowed, tokens = allowed + 1, tokens - 1_000_000
            else:
                denied += 1
            prev = ts
        expected[uid] = (allowed, denied, tokens)
    got = {
        r["user_id"]: (r["n_allowed"], r["n_denied"], r["end_tokens_micro"])
        for r in _q("token_bucket_replay")(spark, SF).collect()
    }
    assert got == expected


def test_morton_interleave_model(spark):
    """The Z-order key must equal the pure-Python bit interleave for every
    (x, y) in the 8-bit domain sample."""
    from pyspark.sql import functions as F
    from hpmr_spark.operators.layout2_queries import _morton_spark

    df = spark.range(0, 256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") % 251 % 16).alias("y")
    )
    got = df.select(
        "x", "y", F.expr(f"CAST({_morton_spark('x', 'y')} AS BIGINT)").alias("z")
    ).collect()

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for r in got:
        assert r["z"] == morton(r["x"], r["y"]), (r["x"], r["y"])


def test_weighted_median_python_model(spark):
    """Grouped weighted median re-derived in pure Python must match."""
    rows = _q("weighted_median_by_segment")(spark, SF).collect()
    o = spark.read.parquet(f"{SF}/orders.parquet").collect()
    c = {r["c_custkey"]: r["c_mktsegment"] for r in
         spark.read.parquet(f"{SF}/customer.parquet").collect()}
    from collections import defaultdict

    hist = defaultdict(lambda: defaultdict(int))
    for r in o:
        seg = c.get(r["o_custkey"])
        if seg is None:
            continue
        cents = int(round(r["o_totalprice"] * 100))
        w = 1 + r["o_orderkey"] % 5
        hist[seg][cents] += w
    for row in rows:
        h = hist[row["segment"]]
        total = sum(h.values())
        cw = 0
        med = None
        for v in sorted(h):
            cw += h[v]
            if 2 * cw >= total:
                med = v
                break
        assert row["weighted_median_cents"] == med
        assert row["total_weight"] == total


def test_apportionment_extra_goes_to_largest_remainders(spark):
    """The +1 units must land exactly on the languages with the largest
    remainders (tie-break lang asc) — the Hamilton rule itself."""
    rows = _q("corpus_mix_apportionment")(spark, SF).collect()
    tok_total = sum(r["tokens"] for r in rows)
    rem = {r["lang"]: (1_000_000 * r["tokens"]) % tok_total for r in rows}
    leftover = 1_000_000 - sum((1_000_000 * r["tokens"]) // tok_total for r in rows)
    order = sorted(rows, key=lambda r: (-rem[r["lang"]], r["lang"]))
    expect_extra = {r["lang"] for r in order[:leftover]}
    for r in rows:
        assert r["extra"] == (1 if r["lang"] in expect_extra else 0), r["lang"]


def test_new_stats_shuffle_partition_invariant(spark):
    """The round-4 statistics must return identical results under a
    hostile shuffle-partition count (7 vs the session default) — the
    partition-invariance discipline, applied to the newest operators."""
    names = ["sprt_purchase_rate", "mutual_information_nano",
             "woe_iv_segments", "mann_whitney_u_gate"]
    def run_all():
        out = {}
        for n in names:
            rows = _q(n)(spark, SF).collect()
            out[n] = sorted(tuple(r) for r in rows)
        return out
    default = spark.conf.get("spark.sql.shuffle.partitions")
    base = run_all()
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = run_all()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
    assert base == alt


def test_dp_noise_matches_python_model(spark):
    """The deterministic Laplace release must equal the pure-Python
    recomputation from the same committed md5-derived uniform."""
    import hashlib
    import math

    rows = _q("dp_noised_segment_counts")(spark, SF).collect()
    assert rows
    for r in rows:
        h = hashlib.md5(f"dp:{r['segment']}".encode()).hexdigest()[:15]
        u_e9 = int(h, 16) % 1_000_000_000
        sign = 1 if 2 * u_e9 + 1 >= 1_000_000_000 else -1
        z = (1_000_000_000 - abs(2 * u_e9 + 1 - 1_000_000_000)) / 1_000_000_000.0
        mag = math.floor(-math.log(z) * 1_000_000)
        assert r["noise_micro"] == sign * mag, r["segment"]
        assert r["released_micro"] == r["n_true"] * 1_000_000 + sign * mag


def test_record_linkage_matches_all_true_twins(spark):
    """Every planted twin (i, i) must clear the 2.0-nat threshold — even
    the segment-corrupted (custkey % 7 == 0) ones, whose balance+decade
    agreement still scores ~3.5 nats."""
    rows = _q("record_linkage_fs")(spark, SF).collect()
    pairs = {(r["a_key"], r["b_key"]) for r in rows}
    keys = [r["c_custkey"] for r in
            spark.read.parquet(f"{SF}/customer.parquet").collect()]
    missing = [k for k in keys if (k, k) not in pairs]
    assert not missing, f"unmatched twins: {missing[:5]}"


def test_voptimal_dp_matches_bruteforce(spark, sf_dir):
    """voptimal_histogram_dp (round 5) — independent Python model: exact
    integer moments per pre-bucket, the SAME committed ppm cost floor,
    then BRUTE-FORCE enumeration of all C(15,3) boundary triples. Guards
    against a shared bug in the generated DP text (both engines execute
    identical SQL, so oracle parity alone can't catch it)."""
    import itertools

    import pandas as pd

    from hpmr_spark.operators.stats_catalog_queries import (
        _VO_B,
        _VO_K,
        voptimal_histogram_dp,
    )

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    v = (o["o_totalprice"] * 100).round().astype("int64")
    mn, mx = int(v.min()), int(v.max())
    k = (
        ((v - mn) * _VO_K) // (mx - mn + 1)
    ).clip(upper=_VO_K - 1) if mx > mn else v * 0
    pc = [0] * (_VO_K + 1)
    ps = [0] * (_VO_K + 1)
    pq = [0] * (_VO_K + 1)
    for j in range(1, _VO_K + 1):
        sel = v[k < j]
        pc[j] = int(len(sel))
        ps[j] = int(sel.sum())
        pq[j] = int((sel.astype(object) * sel.astype(object)).sum())
    n0 = pc[_VO_K]
    d0 = n0 * pq[_VO_K] - ps[_VO_K] * ps[_VO_K]

    def cost(i, j):
        c = pc[j] - pc[i]
        if c <= 0:
            return 0
        raw = c * (pq[j] - pq[i]) - (ps[j] - ps[i]) ** 2
        return (raw * 1000000 * n0) // (c * d0)

    # brute force optimum for exactly _VO_B bins ending at K
    best = None
    for cuts in itertools.combinations(range(1, _VO_K), _VO_B - 1):
        bounds = (0,) + cuts + (_VO_K,)
        tot = sum(cost(bounds[t], bounds[t + 1]) for t in range(_VO_B))
        if best is None or tot < best:
            best = tot

    rows = {
        (r["n_bins"], r["boundary"]): (r["cost_ppm"], r["from_boundary"])
        for r in voptimal_histogram_dp(spark, sf_dir).collect()
    }
    got_best, _ = rows[(_VO_B, _VO_K)]
    assert got_best == best, (got_best, best)
    # walk the backtrack chain: must be strictly decreasing to 0 in B steps
    b, j = _VO_B, _VO_K
    while b > 1:
        _, prev = rows[(b, j)]
        assert 0 < prev < j
        b, j = b - 1, prev
    assert rows[(1, j)][1] == 0


def test_isotonic_minimax_matches_pava(spark, sf_dir):
    """isotonic_calibration_minimax (round 5): recompute the floored
    minimax in plain Python from the raw parquet (independent of the
    generated SQL), assert exact equality; then fit true PAVA with exact
    rational pooling and assert the floored minimax is within 1 ppm of
    it (the committed quantization bound) and monotone."""
    import pandas as pd

    from hpmr_spark.functions.hashing import hash60  # noqa: F401 (doc)
    from hpmr_spark.operators.mleval_queries import (
        _ISO_BINS,
        _scored,
        isotonic_calibration_minimax,
    )

    sdf = _scored(spark, sf_dir).toPandas()
    sdf["bin"] = sdf["score_ppm"] // 50000
    g = sdf.groupby("bin").agg(w=("y", "size"), p=("y", "sum")).sort_index()
    bins = list(g.index)
    cw = {0: (0, 0)}
    run_w = run_p = 0
    for j in range(1, _ISO_BINS + 1):
        if (j - 1) in g.index:
            run_w += int(g.loc[j - 1, "w"])
            run_p += int(g.loc[j - 1, "p"])
        cw[j] = (run_w, run_p)

    def seg(a, b):
        wa, pa = cw[a]
        wb, pb = cw[b]
        if wb <= wa:
            return None
        return ((pb - pa) * 1000000) // (wb - wa)

    expected = {}
    for i in bins:
        best = None
        for a in range(0, i + 1):
            inner = None
            for b in range(i + 1, _ISO_BINS + 1):
                c = seg(a, b)
                if c is not None and (inner is None or c < inner):
                    inner = c
            if inner is not None and (best is None or inner > best):
                best = inner
        expected[i] = best

    got = {
        r["bin"]: r["iso_rate_ppm"]
        for r in isotonic_calibration_minimax(spark, sf_dir).collect()
    }
    assert got == expected

    # exact-rational PAVA as the ground truth (blocks pooled with Fractions)
    from fractions import Fraction

    blocks = [
        (int(g.loc[b, "w"]), int(g.loc[b, "p"]), [b]) for b in bins
    ]
    merged = []
    for blk in blocks:
        merged.append(blk)
        while len(merged) >= 2 and Fraction(merged[-2][1], merged[-2][0]) > Fraction(
            merged[-1][1], merged[-1][0]
        ):
            w2, p2, b2 = merged.pop()
            w1, p1, b1 = merged.pop()
            merged.append((w1 + w2, p1 + p2, b1 + b2))
    pava = {}
    for w, p, bs in merged:
        for b in bs:
            pava[b] = Fraction(p * 1000000, w)
    vals = [got[b] for b in bins]
    assert vals == sorted(vals), "isotonic output must be monotone"
    for b in bins:
        assert abs(got[b] - pava[b]) <= 1, (b, got[b], float(pava[b]))
