"""Python-model tests for the mleval / scale-sketch / IR batches: each
Spark result is re-derived with an independent pure-Python model (the
reference's gtest style — small exact fixtures, SURVEY.md §5)."""

import math

import pytest

import hpmr_spark.all_queries  # noqa: F401
from hpmr_spark.catalog import QUERIES


def test_auc_matches_python_model(spark, sf_dir):
    row = QUERIES["binary_classifier_eval_auc"](spark, sf_dir).collect()[0]
    from hpmr_spark.operators.mleval_queries import _scored

    pairs = [(r.y, r.score_ppm) for r in _scored(spark, sf_dir).collect()]
    pos = sorted(s for y, s in pairs if y == 1)
    neg = sorted(s for y, s in pairs if y == 0)
    # exact Mann-Whitney: wins + half-ties
    wins2 = 0  # 2*U to stay integer
    for p in pos:
        for q in neg:
            if p > q:
                wins2 += 2
            elif p == q:
                wins2 += 1
    auc_ppm = wins2 * 1000000 // (2 * len(pos) * len(neg))
    assert row.auc_ppm == auc_ppm
    assert row.n_pos == len(pos) and row.n == len(pos) + len(neg)
    # confusion identities
    assert row.tp + row.fn == row.n_pos
    assert row.tp + row.fp + row.fn + row.tn == row.n
    # the committed score construction separates classes: AUC well above coin-flip
    assert row.auc_ppm > 700000


def test_heavy_hitters_partitioning_robust(spark, sf_dir):
    """The MG sketch must be a superset under ANY input partitioning — the
    final exact recount therefore gives identical heavy hitters whether the
    tokens arrive in 1 partition or many (mergeable-summary guarantee)."""
    base = {
        (r.w, r.n_w)
        for r in QUERIES["heavy_hitters_mg"](spark, sf_dir).collect()
    }
    assert base, "corpus should have heavy hitters at k=200"
    # independent python recount
    from hpmr_spark.catalog import _t

    texts = [r.text for r in _t(spark, sf_dir, "documents").select("text").collect()]
    counts: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            counts[w] = counts.get(w, 0) + 1
    n = sum(counts.values())
    expect = {(w, c) for w, c in counts.items() if c * 200 > n}
    assert base == expect


def test_mg_sketch_superset_many_partitions(spark, sf_dir):
    """Drive the sketch itself through 16 skewed partitions and assert the
    candidate set still contains every true heavy hitter."""
    from hpmr_spark.catalog import _t
    from pyspark.sql import functions as F

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("w")).repartition(16)

    import pandas as pd

    def mg_sketch(batches):
        state = {}
        cap = 400
        for pdf in batches:
            for w, c in pdf["w"].value_counts().items():
                state[w] = state.get(w, 0) + int(c)
            if len(state) > cap:
                cut = sorted(state.values(), reverse=True)[cap]
                state = {w: c - cut for w, c in state.items() if c > cut}
        yield pd.DataFrame({"w": list(state.keys())})

    cand = {r.w for r in toks.mapInPandas(mg_sketch, "w string").distinct().collect()}
    texts = [r.text for r in docs.select("text").collect()]
    counts: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            counts[w] = counts.get(w, 0) + 1
    n = sum(counts.values())
    true_hitters = {w for w, c in counts.items() if c * 200 > n}
    assert true_hitters <= cand


def test_bloom_accounting(spark, sf_dir):
    r = QUERIES["bloom_semi_prune"](spark, sf_dir).collect()[0]
    # no false negatives ever; false positives exactly accounted
    assert r.n_bloom_pass >= r.n_true_match
    assert r.n_false_pos == r.n_bloom_pass - r.n_true_match
    assert r.n_probe > 0


def test_interval_coverage_python_model(spark, sf_dir):
    from hpmr_spark.sources.tables import load_events
    from pyspark.sql import functions as F

    got = {
        r.user_id: (r.covered_us, r.n_islands)
        for r in QUERIES["interval_coverage_union"](spark, sf_dir).collect()
    }
    ev = load_events(spark, sf_dir).select(
        "user_id", F.unix_micros("ts").alias("s")
    )
    by_user: dict[int, list[int]] = {}
    for r in ev.collect():
        by_user.setdefault(r.user_id, []).append(r.s)
    for uid, starts in by_user.items():
        ivs = sorted((s, s + 600000000) for s in starts)
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        covered = sum(e - s for s, e in merged)
        assert got[uid] == (covered, len(merged)), uid


def test_entropy_python_model(spark, sf_dir):
    from hpmr_spark.catalog import _t

    rows = QUERIES["token_entropy_by_lang"](spark, sf_dir).collect()
    docs = _t(spark, sf_dir, "documents").select("lang", "text").collect()
    by_lang: dict[str, dict[str, int]] = {}
    for r in docs:
        d = by_lang.setdefault(r.lang, {})
        for w in r.text.split(" "):
            d[w] = d.get(w, 0) + 1
    for r in rows:
        counts = by_lang[r.lang]
        n = sum(counts.values())
        s = sum(math.floor(c * math.log(c) * 1000000) for c in counts.values())
        expect = math.floor(math.log(n) * 1000000) - s // n
        assert r.entropy_uppm == expect, r.lang
        # sanity: entropy below ln(vocab) and positive for a mixed corpus
        assert 0 < r.entropy_uppm <= math.ceil(math.log(r.vocab) * 1000000)


def test_bm25_python_model(spark, sf_dir):
    from hpmr_spark.catalog import _t
    from hpmr_spark.operators.ir_stats_queries import _BM25_TERMS

    rows = QUERIES["bm25_topk_docs"](spark, sf_dir).collect()
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    n_docs = len(docs)
    sum_dl = sum(len(r.text.split(" ")) for r in docs)
    per_term: dict[str, list[tuple[int, int]]] = {}
    dl = {}
    tf: dict[str, dict[int, int]] = {t: {} for t in _BM25_TERMS}
    for r in docs:
        ws = r.text.split(" ")
        dl[r.doc_id] = len(ws)
        for w in ws:
            if w in tf:
                tf[w][r.doc_id] = tf[w].get(r.doc_id, 0) + 1
    for term, docs_tf in tf.items():
        df = len(docs_tf)
        scored = []
        for doc_id, t in docs_tf.items():
            idf = math.log(1.0 + (float(n_docs - df) + 0.5) / (float(df) + 0.5))
            score = (
                idf
                * (float(t) * 2.2)
                / (float(t) + 1.2 * (0.25 + 0.75 * float(dl[doc_id]) * float(n_docs) / float(sum_dl)))
            )
            scored.append((math.floor(score * 1000000), doc_id))
        scored.sort(key=lambda x: (-x[0], x[1]))
        per_term[term] = scored[:5]
    for r in rows:
        assert (r.score_ppm, r.doc_id) == per_term[r.term][r.rnk - 1], (r.term, r.rnk)


def test_iqr_quartiles_are_order_statistics(spark, sf_dir):
    from hpmr_spark.catalog import _t
    from pyspark.sql import functions as F

    rows = QUERIES["iqr_fences_outliers"](spark, sf_dir).collect()
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_returnflag").alias("flag"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    by_flag: dict[str, list[int]] = {}
    for r in li:
        by_flag.setdefault(r.flag, []).append(r.cents)
    for r in rows:
        vals = sorted(by_flag[r.flag])
        n = len(vals)
        assert r.n == n
        assert r.q1_cents == vals[(n + 3) // 4 - 1]
        assert r.q3_cents == vals[(3 * n + 3) // 4 - 1]
        lo = sum(1 for c in vals if 2 * c < 5 * r.q1_cents - 3 * r.q3_cents)
        hi = sum(1 for c in vals if 2 * c > 5 * r.q3_cents - 3 * r.q1_cents)
        assert (r.n_out_low, r.n_out_high) == (lo, hi)


def test_bitmap_identities(spark, sf_dir):
    rows = QUERIES["bitmap_daily_activity"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_active_days == bin(r.days_bitmap).count("1")
        assert r.first_active_day == (r.days_bitmap & -r.days_bitmap).bit_length()
        assert r.last_active_day == r.days_bitmap.bit_length()
        assert 1 <= r.first_active_day <= r.last_active_day <= 31


def test_bootstrap_ci_brackets_point(spark, sf_dir):
    r = QUERIES["bootstrap_ci_poisson"](spark, sf_dir).collect()[0]
    assert r.ci_lo_cents <= r.point_mean_cents <= r.ci_hi_cents
    assert r.ci_lo_cents < r.ci_hi_cents and r.n > 0
