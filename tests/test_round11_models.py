"""Brute-force Python models for the round-11 wave-1 operators
(corpus_text2_queries), on the sf0.001 slice + hand-computed examples."""

import re

SF = "/root/testdata/sf0.001"


def _syllables(w: str) -> int:
    return max(1, len(re.findall(r"[aeiouy]+", w)))


def test_flesch_kincaid_model(spark):
    from hpmr_spark.operators.corpus_text2_queries import (
        flesch_kincaid_readability,
    )

    import math

    per_lang = {}
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        wl = [w for w in r["text"].split(" ") if w]
        if not wl:
            continue
        W = len(wl)
        Y = sum(_syllables(w) for w in wl)
        S = (W + 14) // 15
        grade = math.floor((390.0 * W) / S + (11800.0 * Y) / W - 15590.0)
        st = per_lang.setdefault(r["lang"], [0, 0, 0, [], 0])
        st[0] += 1
        st[1] += W
        st[2] += Y
        st[3].append(grade)
    rows = {
        r["lang"]: r for r in flesch_kincaid_readability(spark, SF).collect()
    }
    assert set(rows) == set(per_lang)
    for lang, (n, w, y, grades, _) in per_lang.items():
        r = rows[lang]
        assert (r["n_docs"], r["n_words"], r["n_syllables"]) == (n, w, y)
        tot = sum(grades)
        # engine div truncates toward zero (CLAUDE.md), like int() here
        assert r["avg_grade_milli"] == int(tot / n) if tot < 0 else tot // n
        assert r["min_grade_milli"] == min(grades)
        assert r["max_grade_milli"] == max(grades)


def _lz78(words):
    d = set()
    cur = []
    n = 0
    for w in words:
        cand = cur + [w]
        if tuple(cand) in d:
            cur = cand
        else:
            d.add(tuple(cand))
            n += 1
            cur = []
    if cur:
        n += 1
    return n


def test_lz78_hand_example(spark):
    # a b a b a b c a b a b -> phrases a | b | a~b | a~b~c | a~b~a | b(partial)
    from pyspark.sql import functions as F

    from hpmr_spark.operators.corpus_text2_queries import lz78_phrase_census

    assert _lz78("a b a b a b c a b a b".split()) == 6

    import tempfile

    tmp = tempfile.mkdtemp()
    spark.createDataFrame(
        [(1, "a b a b a b c a b a b", "en", "s", 21)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    row = lz78_phrase_census(spark, tmp).collect()[0]
    assert (row["n_words"], row["n_phrases"]) == (11, 6)
    assert row["lz_ratio_ppm"] == 6 * 1000000 // 11


def test_lz78_corpus_model(spark):
    from hpmr_spark.operators.corpus_text2_queries import lz78_phrase_census

    exp = {}
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        wl = [w for w in r["text"].split(" ") if w]
        if wl:
            exp[r["doc_id"]] = (len(wl), _lz78(wl))
    rows = {r["doc_id"]: r for r in lz78_phrase_census(spark, SF).collect()}
    assert set(rows) == set(exp)
    for did, (nw, np_) in exp.items():
        assert (rows[did]["n_words"], rows[did]["n_phrases"]) == (nw, np_)
