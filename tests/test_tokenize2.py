"""unigram_viterbi_segment — independent Python brute-force model check.

The DuckDB oracle proves cross-engine parity, but both engines execute
the SAME unrolled DP text; a bug in the recurrence generation would pass
the parity gate on both sides. This test recomputes the optimal
segmentation by exhaustive enumeration (pure Python, no DP) from the raw
parquet and pins the query output against it.
"""

import itertools

import pandas as pd
import pytest

from hpmr_spark.operators.tokenize2_queries import (
    _MAX_LEN,
    _MAX_PIECE,
    _VOCAB_MIN_WORDS,
    unigram_viterbi_segment,
)


def _model(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    words = set()
    for t in docs["text"]:
        for w in t.split(" "):
            if 2 <= len(w) <= _MAX_LEN and w.isascii() and w.isalpha() and w.islower():
                words.add(w)
    # data-derived vocab: pieces of len 2..4 at any (j, i) slot, in ≥ N words
    piece_words = {}
    for w in words:
        for i in range(2, len(w) + 1):
            for j in range(max(0, i - _MAX_PIECE), i - 1):
                piece_words.setdefault(w[j:i], set()).add(w)
    vocab = {
        p: 4 * len(p) * len(p)
        for p, ws in piece_words.items()
        if len(ws) >= _VOCAB_MIN_WORDS
    }

    def segmentations(w):
        # all compositions of len(w) into parts 1..MAX_PIECE
        n = len(w)
        def rec(pos):
            if pos == n:
                yield []
                return
            for ln in range(1, min(_MAX_PIECE, n - pos) + 1):
                for rest in rec(pos + ln):
                    yield [w[pos : pos + ln]] + rest
        return rec(0)

    out = {}
    for w in words:
        best = None
        for seg in segmentations(w):
            score = 0
            ok = True
            for p in seg:
                if len(p) == 1:
                    score += 1
                elif p in vocab:
                    score += vocab[p]
                else:
                    ok = False
                    break
            if not ok:
                continue
            key = (score, -len(seg))
            if best is None or key > best:
                best = key
        assert best is not None  # single chars always valid
        out[w] = (best[0], -best[1])
    return out


def test_viterbi_matches_bruteforce(spark, sf_dir):
    expected = _model(sf_dir)
    got = {
        r["word"]: (r["seg_score"], r["n_pieces"])
        for r in unigram_viterbi_segment(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for w in expected:
        assert got[w] == expected[w], (w, got[w], expected[w])


# ---------------------------------------------------------------------------
# BPE trainer: brute-force Python model (guards the fold/argmax generator —
# cross-engine parity cannot catch a bug in generated text both engines
# share, CLAUDE.md round-5 rule).
# ---------------------------------------------------------------------------
def _python_bpe(texts, n_merges=8):
    import re
    from collections import Counter

    w = Counter()
    for t in texts:
        for tok in re.findall(r"[a-z0-9]+", t.lower()):
            if len(tok) >= 2:
                w[tok] += 1
    toks = {t: list(t) for t in w}
    rules = []
    for step in range(1, n_merges + 1):
        pc = Counter()
        for t, n in w.items():
            sy = toks[t]
            for i in range(len(sy) - 1):
                pc[(sy[i], sy[i + 1])] += n
        assert pc, "corpus exhausted before n_merges"
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        (l, r), cnt = best
        rules.append((step, l, r, cnt))
        for t in toks:
            sy, out = toks[t], []
            for s in sy:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            toks[t] = out
    return rules


def test_bpe_train_matches_python_model(spark, tmp_path):
    import hpmr_spark.all_queries  # noqa: F401
    from hpmr_spark.catalog import QUERIES

    texts = [
        "the cat sat on the mat with the other cat",
        "banana bandana ananas",
        "aaa abab abba baab",
        "low lower lowest newer newest wider wide",
        "the the the them theme anthem",
    ]
    df = spark.createDataFrame(
        [(i, "srcx", t) for i, t in enumerate(texts)],
        ["doc_id", "source", "text"],
    )
    d = str(tmp_path / "bpe_docs")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = [
        (r["step"], r["lhs"], r["rhs"], r["cnt"])
        for r in QUERIES["bpe_train_8_merges"](spark, d).collect()
    ]
    expected = _python_bpe(texts, 8)
    assert sorted(got) == expected, (sorted(got), expected)
