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
