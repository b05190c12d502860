"""Shingling: word n-gram sets per document — the substrate for exact
n-gram-Jaccard, MinHash-LSH, and SimHash dedup.

Tokens for shingling are alnum runs only ([a-z0-9]+ on lowercased text);
documents with fewer than n tokens have no shingles and are excluded from
near-dup detection (both engine and oracle apply the same rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHINGLE_TOKEN_RE = "[a-z0-9]+"
NGRAM = 3

# DuckDB twin of shingle_sets() — kept adjacent so they evolve together.
SQL_SHINGLE_CTE = """
  shingled AS (
    SELECT doc_id,
           list_distinct(list_transform(range(len(toks) - 2),
                                        i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS sh
    FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents)
    WHERE len(toks) >= 3)
"""


def shingle_sets(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """(doc_id, sh: array<string>) — distinct word n-grams per document."""
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(SHINGLE_TOKEN_RE), F.lit(0))
    with_toks = docs.select("doc_id", toks.alias("toks")).where(F.size("toks") >= n)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at("toks", (i + k).cast("int")) for k in range(n)]
        ),
    )
    return with_toks.select("doc_id", F.array_distinct(grams).alias("sh"))
