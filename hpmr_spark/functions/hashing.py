"""Cross-engine deterministic hashing.

Spark's xxhash64/hash and DuckDB's hash() are different algorithms, so the
engine's content hashes are all derived from md5 (identical everywhere):
``hash60(x)`` = first 15 hex chars of md5(x) as a BIGINT (60 bits, always
positive, fits a long exactly). MinHash permutations then act on
``hash60 % P32`` with fixed odd multipliers.

Everything is a Catalyst expression — md5 + conv run JVM-side; the DuckDB
twin (`sql_hash60`) is generated from the same constants so oracles match
bit-for-bit.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

P32 = 4294967291  # largest prime < 2^32; minhash value domain
M32 = 4294967296  # 2^32, simhash bit domain

# Fixed minhash permutation constants (seeded, committed — NOT runtime random;
# runtime randomness would break resume/oracle determinism).
_rng = random.Random(0xC0FFEE)
N_PERM = 32
MINHASH_A = [(_rng.randrange(1, 1 << 30) * 2 + 1) for _ in range(N_PERM)]  # odd, < 2^31
MINHASH_B = [_rng.randrange(0, 1 << 30) for _ in range(N_PERM)]


def hash60(col) -> Column:
    """md5-derived 60-bit hash as BIGINT (deterministic across engines)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash32(col) -> Column:
    """hash60 reduced into the 32-bit minhash domain."""
    return hash60(col) % F.lit(P32)


def minhash_perm(h32: Column, j: int) -> Column:
    """j-th permutation: (a_j·h + b_j) mod P32. a_j < 2^31, h < 2^32 →
    product < 2^63, no long overflow (ANSI-safe)."""
    return (F.lit(MINHASH_A[j]) * h32 + F.lit(MINHASH_B[j])) % F.lit(P32)


# ---------------------------------------------------------------- DuckDB twins
SQL_HEX15_TO_BIGINT = (
    # lambda var deliberately obscure: this expression gets embedded in
    # queries whose outer scope may bind common names like `i`
    "CAST(list_sum(list_transform(range(15), _hx -> "
    "CAST(strpos('0123456789abcdef', substr({h}, _hx+1, 1)) - 1 AS BIGINT) "
    "* (CAST(1 AS BIGINT) << (4*(14-_hx))))) AS BIGINT)"
)


def sql_hash60(expr: str) -> str:
    """DuckDB SQL computing the same value as hash60(expr)."""
    return SQL_HEX15_TO_BIGINT.format(h=f"substr(md5({expr}), 1, 15)")


def spark_sql_hash60(expr: str) -> str:
    """Spark-SQL TEXT twin of hash60() — for queries built as SQL text
    (the py4j-churn discipline): same value as hash60(col)."""
    return f"CAST(conv(substring(md5({expr}),1,15),16,10) AS BIGINT)"


def sql_hash32(expr: str) -> str:
    return f"({sql_hash60(expr)} % {P32})"
