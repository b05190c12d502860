from hpmr_spark.functions.hashing import hash32, hash60, sql_hash32, sql_hash60
from hpmr_spark.functions.text import (
    fingerprint,
    fingerprint64,
    lang_id,
    quality_score_ppm,
    token_count,
    tokens,
)
from hpmr_spark.functions.vectors import cosine, dot, norm

__all__ = [
    "hash32",
    "hash60",
    "sql_hash32",
    "sql_hash60",
    "fingerprint",
    "fingerprint64",
    "lang_id",
    "quality_score_ppm",
    "token_count",
    "tokens",
    "cosine",
    "dot",
    "norm",
]
