"""Edge cases for text functions (empty/punct-only/whitespace strings) and
the KeyedMap capacity/introspection API (SURVEY §2 rows 8/10)."""

from pyspark.sql import functions as F

from hpmr_spark import KeyedMap, Reducer
from hpmr_spark.functions import text as T


def _one(spark, s, col_fn):
    df = spark.createDataFrame([(s,)], ["text"])
    return df.select(col_fn(F.col("text")).alias("v")).first()["v"]


def test_token_counts_edge_strings(spark):
    assert _one(spark, "", T.token_count) == 0
    assert _one(spark, "   ", T.token_count) == 0
    assert _one(spark, "", T.whitespace_token_count) == 0
    assert _one(spark, "  a  b ", T.whitespace_token_count) == 2
    assert _one(spark, "a-b c!", T.token_count) == 5  # a, -, b, c, !
    assert _one(spark, "...", T.punct_count) == 3


def test_quality_score_bounds(spark):
    for s in ["", "!!!", "the " * 100, "x"]:
        v = _one(spark, s, T.quality_score_ppm)
        assert 0 <= v <= 1_000_000, (s, v)


def test_lang_id_und_on_empty(spark):
    assert _one(spark, "", T.lang_id) == "und"
    assert _one(spark, "zzz qqq", T.lang_id) == "und"
    assert _one(spark, "the cat and dog", T.lang_id) == "en"
    # tie between de and en marker hits → lexicographically first (de)
    assert _one(spark, "der the", T.lang_id) == "de"


def test_fingerprint_normalization(spark):
    a = _one(spark, "Hello   World", T.fingerprint)
    b = _one(spark, "  hello world ", T.fingerprint)
    assert a == b


def test_keyed_map_partitions_and_reserve(spark):
    km = KeyedMap.from_pairs(spark, [(i, i) for i in range(100)], Reducer.sum)
    assert km.n_partitions() >= 1  # get_n_buckets analog
    km8 = km.reserve(8)
    assert km8.n_partitions() == 8  # reserve pre-sizes partitioning
    assert km8.n_keys() == 100  # and never changes content
