"""Oracle-checked source/sink roundtrip queries: results must be unchanged by
a write→read cycle in each format (serialization identity — the reference's
to_string/from_string round-trip test, src/bare_map_test.cc:157-168)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpmr_spark.catalog import register, _t
from hpmr_spark.sources.sinks import roundtrip

_REV_SQL = """
    SELECT l_orderkey,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem GROUP BY l_orderkey
"""


def _revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return li.groupBy("l_orderkey").agg(F.sum(cents).alias("revenue_cents"))


@register("sink_parquet_roundtrip", _REV_SQL)
def sink_parquet_roundtrip(spark, sf_dir):
    return roundtrip(_revenue(spark, sf_dir), "parquet", "rev")


@register("sink_csv_roundtrip", _REV_SQL)
def sink_csv_roundtrip(spark, sf_dir):
    return roundtrip(_revenue(spark, sf_dir), "csv", "rev")


@register("sink_json_roundtrip", _REV_SQL)
def sink_json_roundtrip(spark, sf_dir):
    return roundtrip(_revenue(spark, sf_dir), "json", "rev")


@register("sink_orc_roundtrip", _REV_SQL)
def sink_orc_roundtrip(spark, sf_dir):
    """ORC: the second bundled columnar format (predicate pushdown + column
    pruning like parquet); same serialization-identity contract."""
    return roundtrip(_revenue(spark, sf_dir), "orc", "rev")


@register("sink_xml_roundtrip", _REV_SQL)
def sink_xml_roundtrip(spark, sf_dir):
    """XML: Spark 4 native XML source/sink (rowTag records), read back with
    the writer's schema. Row-oriented text — interchange, not analytics."""
    return roundtrip(_revenue(spark, sf_dir), "xml", "rev")


@register("sink_text_roundtrip", _REV_SQL)
def sink_text_roundtrip(spark, sf_dir):
    """Line-based text (the raw-log interchange format): rows serialize to
    tab-joined lines and re-parse with exact integer casts on read — the
    schema-on-read discipline for ingesting logs at scale. Integer-cents
    values survive the string trip bit-exactly (never floats)."""
    return roundtrip(_revenue(spark, sf_dir), "text", "rev")
