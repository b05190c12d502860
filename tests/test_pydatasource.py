"""Custom Python DataSource: partition planning + deterministic rows."""

from hpmr_spark.sources.pydatasource import (
    SEQ_MOD,
    SEQ_MULT,
    SEQ_N,
    SEQ_PARTS,
    register_seq_source,
)


def test_seq_source_partitions_and_rows(spark):
    register_seq_source(spark)
    df = spark.read.format("hpmr_seq").load()
    # partitions() drives task parallelism 1:1
    assert df.rdd.getNumPartitions() == SEQ_PARTS
    assert df.count() == SEQ_N
    row = df.where("i = 12345").collect()[0]
    assert row.bucket == (12345 * SEQ_MULT % 4294967296) % SEQ_MOD


def test_seq_source_options(spark):
    register_seq_source(spark)
    df = spark.read.format("hpmr_seq").option("n", 1000).option("parts", 3).load()
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 1000
