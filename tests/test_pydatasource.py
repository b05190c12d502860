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


def test_jsonlines_writer_shard_per_partition(spark, tmp_path):
    from hpmr_spark.sources.pydatasource import register_jsonlines_sink

    register_jsonlines_sink(spark)
    d = str(tmp_path / "out")
    df = spark.range(0, 100).repartition(4).selectExpr(
        "id AS o_orderkey", "'X' AS o_orderpriority", "id * 7 AS cents"
    )
    df.write.format("hpmr_jsonlines").option("path", d).mode("append").save()
    import glob

    shards = sorted(glob.glob(d + "/part-*.jsonl"))
    assert len(shards) == 4  # one shard per partition, written by executors
    back = spark.read.schema(
        "o_orderkey bigint, o_orderpriority string, cents bigint"
    ).json(d)
    assert back.count() == 100
    assert back.selectExpr("sum(cents)").collect()[0][0] == sum(i * 7 for i in range(100))
