"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The reference's only programmatic source is Range + inserts
(/root/reference/src/hpmr.h:1-10, SURVEY.md §2.3); this is the engine's
extensible-connector analog: a pure-Python batch source that plans its own
partitions, so Spark schedules N parallel reader tasks exactly like any
native connector. The generator is seeded arithmetic with committed
constants — fully deterministic, so a SQL oracle can recompute every row.

At 100 TB the same four-method surface (schema / partitions / read) is how
you'd wrap an internal service or proprietary format; partition planning
is the scale lever (one InputPartition per shard/split of the backend).

Module-scope classes only define types (session-less import rule);
registration with a live session happens in the query functions.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Committed generator constants (oracle recomputes with the same ones).
SEQ_N = 100_000
SEQ_PARTS = 8
SEQ_MOD = 97
SEQ_MULT = 2654435761  # Knuth multiplicative constant


class SeqPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SeqReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", SEQ_N))
        self.parts = int(options.get("parts", SEQ_PARTS))

    def partitions(self):
        # contiguous ranges — Spark runs one reader task per partition
        step = (self.n + self.parts - 1) // self.parts
        return [
            SeqPartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: SeqPartition):
        mult, mod = SEQ_MULT, SEQ_MOD
        for i in range(partition.start, partition.end):
            # (i * Knuth) mod 2^32 mod 97 — exact in Python ints; the oracle
            # reproduces it with BIGINT arithmetic
            yield (i, (i * mult % 4294967296) % mod)


class SeqDataSource(DataSource):
    """spark.read.format("hpmr_seq").option("n", ...).load()"""

    @classmethod
    def name(cls) -> str:
        return "hpmr_seq"

    def schema(self) -> str:
        return "i bigint, bucket bigint"

    def reader(self, schema) -> SeqReader:
        return SeqReader(self.options)


def register_seq_source(spark) -> None:
    spark.dataSource.register(SeqDataSource)


# ---------------------------------------------------------------------------
# Batch WRITER half of the connector surface (Spark 4 DataSourceWriter):
# executors write JSON-lines shards in parallel, one file per partition.
# ---------------------------------------------------------------------------
from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage  # noqa: E402


class JsonLinesWriter(DataSourceWriter):
    """Runs ON EXECUTORS: each write() call streams one partition to its own
    shard file — the 1-task-per-partition parallelism contract, mirrored
    from the reader's partitions() planning."""

    def __init__(self, options, overwrite: bool):
        self.path = options["path"]

    def write(self, iterator):
        import json as _json
        import os as _os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        _os.makedirs(self.path, exist_ok=True)
        out = _os.path.join(self.path, f"part-{pid:05d}.jsonl")
        with open(out, "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict()) + "\n")
        return WriterCommitMessage()

    def commit(self, messages):
        return None

    def abort(self, messages):
        return None


class JsonLinesDataSource(DataSource):
    """df.write.format("hpmr_jsonlines").option("path", dir).save()"""

    @classmethod
    def name(cls) -> str:
        return "hpmr_jsonlines"

    def writer(self, schema, overwrite: bool) -> JsonLinesWriter:
        return JsonLinesWriter(self.options, overwrite)


def register_jsonlines_sink(spark) -> None:
    spark.dataSource.register(JsonLinesDataSource)
