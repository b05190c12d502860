"""prange — generated integer-sequence source, the analog of Range<T>
(/root/reference/src/range.h:7-26).

The reference strides elements across MPI ranks and OpenMP threads
(src/range.h:47-48); ``spark.range`` produces the same partitioned sequence
natively (one contiguous slice per partition — equivalent coverage, different
stride order, which is irrelevant because downstream ops are keyed)."""

from __future__ import annotations

from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hpmr_spark.core.keyed_map import KEY, VALUE, KeyedMap
from hpmr_spark.reducers import _Reducer


class prange:
    def __init__(
        self,
        spark: SparkSession,
        start: int,
        end: int | None = None,
        step: int = 1,
        num_partitions: int | None = None,
    ):
        if end is None:
            start, end = 0, start
        self.spark = spark
        self.start, self.end, self.step = start, end, step
        self.num_partitions = num_partitions

    def to_df(self) -> DataFrame:
        return self.spark.range(self.start, self.end, self.step, self.num_partitions)

    def map_reduce(
        self, mapper: Callable[[int], Iterable[tuple]], reducer: _Reducer
    ) -> KeyedMap:
        """Range::mapreduce (src/range.h:28-64): flatMap each element into
        (k, v) pairs, merge by key. Python mapper → RDD path with map-side
        combine via reduceByKey."""
        rdd = self.to_df().rdd.flatMap(lambda row: mapper(row[0])).reduceByKey(reducer.fn)
        return KeyedMap(rdd.toDF([KEY, VALUE]), _unique=True)

    def map_reduce_expr(self, key_expr, value_expr, reducer: _Reducer) -> KeyedMap:
        """Declarative variant — stays fully JVM-side (whole-stage codegen)."""
        projected = self.to_df().select(key_expr.alias(KEY), value_expr.alias(VALUE))
        return KeyedMap(projected, _unique=False).sync(reducer)
