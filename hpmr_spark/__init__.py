"""hpmr_spark — a PySpark-native analytics engine with the capabilities of
jl2922/hpmr (distributed keyed state + shuffle + keyed aggregation), rebuilt
Spark-first, plus large-scale training-data-pipeline operators.

Reference parity map (see SURVEY.md §2):
  DistMap<K,V>        -> hpmr_spark.core.KeyedMap     (keyed DataFrame, ≤1 row/key)
  HashSet/Concurrent* -> hpmr_spark.core.KeyedSet     (distinct keys DataFrame)
  Range<T>            -> hpmr_spark.core.prange       (spark.range source)
  Reducer::*          -> hpmr_spark.reducers          (sum/min/max/keep/overwrite/...)

All heavy lifting is delegated to Catalyst/Tungsten: map-side combine, shuffle,
serialization, partitioning (reference src/dist_map.h:118-210) are Spark
built-ins; this library only declares logical plans.
"""

from hpmr_spark.engine import get_spark, session_builder
from hpmr_spark.reducers import Reducer
from hpmr_spark.core.keyed_map import KeyedMap
from hpmr_spark.core.keyed_set import KeyedSet
from hpmr_spark.core.prange import prange

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "session_builder",
    "Reducer",
    "KeyedMap",
    "KeyedSet",
    "prange",
]
