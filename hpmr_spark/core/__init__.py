from hpmr_spark.core.keyed_map import KeyedMap
from hpmr_spark.core.keyed_set import KeyedSet
from hpmr_spark.core.prange import prange

__all__ = ["KeyedMap", "KeyedSet", "prange"]
