"""Import every module that registers queries into hpmr_spark.catalog.

Importing this module fully populates QUERIES/ORACLES. Modules are optional
while under construction — each import is individually guarded so a broken
extension never takes down the whole registry.
"""

import importlib

_MODULES = [
    "hpmr_spark.catalog",
    "hpmr_spark.operators.relational",
    "hpmr_spark.operators.relational2",
    "hpmr_spark.operators.kv_parity",
    "hpmr_spark.operators.relational3",
    "hpmr_spark.operators.temporal_queries",
    "hpmr_spark.operators.relational4",
    "hpmr_spark.operators.relational5",
    "hpmr_spark.operators.relational6",
    "hpmr_spark.operators.bucketing_queries",
    "hpmr_spark.operators.sampling",
    "hpmr_spark.operators.pipeline_queries",
    "hpmr_spark.operators.text_queries",
    "hpmr_spark.operators.dedup_queries",
    "hpmr_spark.operators.multimodal_queries",
    "hpmr_spark.operators.streaming_queries",
    "hpmr_spark.operators.skew_queries",
    "hpmr_spark.operators.sink_queries",
]

for _m in _MODULES:
    importlib.import_module(_m)
