"""Import every module that registers queries into hpmr_spark.catalog.

Importing this module fully populates QUERIES/ORACLES. Each import is
individually guarded so one broken extension module can never take down the
whole registry (the driver's correctness gate would otherwise lose every
query to a single ImportError).
"""

import importlib
import sys
import traceback

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
    "hpmr_spark.operators.relational7",
    "hpmr_spark.operators.relational8",
    "hpmr_spark.operators.relational9",
    "hpmr_spark.operators.arrow_pandas_queries",
    "hpmr_spark.operators.relational10",
    "hpmr_spark.operators.bucketing_queries",
    "hpmr_spark.operators.sampling",
    "hpmr_spark.operators.pipeline_queries",
    "hpmr_spark.operators.ml_features",
    "hpmr_spark.operators.text_queries",
    "hpmr_spark.operators.dedup_queries",
    "hpmr_spark.operators.multimodal_queries",
    "hpmr_spark.operators.streaming_queries",
    "hpmr_spark.operators.skew_queries",
    "hpmr_spark.operators.sink_queries",
]

FAILED_MODULES: dict[str, str] = {}

for _m in _MODULES:
    try:
        importlib.import_module(_m)
    except Exception:  # pragma: no cover - defensive only
        FAILED_MODULES[_m] = traceback.format_exc()
        print(f"hpmr_spark: WARNING — query module {_m} failed to import", file=sys.stderr)
