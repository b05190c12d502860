"""Literal in-memory tables as LocalRelations (r12, guide §4).

`spark.createDataFrame(<python rows>)` builds a PythonRDD-backed plan: the
local rows are pickled into a ParallelCollectionRDD with defaultParallelism
slices and EVERY slice launches/feeds a Python worker — measured 32 tasks ×
~1.9 s cold (worker launch + imports) for a 27-row grid inside
unigram_viterbi's broadcast build, ~60 s of task-time for zero data. A SQL
`VALUES` table is a Catalyst LocalRelation instead: no RDD, no job, no
Python boundary; broadcasts over it build driver-side and constant folding
can see the values.

Use for PLAN-TIME-CONSTANT literal tables in query paths (grids, tau lists,
seed rows, driver-computed result rows). Values must be Python ints,
floats, bools, strings, or None.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        # repr round-trips doubles exactly through the Spark parser (r6)
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    raise TypeError(f"unsupported literal type {type(v).__name__}")


def values_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """LocalRelation drop-in for `spark.createDataFrame(rows, schema)` with
    a simple `name type, name type, ...` DDL schema and scalar rows
    (tuples/lists, or bare scalars for a 1-column table)."""
    cols = []
    for field in schema.split(","):
        name, _, typ = field.strip().partition(" ")
        cols.append((name, typ.strip()))
    vals = []
    for row in rows:
        if not isinstance(row, (tuple, list)):
            row = (row,)
        vals.append("(" + ", ".join(_sql_lit(v) for v in row) + ")")
    inner = ", ".join(f"_c{i}" for i in range(len(cols)))
    outer = ", ".join(
        f"CAST(_c{i} AS {typ}) AS {name}" for i, (name, typ) in enumerate(cols)
    )
    return spark.sql(
        f"SELECT {outer} FROM (VALUES {', '.join(vals)} AS _lit({inner}))"
    )
