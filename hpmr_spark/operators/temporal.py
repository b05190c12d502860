"""Temporal operators Spark lacks natively, composed from built-in DataFrame
ops (SURVEY.md §2.3 'custom operators' disposition: composition first, UDFs
only if semantics demand — here they don't).

as-of join: for each left row, the most recent right row at-or-before its
timestamp, per key. Implemented as union + window carry-forward — ONE shuffle
on (key), no range-explode, no n² join; this is the scale-correct pattern
(a join+filter+row_number implementation shuffles the cross product).

sessionization: gap-based session ids per key via lag + cumulative sum —
two window passes over one (key, ts) sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_value_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: attach the latest right-side values with
    right.ts ≤ left.ts per key (inclusive, DuckDB ASOF JOIN semantics).

    Right side should be unique per (key, ts) — pre-aggregate if not.
    Rows with no prior right row keep NULLs (left join semantics)."""
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        key_col,
        ts_col,
        *right_value_cols,
    ).withColumn("_side", F.lit(0))
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at equal ts → inclusive semantics
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry ONE struct of the whole matched right row (populated only on
    # right-side rows) instead of per-column last(ignorenulls): a legit NULL
    # value in the matched row must be attached as NULL, not skipped in favor
    # of an older non-NULL one, and all values + asof_ts must come from the
    # SAME right row — DuckDB ASOF JOIN semantics
    carried = unioned.withColumn(
        "_r",
        F.last(
            F.when(
                F.col("_side") == 0,
                F.struct(
                    F.col(ts_col).alias("_asof_ts"),
                    *[F.col(c) for c in right_value_cols],
                ),
            ),
            True,
        ).over(w),
    )
    out = carried.where(F.col("_side") == 1).drop("_side")
    for c in right_value_cols:
        out = out.withColumn(c, F.col("_r")[c])
    out = out.withColumn("_right_ts", F.col("_r._asof_ts")).drop("_r")
    if tolerance_seconds is not None:
        stale = (
            F.col(ts_col).cast("long") - F.col("_right_ts").cast("long")
        ) > tolerance_seconds
        for c in right_value_cols:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
        out = out.withColumn("_right_ts", F.when(stale, F.lit(None)).otherwise(F.col("_right_ts")))
    return out.withColumnRenamed("_right_ts", "asof_ts")


def sessionize(
    df: DataFrame, key_col: str, ts_col: str, gap_seconds: int = 1800
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    previous event of the same key exceeds gap_seconds. Adds
    `session_seq` (1-based per key) — deterministic given unique (key, ts,
    tie-break) ordering."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    prev_ts = F.lag(ts_col).over(w)
    # microsecond-exact gap compare (cast-to-seconds would truncate and
    # disagree with the oracle on sub-second boundaries)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
    new_session = (prev_ts.isNull() | (gap_us > gap_seconds * 1_000_000)).cast("long")
    return df.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
