"""Watermark/late-data semantics: append-mode windowed aggregation.

In append mode a window only emits once the watermark (max observed event
time − delay) passes its end — late events beyond the delay are dropped from
finalized windows. With Trigger.AvailableNow over a static corpus the final
watermark is max(ts) − delay, so the emitted window set is deterministic and
batch-expressible: exactly the windows with window_end ≤ max(ts) − delay.
The trailing windows stay open (unemitted) — that withheld tail is the
observable difference from complete mode, and the oracle reproduces it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hpmr_spark.streaming.windows import _events_stream, _run_to_table

DELAY = "1 hour"


def append_mode_closed_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir).withWatermark("ts", DELAY)
    agg = ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    out = _run_to_table(agg, "append_closed", "append")
    return out.select(
        F.col("w.start").alias("window_start"), "event_type", "n_events"
    )
