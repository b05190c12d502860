"""Incremental dedup — the epoch pattern for continuously-growing corpora.

A nightly 100 TB pipeline never re-dedups from scratch: it holds a
fingerprint state table and, per batch, (a) drops new docs colliding with
state, (b) drops intra-batch dups, (c) appends survivors' fingerprints.
This is exactly the reference's async_set→sync epoch with keep semantics
(first write wins, /root/reference/src/dist_map.h:118-130 + reducer `keep`)
applied to content fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hpmr_spark.functions.text import fingerprint


def incremental_dedup(
    state_fps: DataFrame | None, batch: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Returns (accepted_docs, new_state_fps).

    accepted = batch docs whose fingerprint is neither in state nor claimed
    by an earlier (lower doc_id) batch doc; new_state = state ∪ accepted fps.
    """
    fp = batch.select("doc_id", fingerprint(F.col("text")).alias("fp"))
    if state_fps is not None:
        fp = fp.join(state_fps.hint("merge"), "fp", "left_anti")
    winners = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    accepted = batch.join(winners.select("doc_id").hint("merge"), "doc_id", "left_semi")
    new_fps = winners.select("fp")
    if state_fps is not None:
        new_fps = state_fps.unionByName(new_fps)
    return accepted, new_fps
