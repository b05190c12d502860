"""Temporal + multimodal operator unit tests (edges not covered by the
oracle gate)."""

import datetime as dt

from pyspark.sql import functions as F

from hpmr_spark.multimodal.binary_columns import documents_as_binary, sample_frames
from hpmr_spark.operators.temporal import asof_join, sessionize


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def test_asof_join_basic_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(12)), (2, _ts(9))], ["user_id", "ts"]
    )
    right = spark.createDataFrame(
        [(1, _ts(9, 30), 100), (1, _ts(11), 200), (2, _ts(9), 300)],
        ["user_id", "ts", "v"],
    )
    out = {
        (r["user_id"], r["ts"]): (r["v"], r["asof_ts"])
        for r in asof_join(left, right, "user_id", "ts", ["v"]).collect()
    }
    assert out[(1, _ts(10))] == (100, _ts(9, 30))
    assert out[(1, _ts(12))] == (200, _ts(11))
    # inclusive: equal timestamps match
    assert out[(2, _ts(9))] == (300, _ts(9))

    tol = {
        (r["user_id"], r["ts"]): r["v"]
        for r in asof_join(
            left, right, "user_id", "ts", ["v"], tolerance_seconds=1800
        ).collect()
    }
    assert tol[(1, _ts(10))] == 100  # 30 min ago — within tolerance
    assert tol[(1, _ts(12))] is None  # 60 min ago — stale


def test_asof_join_no_prior_row_is_null(spark):
    left = spark.createDataFrame([(1, _ts(8))], ["user_id", "ts"])
    right = spark.createDataFrame([(1, _ts(9), 5)], ["user_id", "ts", "v"])
    row = asof_join(left, right, "user_id", "ts", ["v"]).first()
    assert row["v"] is None and row["asof_ts"] is None


def test_asof_join_null_in_matched_row_carries(spark):
    """A legit NULL value in the MATCHED (most recent) right row must be
    attached as NULL — not skipped in favor of an older non-NULL row — and
    multiple value columns must all come from that same matched row
    (DuckDB ASOF JOIN semantics)."""
    left = spark.createDataFrame([(1, _ts(12))], ["user_id", "ts"])
    right = spark.createDataFrame(
        [(1, _ts(9), 100, 7), (1, _ts(11), None, None)],
        "user_id long, ts timestamp, v long, w long",
    )
    row = asof_join(left, right, "user_id", "ts", ["v", "w"]).first()
    assert row["asof_ts"] == _ts(11)
    assert row["v"] is None and row["w"] is None


def test_sessionize_gap_boundaries(spark):
    rows = [
        (1, 7, _ts(10, 0)),
        (2, 7, _ts(10, 29)),   # 29 min gap → same session
        (3, 7, _ts(11, 0)),    # 31 min gap → new session
        (4, 8, _ts(10, 0)),    # other user → own session
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = {r["event_id"]: r["session_seq"] for r in sessionize(df, "user_id", "ts", 1800).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_frame_sampling_covers_payload(spark, sf_dir):
    from hpmr_spark.sources.tables import load_table

    b = documents_as_binary(load_table(spark, sf_dir, "documents"))
    frames = sample_frames(b, stride=1024)
    chk = (
        frames.groupBy("doc_id")
        .agg(
            F.sum("frame_len").alias("covered"),
            F.min("frame_offset").alias("lo"),
        )
        .join(
            b.select("doc_id", F.col("meta.byte_len").alias("byte_len")), "doc_id"
        )
    )
    # frames tile the payload exactly: offsets start at 0, lengths sum to size
    bad = chk.where((F.col("lo") != 0) | (F.col("covered") != F.col("byte_len")))
    assert bad.count() == 0
