"""Gated-activation tests for connectors this container cannot ship
(VERDICT r10 item 8): the Kafka source jar (spark-sql-kafka) and the
Delta Lake catalog are absent here (CLAUDE.md "Known gaps"), so a real
end-to-end test is impossible — but if the driver container ever gains
either, these tests light up green WITHOUT a code round, the same
pattern as the Pillow-gated decode test (tests/test_multimodal_decode.py).

Probe discipline: availability is detected by attempting the cheapest
operation that exercises the connector's registration (building an
UNSTARTED Kafka streaming DataFrame — Kafka's `load()` validates options
and resolves the fixed source schema without contacting any broker;
importing the `delta` Python package). On the expected
connector-missing error the test SKIPS with the activation condition in
the reason; any OTHER error is a real failure and surfaces.
"""

from __future__ import annotations

import pytest

# the fixed Kafka source schema (Spark docs: Structured Streaming + Kafka
# Integration Guide) — what a successful activation must resolve to
_KAFKA_COLS = {
    "key",
    "value",
    "topic",
    "partition",
    "offset",
    "timestamp",
    "timestampType",
}


def test_kafka_source_gated_activation(spark):
    """Builds (never starts) a Kafka readStream. Without the
    spark-sql-kafka jar Spark raises its missing-data-source error →
    skip; with the jar present the unstarted stream must carry the fixed
    7-column Kafka schema — a meaningful activation check that still
    needs no broker."""
    try:
        df = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", "localhost:9092")
            .option("subscribe", "hpmr-activation-probe")
            .load()
        )
    except Exception as exc:  # noqa: BLE001 — classify, then re-raise
        msg = str(exc)
        if "kafka" in msg.lower() and (
            "Failed to find" in msg
            or "FAILED_TO_FIND_DATA_SOURCE" in msg
            or "DATA_SOURCE_NOT_FOUND" in msg
        ):
            pytest.skip(
                "spark-sql-kafka jar not in container; test activates "
                "when the driver image ships it"
            )
        raise
    assert set(df.schema.fieldNames()) == _KAFKA_COLS
    assert df.isStreaming


def test_delta_format_gated_activation(spark, tmp_path):
    """Delta Lake needs both the delta-spark package and its catalog
    extension. Probe the Python package first (cheap, no session
    mutation); with it present, a tiny write+read roundtrip must work."""
    try:
        import delta  # noqa: F401
    except ImportError:
        pytest.skip(
            "delta-spark not in container; test activates when the "
            "driver image ships it"
        )
    p = str(tmp_path / "delta_probe")
    spark.range(3).write.format("delta").save(p)
    assert spark.read.format("delta").load(p).count() == 3
