"""Kafka round-trip smoke (reference S2/S4: producer/producer.py:69-75,
consumer/consumer.py:485-518).

This sandbox has neither a broker nor the spark-sql-kafka connector jar, so
the round-trip skips cleanly here and runs wherever both exist:

    KAFKA_BOOTSTRAP_SERVERS=localhost:9092 \
    PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> pyspark-shell" \
    python -m pytest tests/test_kafka_optional.py

The connector-free halves (value parse, dead-letter normalization) are
always-on tests in tests/test_sinks_and_observe.py.
"""

from __future__ import annotations

import os
import socket
import uuid

import pytest

from pyspark.sql import functions as F


def _broker() -> str | None:
    addr = os.environ.get("KAFKA_BOOTSTRAP_SERVERS", "localhost:9092")
    host, _, port = addr.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=1):
            return addr
    except OSError:
        return None


def _connector_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def test_kafka_roundtrip(spark, sf_dir, tmp_path):
    """events -> topic (write_kafka_batch) -> kafka_stream_source ->
    parsed frame must equal the batch adapter's parse of the same rows."""
    broker = _broker()
    if broker is None:
        pytest.skip("no Kafka broker reachable (set KAFKA_BOOTSTRAP_SERVERS)")
    if not _connector_available(spark):
        pytest.skip("spark-sql-kafka connector jar not on the classpath")

    from energy_data_stream_processing_spark.sources.kafka import (
        kafka_stream_source,
        parse_kafka_values,
        write_kafka_batch,
    )
    from energy_data_stream_processing_spark.streaming.runner import run_stream_to_table

    topic = f"events-smoke-{uuid.uuid4().hex[:8]}"
    envelopes = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .limit(200)
        .selectExpr(
            "event_type",
            "cast(ts AS STRING) AS event_time",
            "named_struct('customer_id', cast(user_id AS STRING), "
            "'session_id', cast(event_id AS STRING), 'channel', 'web_portal') AS payload",
        )
    )
    write_kafka_batch(envelopes, broker, topic)

    stream = kafka_stream_source(spark, broker, topic)
    out = run_stream_to_table(spark, stream, mode="append")

    expected = parse_kafka_values(
        envelopes.selectExpr("cast(to_json(struct(*)) AS BINARY) AS value")
    )
    a = sorted(map(tuple, out.select("event_type", "event_time").collect()))
    b = sorted(map(tuple, expected.select("event_type", "event_time").collect()))
    assert a == b
    assert out.where(F.col("_corrupt").isNotNull()).count() == 0
