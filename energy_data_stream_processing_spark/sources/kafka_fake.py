"""File-backed test double for the ``format("kafka")`` connector contract.

The sandbox has neither a Kafka broker nor the spark-sql-kafka connector
jar, so the engine's Kafka edges (sources/kafka.py — reference S2/S4,
producer/producer.py:69-92, consumer/consumer.py:485-518) could previously
only be exercised as plan construction. This module is a Spark-4 Python
DataSource (short name ``kafkafake`` — Spark reserves "kafka" in its
builtin registry even when the connector jar is absent), and the kafka.py
functions take a ``fmt`` override, so ``write_kafka_batch`` /
``to_kafka_sink`` / ``kafka_stream_source`` execute end-to-end against it
with their full option surface:

- ``kafka.bootstrap.servers`` is interpreted as the broker's storage root
  directory (the fake's "cluster address");
- ``topic`` / ``subscribe`` name a subdirectory of records;
- batch write appends one JSONL file per task (Kafka's per-partition append);
- the stream reader exposes the Kafka source schema (key/value BINARY,
  topic, partition, offset, timestamp, timestampType) with offsets =
  record index, honoring ``startingOffsets=earliest`` and
  ``maxOffsetsPerTrigger`` batch pacing;
- record order is the sorted-file order: stable for the write-then-read
  phases a contract test runs (a real broker only guarantees per-partition
  arrival order anyway). This is a TEST DOUBLE, not a broker — no
  concurrent-producer interleaving semantics.

Registered only from tests (tests/test_kafka_optional.py); production code
paths never import this module.
"""

from __future__ import annotations

import base64
import json
import os
import uuid
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

KAFKA_SOURCE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp, timestampType int"
)


def _topic_dir(options) -> str:
    root = options.get("kafka.bootstrap.servers")
    if not root:
        raise ValueError("kafka.bootstrap.servers option is required")
    topic = options.get("topic") or options.get("subscribe")
    if not topic:
        raise ValueError("topic/subscribe option is required")
    return os.path.join(root, topic)


def _encode_cell(v) -> str | None:
    """Serialize a key/value cell (str | bytes | None) to a JSON-safe
    base64 string — Kafka carries opaque bytes either way."""
    if v is None:
        return None
    if isinstance(v, str):
        v = v.encode("utf-8")
    return base64.b64encode(bytes(v)).decode("ascii")


def _read_records(topic_dir: str) -> list[tuple]:
    """All records in stable (sorted-file, in-file) order with assigned
    offsets, shaped as the Kafka source schema."""
    if not os.path.isdir(topic_dir):
        return []
    topic = os.path.basename(topic_dir)
    rows = []
    offset = 0
    for name in sorted(os.listdir(topic_dir)):
        with open(os.path.join(topic_dir, name)) as f:
            for line in f:
                rec = json.loads(line)
                key = rec.get("key")
                val = rec.get("value")
                rows.append(
                    (
                        base64.b64decode(key) if key is not None else None,
                        base64.b64decode(val) if val is not None else None,
                        topic,
                        0,
                        offset,
                        None,
                        0,
                    )
                )
                offset += 1
    return rows


class _FakeCommit(WriterCommitMessage):
    pass


class _FakeKafkaWriter(DataSourceWriter):
    """Batch writer: one JSONL file per task, like a partition append."""

    def __init__(self, options):
        self.topic_dir = _topic_dir(options)

    def write(self, rows: Iterator) -> WriterCommitMessage:
        os.makedirs(self.topic_dir, exist_ok=True)
        path = os.path.join(self.topic_dir, f"batch-{uuid.uuid4().hex}.jsonl")
        with open(path, "w") as f:
            for row in rows:
                d = row.asDict() if hasattr(row, "asDict") else dict(row)
                f.write(
                    json.dumps(
                        {
                            "key": _encode_cell(d.get("key")),
                            "value": _encode_cell(d.get("value")),
                        }
                    )
                    + "\n"
                )
        return _FakeCommit()

    def commit(self, messages):  # files are already durable
        pass

    def abort(self, messages):
        pass


class _FakeKafkaStreamWriter(DataSourceStreamWriter):
    """Streaming writer (to_kafka_sink): per-micro-batch file appends."""

    def __init__(self, options):
        self.topic_dir = _topic_dir(options)

    def write(self, rows: Iterator) -> WriterCommitMessage:
        return _FakeKafkaWriter.write(self, rows)

    def commit(self, messages, batchId=None):
        pass

    def abort(self, messages, batchId=None):
        pass


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _FakeKafkaBatchReader(DataSourceReader):
    def __init__(self, options):
        self.topic_dir = _topic_dir(options)

    def partitions(self) -> Sequence[InputPartition]:
        return [_Range(0, len(_read_records(self.topic_dir)))]

    def read(self, part: _Range) -> Iterator[tuple]:
        recs = _read_records(self.topic_dir)
        for i in range(part.start, min(part.end, len(recs))):
            yield recs[i]


class _FakeKafkaStreamReader(DataSourceStreamReader):
    """Offsets are record indexes; startingOffsets=earliest -> 0;
    maxOffsetsPerTrigger caps each micro-batch like the connector's
    backpressure bound."""

    def __init__(self, options):
        self.topic_dir = _topic_dir(options)
        if options.get("startingOffsets", "earliest") != "earliest":
            raise ValueError("the fake broker supports startingOffsets=earliest only")
        mopt = options.get("maxOffsetsPerTrigger")
        self.max_per_trigger = int(mopt) if mopt else None
        # Durable committed-offset floor — same two-restart hazard and same
        # sidecar mechanism as the jsonl replay source (replay_source.py::
        # _load_watermark): a paced reader's in-memory cursor regresses on
        # restart, and only a persisted committed end keeps latestOffset
        # from ever reporting (and Spark from ever logging) a regressed one.
        from .replay_source import _load_watermark

        cid = options.get("commit_id")
        self._namespaced = cid is not None
        self.sidecar = os.path.join(
            os.path.dirname(self.topic_dir),
            os.path.basename(self.topic_dir)
            + ".kafka_commit"
            + (f".{cid}" if cid else ""),
        )
        self._floor = _load_watermark(self.sidecar, "offset")

    def initialOffset(self) -> dict:
        # fresh query (no offset log) = new delivery lineage: drop any
        # inherited floor — see replay_source initialOffset for rationale
        # (including the un-namespaced shared-sidecar reset warning)
        from .replay_source import _clear_watermark, _warn_unnamespaced_reset

        _warn_unnamespaced_reset(self.sidecar, "offset", self._namespaced)
        self._floor = 0
        _clear_watermark(self.sidecar)
        return {"offset": 0}

    def latestOffset(self) -> dict:
        total = len(_read_records(self.topic_dir))
        cur = max(getattr(self, "_last", 0), getattr(self, "_hw", 0), self._floor)
        if self.max_per_trigger is not None:
            total = min(total, cur + self.max_per_trigger)
        self._last = max(cur, total)
        return {"offset": self._last}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        s, e = int(start["offset"]), int(end["offset"])
        # same restart-safe high-watermark clip as the jsonl replay source:
        # `start` is committed, never re-emit below it
        hw = max(getattr(self, "_hw", 0), s)
        eff_start, eff_end = hw, max(e, hw)
        self._hw = eff_end
        self._last = max(getattr(self, "_last", 0), e, eff_end)
        return [_Range(eff_start, eff_end)]

    def read(self, part: _Range) -> Iterator[tuple]:
        recs = _read_records(self.topic_dir)
        for i in range(part.start, min(part.end, len(recs))):
            yield recs[i]

    def commit(self, end: dict) -> None:
        from .replay_source import _store_watermark

        committed = int(end["offset"])
        self._floor = max(self._floor, committed)
        _store_watermark(self.sidecar, "offset", committed)


class FileKafkaDataSource(DataSource):
    """``spark.dataSource.register(FileKafkaDataSource)`` +
    ``format("kafkafake")`` (or the kafka.py functions' ``fmt`` override)
    resolve to this file-backed double."""

    @classmethod
    def name(cls) -> str:
        return "kafkafake"

    def schema(self) -> str | StructType:
        return KAFKA_SOURCE_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _FakeKafkaBatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _FakeKafkaStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _FakeKafkaWriter(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool) -> DataSourceStreamWriter:
        return _FakeKafkaStreamWriter(self.options)
