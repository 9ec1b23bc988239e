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
  per-topic record index, honoring ``startingOffsets`` (earliest|latest),
  ``maxOffsetsPerTrigger`` batch pacing, ``subscribePattern`` (regex topic
  subscription with dynamic discovery of topics created mid-query), and
  ``failOnDataLoss`` (fail vs warn-and-reset when committed records have
  been truncated away);
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


def _subscribed_topic_dirs(options) -> list[str]:
    """Resolve the subscription to topic directories, sorted by name.

    ``subscribePattern`` (regex, like the connector's) matches topic
    subdirectories of the broker root; re-resolved on every call so a topic
    created after the query starts is picked up at the next trigger —
    the connector's dynamic pattern-subscription behavior. ``subscribe`` /
    ``topic`` name exactly one topic (which need not exist yet)."""
    root = options.get("kafka.bootstrap.servers")
    if not root:
        raise ValueError("kafka.bootstrap.servers option is required")
    pattern = options.get("subscribePattern")
    single = options.get("topic") or options.get("subscribe")
    if pattern and single:
        raise ValueError("subscribe and subscribePattern are mutually exclusive")
    if pattern:
        import re

        rx = re.compile(pattern)
        if not os.path.isdir(root):
            return []
        return sorted(
            os.path.join(root, d)
            for d in os.listdir(root)
            if rx.fullmatch(d) and os.path.isdir(os.path.join(root, d))
        )
    if not single:
        raise ValueError("topic/subscribe/subscribePattern option is required")
    return [os.path.join(root, single)]


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
    def __init__(self, start: int, end: int, topic_dir: str | None = None):
        self.start = start
        self.end = end
        self.topic_dir = topic_dir


class _FakeKafkaBatchReader(DataSourceReader):
    def __init__(self, options):
        self.topic_dirs = _subscribed_topic_dirs(options)

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per subscribed topic (the connector's one-per-
        # topic-partition, collapsed to the double's single partition 0)
        return [
            _Range(0, len(_read_records(d)), topic_dir=d) for d in self.topic_dirs
        ]

    def read(self, part: _Range) -> Iterator[tuple]:
        recs = _read_records(part.topic_dir)
        for i in range(part.start, min(part.end, len(recs))):
            yield recs[i]


class _FakeKafkaStreamReader(DataSourceStreamReader):
    """Offsets are per-topic record indexes (the connector's per-topic-
    partition offset map, collapsed to the double's single partition 0);
    ``startingOffsets`` earliest->0 / latest->current end;
    ``maxOffsetsPerTrigger`` caps each micro-batch's TOTAL new records like
    the connector's backpressure bound (budget spent across topics in
    sorted-name order — the connector distributes proportionally; contract
    double divergence, documented); ``failOnDataLoss`` (default true) fails
    the query when committed records have vanished (topic truncated or
    deleted), or resets to the available end with a warning when false.

    Offset JSON shape: ``{"topics": {name: next_index}}``."""

    def __init__(self, options):
        self.options = options
        self.starting = options.get("startingOffsets", "earliest")
        if self.starting not in ("earliest", "latest"):
            raise ValueError(
                "the fake broker supports startingOffsets earliest|latest only"
            )
        mopt = options.get("maxOffsetsPerTrigger")
        self.max_per_trigger = int(mopt) if mopt else None
        self.fail_on_data_loss = (
            str(options.get("failOnDataLoss", "true")).lower() != "false"
        )
        # Durable committed-offset floor — same two-restart hazard and same
        # sidecar mechanism as the jsonl replay source (replay_source.py::
        # _load_watermark): a paced reader's in-memory cursor regresses on
        # restart, and only a persisted committed end keeps latestOffset
        # from ever reporting (and Spark from ever logging) a regressed one.
        # One sidecar PER TOPIC (pattern subscription discovers topics
        # dynamically; each keeps its own floor).
        cid = options.get("commit_id")
        self._namespaced = cid is not None
        self._cid = cid
        # per-topic in-memory state: pacing cursor, high watermark, floor,
        # and the renumbered base after a failOnDataLoss=false reset
        self._last: dict[str, int] = {}
        self._hw: dict[str, int] = {}
        self._floor: dict[str, int] = {}
        self._loss_reset: dict[str, int] = {}
        for d in _subscribed_topic_dirs(options):
            self._floor[_t(d)] = self._load_floor(d)
        # Pattern subscriptions: ALSO load floors recorded for topics whose
        # directory no longer exists — a topic deleted while the query was
        # stopped must restart into data-loss detection (the isdir filter
        # above would otherwise silently drop it along with its committed
        # floor, which is exactly the loss being detected). ONLY for
        # commit_id-namespaced sidecars: an un-namespaced sidecar may
        # belong to another lineage entirely, and adopting it would
        # permanently fail THIS query for a topic it never consumed.
        root = options.get("kafka.bootstrap.servers")
        for t in self._sidecar_topics():
            self._floor.setdefault(
                t, self._load_floor(os.path.join(root, t))
            )

    def _sidecar_topics(self) -> list[str]:
        """Topics with a committed-floor sidecar in the broker root that
        match a pattern subscription — discoverable even after the topic
        directory itself was deleted. Namespaced (commit_id) sidecars
        only: those are per-lineage by construction, so a discovered floor
        is provably THIS query's; deleted-while-stopped detection for
        un-namespaced pattern queries is a documented non-feature (shared
        sidecars carry the same cross-lineage hazard the reset warning
        covers)."""
        pattern = self.options.get("subscribePattern")
        root = self.options.get("kafka.bootstrap.servers")
        if not pattern or not self._namespaced or not root or not os.path.isdir(root):
            return []
        import re

        rx = re.compile(pattern)
        suffix = ".kafka_commit" + (f".{self._cid}" if self._cid else "")
        out = []
        for f in os.listdir(root):
            if f.endswith(suffix):
                topic = f[: -len(suffix)]
                if topic and rx.fullmatch(topic):
                    out.append(topic)
        return sorted(out)

    def _sidecar(self, topic_dir: str) -> str:
        return (
            topic_dir.rstrip("/")
            + ".kafka_commit"
            + (f".{self._cid}" if self._cid else "")
        )

    def _load_floor(self, topic_dir: str) -> int:
        from .replay_source import _load_watermark

        return _load_watermark(self._sidecar(topic_dir), "offset")

    def _topic_dirs(self) -> list[str]:
        return _subscribed_topic_dirs(self.options)

    def initialOffset(self) -> dict:
        # fresh query (no offset log) = new delivery lineage: drop any
        # inherited floor — see replay_source initialOffset for rationale
        # (including the un-namespaced shared-sidecar reset warning)
        from .replay_source import _clear_watermark, _warn_unnamespaced_reset

        offsets: dict[str, int] = {}
        root = self.options.get("kafka.bootstrap.servers")
        for d in self._topic_dirs():
            _warn_unnamespaced_reset(self._sidecar(d), "offset", self._namespaced)
            self._floor[_t(d)] = 0
            _clear_watermark(self._sidecar(d))
            offsets[_t(d)] = len(_read_records(d)) if self.starting == "latest" else 0
            self._last[_t(d)] = offsets[_t(d)]
            self._hw[_t(d)] = offsets[_t(d)]
        # fresh lineage also drops floors of VANISHED pattern topics — a
        # brand-new query must not data-loss-fail on a long-gone topic's
        # leftover sidecar from a previous lineage
        for t in list(self._floor):
            if t not in offsets:
                side = self._sidecar(os.path.join(root, t))
                _warn_unnamespaced_reset(side, "offset", self._namespaced)
                _clear_watermark(side)
                self._floor.pop(t, None)
                self._hw.pop(t, None)
                self._last.pop(t, None)
        return {"topics": offsets}

    def _check_data_loss(self, topic: str, cur: int, total: int) -> int:
        """Committed/emitted records beyond the currently-available end
        means the broker lost data (truncation/deletion).

        failOnDataLoss=false recovery: the double's offsets are record
        INDEXES, so truncation renumbers the log — committed positions are
        meaningless afterwards. The reset rebases EVERY cursor (in-memory
        floor/watermarks AND the durable sidecar) to the available end at
        detection time, so records appended after the reset are delivered
        and the warning does not re-fire every trigger; survivors below
        the reset point are treated as already-delivered (lost-range-skip
        semantics, same "may miss data" contract as the connector)."""
        if total >= cur:
            return cur
        if self.fail_on_data_loss:
            raise RuntimeError(
                f"data loss detected on topic {topic}: committed offset {cur} "
                f"> available {total}; set failOnDataLoss=false to recover by "
                "resetting to the available end"
            )
        import warnings

        warnings.warn(
            f"kafkafake: data loss on topic {topic} (committed {cur} > "
            f"available {total}); failOnDataLoss=false -> resetting",
            RuntimeWarning,
            stacklevel=2,
        )
        from .replay_source import _force_watermark

        self._floor[topic] = total
        self._hw[topic] = min(self._hw.get(topic, total), total)
        self._last[topic] = min(self._last.get(topic, total), total)
        # partitions() must be allowed below the (now-stale) offset-log
        # start for this topic — remember the rebased origin
        self._loss_reset[topic] = total
        # rebase the durable floor too — NON-monotone force write that
        # leaves a present file even at 0, so (a) a restarted reader loads
        # the rebased floor instead of re-detecting forever, and (b) a
        # WAL-replayed pre-rebase batch can recognize the rebase (see
        # partitions) by the present-and-low sidecar
        root = self.options.get("kafka.bootstrap.servers")
        _force_watermark(
            self._sidecar(os.path.join(root, topic)), "offset", total
        )
        return total

    def latestOffset(self) -> dict:
        budget = self.max_per_trigger
        offsets: dict[str, int] = {}
        seen: set[str] = set()
        for d in self._topic_dirs():
            t = _t(d)
            seen.add(t)
            total = len(_read_records(d))
            cur = max(
                self._last.get(t, 0), self._hw.get(t, 0), self._floor.get(t, 0)
            )
            cur = self._check_data_loss(t, cur, total)
            nxt = total
            if budget is not None:
                nxt = min(total, cur + budget)
                budget -= nxt - cur
            self._last[t] = max(cur, nxt)
            offsets[t] = self._last[t]
        # A previously-known topic whose directory vanished is data loss
        # too (whole-topic deletion): without this, a pattern subscription
        # would silently drop it because the isdir filter never yields it.
        for t in sorted(
            (set(self._floor) | set(self._hw) | set(self._last)) - seen
        ):
            cur = max(
                self._last.get(t, 0), self._hw.get(t, 0), self._floor.get(t, 0)
            )
            if cur > 0:
                offsets[t] = self._check_data_loss(t, cur, 0)
        return {"topics": offsets}

    def _offmap(self, offset: dict) -> dict:
        """Offset-log dict -> {topic: index}. Accepts the pre-round-7
        single-topic shape ({"offset": N}) so a query checkpointed by the
        old reader restarts without re-emitting its committed range."""
        if "topics" in offset:
            return offset["topics"]
        if "offset" in offset:
            single = self.options.get("topic") or self.options.get("subscribe")
            if single:
                return {single: offset["offset"]}
        return {}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        starts = self._offmap(start)
        ends = self._offmap(end)
        parts: list[_Range] = []
        root = self.options.get("kafka.bootstrap.servers")
        for t, e in ends.items():
            s = int(starts.get(t, 0))
            if t in self._loss_reset:
                # offset-log start predates a data-loss rebase: the clip
                # below must not resurrect the stale (renumbered-away) start
                s = min(s, self._loss_reset[t])
            elif int(e) < s and not self.fail_on_data_loss:
                # A WAL-replayed batch whose END is below its START can
                # only be the in-flight batch planned right after a
                # failOnDataLoss=false rebase (latestOffset is otherwise
                # monotone at-or-above every committed start). Confirm via
                # the rebased durable floor — PRESENT and EXACTLY equal to
                # e (the rebase force-writes the detection-time total, and
                # the WAL'd end of the post-rebase batch IS that total) —
                # and adopt it, instead of letting max(hw, s) resurrect the
                # stale pre-loss cursor (which would re-trigger detection
                # and permanently swallow post-loss appends). Anything
                # else — absent sidecar (lost floor) or a merely-low value
                # (failed/cleared writes, another lineage) — keeps the
                # clip, the exactly-once guard against re-delivery.
                from .replay_source import _load_watermark

                side = self._sidecar(os.path.join(root, t))
                if os.path.exists(side) and _load_watermark(side, "offset") == int(e):
                    self._loss_reset[t] = int(e)
                    s = int(e)
            # same restart-safe high-watermark clip as the jsonl replay
            # source: `start` is committed, never re-emit below it
            hw = max(self._hw.get(t, 0), s)
            eff_start, eff_end = hw, max(int(e), hw)
            self._hw[t] = eff_end
            self._last[t] = max(self._last.get(t, 0), int(e), eff_end)
            parts.append(_Range(eff_start, eff_end, topic_dir=os.path.join(root, t)))
        return parts

    def read(self, part: _Range) -> Iterator[tuple]:
        recs = _read_records(part.topic_dir)
        for i in range(part.start, min(part.end, len(recs))):
            yield recs[i]

    def commit(self, end: dict) -> None:
        from .replay_source import _store_watermark

        root = self.options.get("kafka.bootstrap.servers")
        for t, committed in self._offmap(end).items():
            committed = int(committed)
            self._floor[t] = max(self._floor.get(t, 0), committed)
            _store_watermark(
                self._sidecar(os.path.join(root, t)), "offset", committed
            )


def _t(topic_dir: str) -> str:
    return os.path.basename(topic_dir.rstrip("/"))


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
