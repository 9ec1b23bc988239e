"""Model-based law for the fake-broker stream reader's offset protocol.

Two review passes in round 7 found real bugs in exactly this module
(non-durable data-loss rebase, stale-start re-poisoning, pattern-topic
deletion bypass), all in corner INTERLEAVINGS of produce / trigger /
crash / restart. Case tests pin each found bug; this file pins the LAW
the cases are instances of, over arbitrary operation sequences:

  Simulating Spark's micro-batch driver (offset WAL + batch replay on
  restart) against `_FakeKafkaStreamReader`, WITHOUT any truncation:

  1. logged batch ends are monotone non-decreasing;
  2. every planned batch [start, end) delivers exactly the record ids
     start..end — including when it is REPLAYED by a fresh reader after a
     crash (same ids, the WAL-replay at-least-once contract);
  3. after draining, the committed batches tile the produced id space
     exactly once — no loss, no overlap, any number of restarts.

  With a truncation (failOnDataLoss=false): ids produced AFTER the
  detection/rebase are still delivered exactly once (recovery law), and
  with failOnDataLoss=true detection raises.

Pure Python — no SparkSession; runs in milliseconds per example.
"""

from __future__ import annotations

import base64
import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from energy_data_stream_processing_spark.sources.kafka_fake import (
    _FakeKafkaStreamReader,
)


class _Harness:
    """Spark-micro-batch-driver twin: offset WAL, replay-on-restart."""

    def __init__(self, root: str, fail_on_data_loss: bool = False, per_trigger=3):
        self.root = root
        self.topic_dir = os.path.join(root, "ev")
        os.makedirs(self.topic_dir, exist_ok=True)
        self.opts = {
            "kafka.bootstrap.servers": root,
            "subscribe": "ev",
            "maxOffsetsPerTrigger": str(per_trigger),
            "failOnDataLoss": "true" if fail_on_data_loss else "false",
        }
        self.produced = 0
        self.batch_no = 0
        self.log: list[int] = [0]  # WAL of batch END offsets; log[0]=initial
        self.committed_idx = 0  # index into log of last committed entry
        self.deliveries: list[tuple[int, list[int]]] = []  # (log_idx, ids)
        self.reader = _FakeKafkaStreamReader(self.opts)
        self.reader.initialOffset()  # fresh query, empty WAL

    # --- broker-side ------------------------------------------------------
    def produce(self, k: int) -> None:
        path = os.path.join(self.topic_dir, f"b{self.batch_no:06d}.jsonl")
        self.batch_no += 1
        with open(path, "a") as f:
            for _ in range(k):
                val = base64.b64encode(str(self.produced).encode()).decode()
                f.write(json.dumps({"key": None, "value": val}) + "\n")
                self.produced += 1

    # --- driver-side ------------------------------------------------------
    def _run_batch(self, log_idx: int) -> list[int]:
        start = {"topics": {"ev": self.log[log_idx - 1]}}
        end = {"topics": {"ev": self.log[log_idx]}}
        parts = self.reader.partitions(start, end)
        ids = [
            int(bytes(r[1]).decode())
            for p in parts
            for r in self.reader.read(p)
        ]
        self.deliveries.append((log_idx, ids))
        self.reader.commit(end)
        self.committed_idx = log_idx
        return ids

    def trigger(self) -> None:
        # replay any WAL'd-but-uncommitted batches first (restart path)
        for i in range(self.committed_idx + 1, len(self.log)):
            self._run_batch(i)
        end = int(self.reader.latestOffset()["topics"]["ev"])
        if end != self.log[-1]:
            self.log.append(end)  # WAL write happens BEFORE the batch runs
            self._run_batch(len(self.log) - 1)

    def crash_after_wal(self) -> None:
        """Plan a batch (WAL the end), read it, but crash before commit;
        then restart with a fresh reader (cursors reset)."""
        end = int(self.reader.latestOffset()["topics"]["ev"])
        if end != self.log[-1]:
            self.log.append(end)
            start = {"topics": {"ev": self.log[-2]}}
            parts = self.reader.partitions(start, {"topics": {"ev": end}})
            ids = [
                int(bytes(r[1]).decode())
                for p in parts
                for r in self.reader.read(p)
            ]
            self.deliveries.append((len(self.log) - 1, ids))
            # NO commit — the crash window
        self.reader = _FakeKafkaStreamReader(self.opts)

    def restart(self) -> None:
        self.reader = _FakeKafkaStreamReader(self.opts)

    def drain(self) -> None:
        # no-progress break (NOT a produced-count compare: truncation
        # renumbers offsets, so log[-1] and produced are incomparable)
        for _ in range(64):
            before = (self.committed_idx, self.log[-1])
            self.trigger()
            if (self.committed_idx, self.log[-1]) == before:
                break


OP = st.sampled_from(
    ["p1", "p3", "p5", "trigger", "trigger", "crash", "restart"]
)


@settings(max_examples=120, deadline=None)
@given(ops=st.lists(OP, min_size=1, max_size=14))
def test_exactly_once_tiling_under_arbitrary_interleavings(ops, tmp_path_factory):
    h = _Harness(str(tmp_path_factory.mktemp("broker")))
    for op in ops:
        if op.startswith("p"):
            h.produce(int(op[1]))
        elif op == "trigger":
            h.trigger()
        elif op == "crash":
            h.crash_after_wal()
        else:
            h.restart()
    h.drain()

    # law 1: WAL ends monotone
    assert h.log == sorted(h.log), h.log
    # law 2: every delivery (incl. replays) carries exactly its WAL range
    per_batch: dict[int, list[list[int]]] = {}
    for idx, ids in h.deliveries:
        want = list(range(h.log[idx - 1], h.log[idx]))
        assert ids == want, f"batch {idx}: delivered {ids}, WAL range {want}"
        per_batch.setdefault(idx, []).append(ids)
    # replays of one batch are identical (at-least-once with same content)
    for idx, runs in per_batch.items():
        assert all(r == runs[0] for r in runs), f"batch {idx} replay diverged"
    # law 3: committed batches tile the produced space exactly once
    covered = [
        i
        for idx in range(1, h.committed_idx + 1)
        for i in range(h.log[idx - 1], h.log[idx])
    ]
    assert covered == list(range(h.produced)), (
        f"tiling broken: covered {covered[:20]}..., produced {h.produced}"
    )


@settings(max_examples=40, deadline=None)
@given(
    pre=st.integers(min_value=1, max_value=8),
    post=st.integers(min_value=1, max_value=8),
    crash_between=st.booleans(),
)
def test_post_loss_appends_delivered_exactly_once(
    pre, post, crash_between, tmp_path_factory
):
    """Recovery law (failOnDataLoss=false): after truncation + detection,
    every id appended post-loss is delivered exactly once, regardless of a
    crash-restart straddling the detection."""
    import shutil

    h = _Harness(str(tmp_path_factory.mktemp("broker")))
    h.produce(pre)
    h.drain()
    # broker truncates the whole topic
    shutil.rmtree(h.topic_dir)
    os.makedirs(h.topic_dir)
    h.restart()
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        h.trigger()  # detection + rebase (warns once)
        if crash_between:
            h.crash_after_wal()
        base = h.produced
        h.produce(post)
        h.drain()
    # ids are re-numbered from 0 post-truncation; the post-loss batch is
    # encoded as values base..base+post-1 at INDEXES 0..post-1 — assert by
    # decoded content: each post-loss value delivered exactly once
    post_values = [i for _, ids in h.deliveries for i in ids if i >= base]
    assert sorted(post_values) == list(range(base, base + post)), (
        f"post-loss delivery broken: {sorted(post_values)}"
    )


def test_truncation_with_fail_on_data_loss_true_raises(tmp_path):
    import shutil

    import pytest

    h = _Harness(str(tmp_path / "broker"), fail_on_data_loss=True)
    h.produce(4)
    h.drain()
    shutil.rmtree(h.topic_dir)
    os.makedirs(h.topic_dir)
    h.restart()
    with pytest.raises(RuntimeError, match="data loss detected"):
        h.trigger()


# ---------------------------------------------------------------------------
# The SAME law for the jsonl replay source: separate code path (line-offset
# protocol, paced batches, its own partitions/latestOffset), same offset-WAL
# contract. The harness adapts over the offset-dict shape.
# ---------------------------------------------------------------------------
class _ReplayHarness:
    """Driver twin for `_ReplayStreamReader` (offsets {'line': n}); records
    are jsonl events whose payload carries the global id. The file only
    GROWS (the replay source models a fixed file read line-by-line, so
    'produce' = append lines)."""

    def __init__(self, root: str, per_batch: int = 3):
        from energy_data_stream_processing_spark.sources.replay_source import (
            _ReplayStreamReader,
        )

        self._cls = _ReplayStreamReader
        self.path = os.path.join(root, "events.jsonl")
        open(self.path, "w").close()
        self.opts = {"path": self.path, "lines_per_batch": str(per_batch)}
        self.produced = 0
        self.log: list[int] = [0]
        self.committed_idx = 0
        self.deliveries: list[tuple[int, list[int]]] = []
        self.reader = self._cls(self.opts)
        self.reader.initialOffset()

    def produce(self, k: int) -> None:
        with open(self.path, "a") as f:
            for _ in range(k):
                f.write(
                    json.dumps(
                        {
                            "event_type": "t",
                            "event_time": "2024-01-01",
                            "payload": {"id": self.produced},
                        }
                    )
                    + "\n"
                )
                self.produced += 1

    def _ids(self, parts) -> list[int]:
        out = []
        for p in parts:
            for row in self.reader.read(p):
                # row: (line_no, valid, reason, event_type, event_time,
                #       payload_json, raw)
                out.append(json.loads(row[5])["id"])
        return out

    def _run_batch(self, log_idx: int) -> None:
        parts = self.reader.partitions(
            {"line": self.log[log_idx - 1]}, {"line": self.log[log_idx]}
        )
        self.deliveries.append((log_idx, self._ids(parts)))
        self.reader.commit({"line": self.log[log_idx]})
        self.committed_idx = log_idx

    def trigger(self) -> None:
        for i in range(self.committed_idx + 1, len(self.log)):
            self._run_batch(i)
        end = int(self.reader.latestOffset()["line"])
        if end != self.log[-1]:
            self.log.append(end)
            self._run_batch(len(self.log) - 1)

    def crash_after_wal(self) -> None:
        end = int(self.reader.latestOffset()["line"])
        if end != self.log[-1]:
            self.log.append(end)
            parts = self.reader.partitions(
                {"line": self.log[-2]}, {"line": end}
            )
            self.deliveries.append((len(self.log) - 1, self._ids(parts)))
        self.reader = self._cls(self.opts)

    def restart(self) -> None:
        self.reader = self._cls(self.opts)

    def drain(self) -> None:
        # the replay source reads a FIXED file (total cached at reader
        # construction); growth becomes visible on restart — the source's
        # documented append-then-restart pattern — so drain restarts first
        self.restart()
        for _ in range(64):
            before = (self.committed_idx, self.log[-1])
            self.trigger()
            if (self.committed_idx, self.log[-1]) == before:
                break


@settings(max_examples=120, deadline=None)
@given(ops=st.lists(OP, min_size=1, max_size=14))
def test_replay_source_exactly_once_tiling(ops, tmp_path_factory):
    """Identical law over the jsonl replay source's line-offset protocol."""
    h = _ReplayHarness(str(tmp_path_factory.mktemp("replay")))
    for op in ops:
        if op.startswith("p"):
            h.produce(int(op[1]))
        elif op == "trigger":
            h.trigger()
        elif op == "crash":
            h.crash_after_wal()
        else:
            h.restart()
    h.drain()

    assert h.log == sorted(h.log), h.log
    per_batch: dict[int, list[list[int]]] = {}
    for idx, ids in h.deliveries:
        want = list(range(h.log[idx - 1], h.log[idx]))
        assert ids == want, f"batch {idx}: delivered {ids}, WAL range {want}"
        per_batch.setdefault(idx, []).append(ids)
    for idx, runs in per_batch.items():
        assert all(r == runs[0] for r in runs), f"batch {idx} replay diverged"
    covered = [
        i
        for idx in range(1, h.committed_idx + 1)
        for i in range(h.log[idx - 1], h.log[idx])
    ]
    assert covered == list(range(h.produced))
