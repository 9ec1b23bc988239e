"""Round-5 hardening: SCD2 replay idempotence (at-least-once delivery),
replay-source restart without duplicate emission, candidate-verification
broadcast-size guard, IVF hash-mod training-sample determinism."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from energy_data_stream_processing_spark.sources.sinks import _conf_override

_N_LINES = 9


@pytest.fixture()
def replay_fixture(tmp_path):
    p = tmp_path / "events.jsonl"
    lines = [
        json.dumps(
            {
                "event_type": "user_login",
                "event_time": f"2024-01-01T00:00:{i:02d}",
                "payload": {"customer_id": f"C{i}"},
            }
        )
        for i in range(_N_LINES)
    ]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


@pytest.fixture()
def fixture_len(replay_fixture):
    return _N_LINES


@pytest.fixture()
def make_reader(replay_fixture):
    from energy_data_stream_processing_spark.sources.replay_source import (
        _ReplayStreamReader,
    )

    def make(per_batch: int):
        return _ReplayStreamReader(
            {"path": replay_fixture, "lines_per_batch": str(per_batch)}
        )

    return make


def _scd2_state(spark, store):
    cols = ["customer_id", "tariff_type", "valid_from", "valid_to", "version", "is_current"]
    return sorted(map(tuple, spark.read.parquet(store).select(*cols).collect()))


def test_scd2_increment_replay_idempotent(spark, sf_dir, tmp_path):
    """At-least-once delivery: applying the SAME increment twice must leave
    the store identical to applying it once (and equal to the batch build)
    — a redelivery must not mint duplicate versions or zero-length ranges."""
    from energy_data_stream_processing_spark.operators.scd2 import (
        scd2_apply_increment,
        scd2_build,
        scd2_init_store,
    )
    from energy_data_stream_processing_spark.sources.adapter import energy_events

    ev = energy_events(spark, sf_dir)
    sw = ev.where(F.col("event_type") == "tariff_switch").select(
        "customer_id", "tariff_type", "event_time", "event_id"
    )
    base = sw.where(F.col("event_id") % 4 != 0)
    late = sw.where(F.col("event_id") % 4 == 0)
    assert late.count() > 0
    store = str(tmp_path / "dim")
    scd2_init_store(spark, store, base)
    scd2_apply_increment(spark, store, late)
    once = _scd2_state(spark, store)
    scd2_apply_increment(spark, store, late)  # redelivery
    twice = _scd2_state(spark, store)
    cols = ["customer_id", "tariff_type", "valid_from", "valid_to", "version", "is_current"]
    want = sorted(map(tuple, scd2_build(sw).select(*cols).collect()))
    assert twice == once == want


def test_replay_stream_restart_emits_no_duplicates(fixture_len, make_reader):
    """Checkpoint-restart simulation: the in-memory pacing cursor resets to
    0, so the first latestOffset after restart can fall BEHIND the committed
    offset. The reader must (a) emit nothing for the stale range Spark plans
    from the offset log, and (b) resume emission exactly at the committed
    line — no duplicates, no gaps — once pacing catches up."""
    total = fixture_len
    per_batch = 2
    committed = 4  # a prior run committed lines [0, 4)
    assert committed < total

    r = make_reader(per_batch)
    emitted = []
    prev_end = committed
    # Restart: Spark calls latestOffset() on the fresh reader FIRST — the
    # stale cursor yields an offset behind the committed one.
    stale = r.latestOffset()
    assert stale["line"] <= committed
    for _ in range(20):
        part = r.partitions({"line": prev_end}, stale)[0]
        emitted.extend(row[0] for row in r.read(part))
        prev_end = stale["line"]
        if stale["line"] >= total and part.start >= part.end:
            break
        stale = r.latestOffset()
    # every line from the committed offset onward exactly once, none before
    assert sorted(emitted) == list(range(committed, total))
    assert len(emitted) == len(set(emitted))


def test_replay_stream_fresh_run_unaffected(fixture_len, make_reader):
    """The restart guard must not change a normal fresh run: all lines
    emitted exactly once in paced batches."""
    r = make_reader(3)
    emitted, prev = [], 0
    for _ in range(20):
        end = r.latestOffset()
        part = r.partitions({"line": prev}, end)[0]
        emitted.extend(row[0] for row in r.read(part))
        if end["line"] == prev:
            break
        prev = end["line"]
    assert sorted(emitted) == list(range(fixture_len))


def test_lsh_broadcast_guard_fallback_engages(spark):
    """A planted duplicate mega-cluster (k near-identical docs -> ~k^2/2
    candidate pairs) must trip the measured broadcast-size guard: with the
    pair count above the limit the verification join is planned WITHOUT a
    broadcast (shuffle join — no driver/executor OOM risk from
    broadcasting an unbounded candidate frame); under the limit the hint
    engages; and the default AQE mode plans no unconditional hint. Results
    are identical in all three modes."""
    from energy_data_stream_processing_spark.operators.dedup import minhash_lsh_pairs

    k = 12  # 66 pairs
    rows = [(i, "the quick brown fox jumps over the lazy dog variant %d" % (i % 2))
            for i in range(k)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with _conf_override(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        hinted = minhash_lsh_pairs(docs, threshold=0.015, broadcast_limit=10**9)
        plan_hinted = hinted._jdf.queryExecution().executedPlan().toString()
        guarded = minhash_lsh_pairs(docs, threshold=0.015, broadcast_limit=10)
        plan_guarded = guarded._jdf.queryExecution().executedPlan().toString()
        aqe = minhash_lsh_pairs(docs, threshold=0.015)  # default: AQE sizes it
        plan_aqe = aqe._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_hinted
        assert "BroadcastHashJoin" not in plan_guarded
        assert "BroadcastHashJoin" not in plan_aqe  # no unconditional hint
        r_h = sorted(map(tuple, hinted.collect()))
        assert r_h == sorted(map(tuple, guarded.collect()))
        assert r_h == sorted(map(tuple, aqe.collect()))
        assert len(r_h) > 0


def test_streaming_stateful_under_rocksdb_state_store(spark, sf_dir):
    """The stateful streaming gate must produce identical results under the
    RocksDB state-store provider (the 100 TB default: state spills to disk
    instead of growing the JVM heap) as under the default HDFS-backed
    in-memory provider. Exercises provider load, per-batch commit, and
    state round-trip through RocksDB."""
    from energy_data_stream_processing_spark.plans.catalog import all_queries

    q = all_queries()["streaming_hourly_metrics"]
    base = sorted(map(tuple, q.builder(spark, sf_dir).collect()))
    with _conf_override(
        spark,
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    ):
        rocks = sorted(map(tuple, q.builder(spark, sf_dir).collect()))
    assert rocks == base and len(rocks) > 0


def test_ivf_training_sample_deterministic_and_sortfree(spark, sf_dir):
    """The hash-mod training sample must yield identical centroids across
    calls (no RNG, no partition-order dependence) and must not plan a
    global sort over the corpus."""
    import io
    from contextlib import redirect_stdout

    import numpy as np

    from energy_data_stream_processing_spark.operators.similarity import (
        _train_ivf_centroids,
    )
    from energy_data_stream_processing_spark.sources.adapter import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    c1 = _train_ivf_centroids(emb, nlist=8)
    c2 = _train_ivf_centroids(emb, nlist=8)
    assert np.array_equal(c1, c2) and c1.shape[0] == 8
    # the sampling filter itself must be sort-free
    n = emb.count()
    m = max(1, n // (2 * 2048))
    sample = emb.select("vec_id", "embedding").where(
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(m)) == 0
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        sample.explain("formatted")
    assert "Sort" not in buf.getvalue()
