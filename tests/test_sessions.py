"""Sessionization: manual window plan vs native session_window cross-check.

The manual plan is oracle-gated value-exactly in test_oracle_differential;
here we prove the built-in session_window grouping produces the SAME
sessions (count, membership sizes, bounds) — i.e. the streaming-capable
native operator and the dialect-neutral batch plan agree.
"""

from __future__ import annotations

from energy_data_stream_processing_spark.operators.sessions import (
    sessionize,
    sessionize_native,
)
from energy_data_stream_processing_spark.sources.adapter import load_table


def test_native_session_window_agrees(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    manual = sessionize(events, gap_minutes=30).collect()
    native = sessionize_native(events, gap_minutes=30).collect()

    def key(rows):
        return sorted(
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["n_event_types"])
            for r in rows
        )

    assert len(manual) == len(native)
    assert key(manual) == key(native)


def test_sessionize_order_independent(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    import pyspark.sql.functions as F

    shuffled = events.orderBy(F.rand(seed=7))
    a = sorted(map(tuple, sessionize(events).collect()))
    b = sorted(map(tuple, sessionize(shuffled).collect()))
    assert a == b


def test_streaming_sessions_equal_batch(spark, sf_dir):
    from energy_data_stream_processing_spark.operators.sessions import sessionize_native
    from energy_data_stream_processing_spark.streaming.runner import (
        run_stream_to_table,
        stream_raw_events,
    )

    stream = stream_raw_events(spark, sf_dir)
    agg = sessionize_native(
        stream.withWatermark("ts", "1 hour"), gap_minutes=30, exact_distinct=False
    )
    out = run_stream_to_table(spark, agg, mode="complete")
    batch = sessionize(load_table(spark, sf_dir, "events"), gap_minutes=30)
    a = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in out.collect()
    )
    b = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch.collect()
    )
    assert a == b
