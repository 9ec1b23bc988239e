"""Measure what the sharded staging retention buys (SCALE.md §4.4).

Replays the sf events through ``hourly_metrics_stateful_sharded_stream``
(maxFilesPerTrigger=1 over N ascending chunks + sentinel) into
``foreach_batch_sharded_flush`` twice — in-batch prune ON (the default)
vs OFF — and records the staging store's (batch, hour) partition count
after every micro-batch. OFF grows with the stream's history; ON tracks
the open hours. Both runs' final metrics stores are asserted equal to the
batch aggregate, so the comparison is between two CORRECT configurations.

Usage: python scripts/staging_retention_probe.py [sf_dir] [n_chunks]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from energy_data_stream_processing_spark.operators.hourly import (
    METRIC_COLUMNS,
    hourly_business_metrics,
)
from energy_data_stream_processing_spark.session import get_spark
from energy_data_stream_processing_spark.sources.adapter import energy_events
from energy_data_stream_processing_spark.sources.sinks import (
    foreach_batch_sharded_flush,
    read_hourly_metrics_parquet,
)
from energy_data_stream_processing_spark.streaming.runner import (
    HOURS_STATE_PARTITIONS,
    append_watermark_sentinel,
    ascending_time_chunks,
    energy_events_stream,
    hourly_metrics_stateful_sharded_stream,
)


def staged_partitions(staging: str) -> int:
    n = 0
    if not os.path.isdir(staging):
        return 0
    for b in os.listdir(staging):
        bp = os.path.join(staging, b)
        if b.startswith("_batch_id=") and os.path.isdir(bp):
            n += sum(1 for h in os.listdir(bp) if h.startswith("hour_epoch_ms="))
    return n


def run(spark, sf_dir: str, n_chunks: int, prune: bool) -> tuple[list[int], dict]:
    src = ascending_time_chunks(spark, sf_dir, n_chunks)
    append_watermark_sentinel(spark, sf_dir, src)
    work = tempfile.mkdtemp(prefix=f"staging-probe-{'on' if prune else 'off'}-")
    staging = f"{work}/staging"
    store = f"{work}/metrics"
    inner = foreach_batch_sharded_flush(
        staging, metrics_path=store, prune_closed=prune
    )
    series: list[int] = []

    def fn(df, bid):
        inner(df, bid)
        series.append(staged_partitions(staging))

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(HOURS_STATE_PARTITIONS))
    try:
        q = (
            hourly_metrics_stateful_sharded_stream(
                energy_events_stream(
                    spark, sf_dir, source_dir=src, max_files_per_trigger=1
                ),
                shards=8,
            )
            .writeStream.foreachBatch(fn)
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    got = {
        int(r["hour"].timestamp()): r.asDict()
        for r in read_hourly_metrics_parquet(spark, store).collect()
    }
    return series, got


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    spark = get_spark("staging-retention-probe", shuffle_partitions=8)
    want = {
        int(r["hour"].timestamp()): r.asDict()
        for r in hourly_business_metrics(energy_events(spark, sf_dir)).collect()
    }

    results = {}
    for prune in (False, True):
        series, got = run(spark, sf_dir, n_chunks, prune)
        # sentinel hours excluded from the equality check the same way the
        # tests do: real hours only
        mismatch = [
            (h, c)
            for h in want
            for c in METRIC_COLUMNS
            if h in got and float(got[h][c]) != float(want[h][c])
        ]
        missing = [h for h in want if h not in got]
        label = "prune_on" if prune else "prune_off"
        results[label] = series
        print(
            f"{label}: per-batch staged (batch,hour) partitions = {series}; "
            f"peak={max(series)} final={series[-1]}; "
            f"store: {len(got)} hours, {len(missing)} missing of {len(want)}, "
            f"{len(mismatch)} value mismatches"
        )
        assert not mismatch, mismatch[:3]
        assert not missing, missing[:3]  # completeness, not just value match

    off, on = results["prune_off"], results["prune_on"]
    print(
        f"-- retention buys: peak {max(off)} -> {max(on)} "
        f"({max(off) / max(on):.1f}x), final {off[-1]} -> {on[-1]}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
