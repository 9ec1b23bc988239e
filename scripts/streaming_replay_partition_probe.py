#!/usr/bin/env python
"""Reproduce SCALE.md §4.3: stateful micro-batch overhead vs state partitions.

`applyInPandasWithState` launches one Arrow/Python state-function round per
STATE PARTITION per micro-batch — even near-empty ones — so a stream whose
live key count is far below `spark.sql.shuffle.partitions` pays fixed
dispatch cost proportional to the partition count, not the data. This probe
runs the SAME bounded exact hourly replay (8 ascending chunks + sentinel at
10x density, the `streaming_replay_sec` bench shape) once per partition
setting, each in a FRESH SparkSession (the state partition count pins at the
first checkpoint, and session reuse would let the JVM warm across arms).

    python scripts/streaming_replay_partition_probe.py [sf_dir] [parts ...]

Round-11 readings (idle machine): 32 partitions -> 21.1 s, 8 -> 14.6 s
(~1.45x) with ~100 live hour keys.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings",
]


def run_arm(sf_dir: str, parts: int) -> float:
    from energy_data_stream_processing_spark.session import get_spark
    from energy_data_stream_processing_spark.streaming.runner import (
        append_watermark_sentinel,
        ascending_time_chunks,
        energy_events_stream,
        hourly_metrics_stateful_bounded_stream,
        run_stream_to_table,
    )

    spark = get_spark(f"replay-parts-{parts}", shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    d = tempfile.mkdtemp(prefix=f"replay-parts-{parts}-")
    for t in TABLES:
        os.symlink(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    (
        ev.crossJoin(spark.range(10).withColumnRenamed("id", "_rep"))
        .withColumn("event_id", F.col("event_id") * 10 + F.col("_rep"))
        .drop("_rep")
        .write.mode("overwrite")
        .parquet(f"{d}/events.parquet")
    )
    src = ascending_time_chunks(spark, d, 8)
    append_watermark_sentinel(spark, d, src)
    sev = energy_events_stream(spark, d, source_dir=src, max_files_per_trigger=1)
    t0 = time.perf_counter()
    run_stream_to_table(
        spark,
        hourly_metrics_stateful_bounded_stream(sev, horizon="2 hours"),
        mode="append",
    )
    dt = time.perf_counter() - t0
    spark.stop()
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(src, ignore_errors=True)
    return dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    parts_list = [int(a) for a in sys.argv[2:]] or [32, 8]
    for parts in parts_list:
        dt = run_arm(sf_dir, parts)
        print(f"shuffle_partitions={parts:<3} replay={dt:6.2f} s", flush=True)


if __name__ == "__main__":
    main()
