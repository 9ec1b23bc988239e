"""Interleaved A/B: round-17 probe-first (skip empty write) vs round-16
write-first order of foreach_batch_sharded_flush, on the bench's base-sf
hot-hour sharded rung. One process, arms alternated N times so VM weather
(this rung's documented noise source: checkpoint+staging fsync on a
contended disk) hits both arms equally.

Usage: python scripts/sharded_order_ab_r17.py [--reps 3]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from energy_data_stream_processing_spark.session import get_spark
from energy_data_stream_processing_spark.sources import sinks as S

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_order_flush(staging_path, metrics_path=None, two_stage_sessions=False,
                    prune_closed=False, **_):
    """The round-16 body: staging write FIRST (every batch, empty or not),
    then the touched probe from cache."""

    def fn(batch_df, batch_id):
        from energy_data_stream_processing_spark.streaming.runner import (
            merge_sharded_hourly_partials,
        )

        spark = batch_df.sparkSession
        batch_df.persist()
        try:
            S.overwrite_partitions(
                batch_df.withColumn("_batch_id", F.lit(batch_id)),
                staging_path, "_batch_id", "hour_epoch_ms",
            )
            touched = [
                r["hour_epoch_ms"]
                for r in batch_df.select("hour_epoch_ms").distinct().collect()
            ]
        finally:
            batch_df.unpersist()
        if not touched:
            return
        staged = spark.read.parquet(staging_path).where(
            F.col("hour_epoch_ms").isin(touched)
        )
        merged = merge_sharded_hourly_partials(
            staged, two_stage_sessions=two_stage_sessions
        )
        if metrics_path is not None:
            S.upsert_hourly_metrics_parquet(spark, merged, metrics_path)
        if prune_closed:
            S.prune_sharded_staging(
                staging_path, max(touched) + 3_600_000, keep_hours=set(touched)
            )

    return fn


def main() -> None:
    reps = 3
    for i, a in enumerate(sys.argv):
        if a == "--reps":
            reps = int(sys.argv[i + 1])
    spark = get_spark("sharded-order-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    from energy_data_stream_processing_spark.sources.adapter import (
        normalize_event_ts,
    )
    from energy_data_stream_processing_spark.streaming.runner import (
        append_watermark_sentinel,
        ascending_time_chunks,
        energy_events_stream,
        run_hourly_pipeline_dispatched,
    )

    hot_epoch_us = 1_699_999_200 * 1_000_000
    hot_dir = tempfile.mkdtemp(prefix="ordab-")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        os.symlink(f"{SF_DIR}/{t}.parquet", f"{hot_dir}/{t}.parquet")
    (
        normalize_event_ts(spark.read.parquet(f"{SF_DIR}/events.parquet"))
        .withColumn(
            "ts",
            F.timestamp_micros(
                F.lit(hot_epoch_us) + F.unix_micros("ts") % F.lit(3_600_000_000)
            ),
        )
        .write.mode("overwrite")
        .parquet(f"{hot_dir}/events.parquet")
    )
    hot_src = ascending_time_chunks(spark, hot_dir, 8)
    append_watermark_sentinel(spark, hot_dir, hot_src)

    new_flush = S.foreach_batch_sharded_flush
    series: dict[str, list[float]] = {"new": [], "old": []}
    # one untimed warm run (JIT/python workers) with the new code
    for rep in range(reps + 1):
        for arm in ("new", "old"):
            S.foreach_batch_sharded_flush = (
                new_flush if arm == "new" else old_order_flush
            )
            try:
                ev = energy_events_stream(
                    spark, hot_dir, source_dir=hot_src, max_files_per_trigger=1
                )
                work = tempfile.mkdtemp(prefix=f"ordab-{arm}-")
                t0 = time.perf_counter()
                run_hourly_pipeline_dispatched(
                    spark, ev,
                    metrics_path=f"{work}/hours",
                    checkpoint=f"{work}/ckpt",
                    variant="sharded", shards=32, horizon="2 hours",
                )
                dt = round(time.perf_counter() - t0, 3)
                shutil.rmtree(work, ignore_errors=True)
            finally:
                S.foreach_batch_sharded_flush = new_flush
            if rep == 0:
                print(f"warmup {arm}: {dt}", flush=True)
            else:
                series[arm].append(dt)
                print(f"rep {rep} {arm}: {dt}", flush=True)
    med = {k: statistics.median(v) for k, v in series.items()}
    print(f"MEDIANS new={med['new']} old={med['old']} "
          f"new/old={med['new']/med['old']:.3f}")
    print("reps:", series)
    shutil.rmtree(hot_src, ignore_errors=True)
    shutil.rmtree(hot_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
