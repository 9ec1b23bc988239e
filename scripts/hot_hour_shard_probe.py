#!/usr/bin/env python
"""Measure the hot-hour state-row hazard and the sharded variant's effect.

SCALE.md §5.1's top 1000x hazard: the exact hourly twins keep each hour's
exact distinct-ID SETS inside ONE state row, so a hot hour is a multi-MB
row re-serialized by a single task on every touched micro-batch. This
probe folds the ENTIRE sf events corpus into a single event-time hour,
replays it in 8 ascending micro-batches (+ sentinel flush), and records
the per-batch state accounting for:

  A) hourly_metrics_stateful_bounded_stream    (1 state row holds it all)
  B) hourly_metrics_stateful_sharded_stream    (key salted to
     (hour, customer-shard), shards configurable)

Each arm runs in a FRESH SparkSession at the engine's hours-class state
partitioning (8). Reported per arm: replay wall seconds, final state-row
count, peak stateOperators.memoryUsedBytes, and peak bytes PER STATE ROW —
the quantity sharding is supposed to divide.

    python scripts/hot_hour_shard_probe.py [sf_dir] [shards] [layout]

``layout`` is ``hot`` (default: all events folded into one hour — the
hazard scenario) or ``normal`` (events keep their real hours — measures
what sharding COSTS in the regime where it is not needed, completing the
ship-as-opt-in decision table in SCALE.md §4.4).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# Fixed anchor, HOUR-ALIGNED (1_699_999_200 s = 2023-11-14 22:00:00Z).
# A non-aligned anchor silently spreads "one hot hour" across two
# date_trunc hours (the original 1_700_000_000 s was 800 s past the
# boundary and produced 2 unsharded state rows, not 1).
HOT_EPOCH_US = 1_699_999_200 * 1_000_000
assert HOT_EPOCH_US % 3_600_000_000 == 0


def build_hot_hour_dir(spark, sf_dir: str) -> str:
    """Temp sf-dir whose events all land in ONE event-time hour (original
    sub-hour offsets preserved modulo 1h, so chunks stay ascending)."""
    from energy_data_stream_processing_spark.sources.adapter import (
        normalize_event_ts,
    )

    d = tempfile.mkdtemp(prefix="hot-hour-")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        os.symlink(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    ev = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    (
        ev.withColumn(
            "ts",
            F.timestamp_micros(
                F.lit(HOT_EPOCH_US)
                + F.unix_micros("ts") % F.lit(3_600_000_000)
            ),
        )
        .write.mode("overwrite")
        .parquet(f"{d}/events.parquet")
    )
    return d


def build_normal_dir(spark, sf_dir: str) -> str:
    """Temp sf-dir with events unchanged (real hour spread) — symlinks."""
    d = tempfile.mkdtemp(prefix="normal-hours-")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings", "events"):
        os.symlink(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    return d


def run_arm(sf_dir: str, variant: str, shards: int, layout: str = "hot") -> dict:
    from energy_data_stream_processing_spark.functions.stage_metrics import (
        run_stream_with_state_metrics,
    )
    from energy_data_stream_processing_spark.session import get_spark
    from energy_data_stream_processing_spark.streaming.runner import (
        HOURS_STATE_PARTITIONS,
        append_watermark_sentinel,
        ascending_time_chunks,
        energy_events_stream,
        hourly_metrics_stateful_bounded_stream,
        hourly_metrics_stateful_sharded_stream,
    )

    spark = get_spark(
        f"hot-hour-{variant}", shuffle_partitions=HOURS_STATE_PARTITIONS
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    hot_dir = (
        build_hot_hour_dir(spark, sf_dir)
        if layout == "hot"
        else build_normal_dir(spark, sf_dir)
    )
    src = ascending_time_chunks(spark, hot_dir, 8)
    append_watermark_sentinel(spark, hot_dir, src)
    ev = energy_events_stream(spark, hot_dir, source_dir=src, max_files_per_trigger=1)
    if variant == "sharded":
        stream = hourly_metrics_stateful_sharded_stream(
            ev, horizon="2 hours", shards=shards
        )
    else:
        stream = hourly_metrics_stateful_bounded_stream(ev, horizon="2 hours")
    t0 = time.perf_counter()
    _, batches = run_stream_with_state_metrics(spark, stream, mode="append")
    wall = round(time.perf_counter() - t0, 2)

    series = []
    for b in batches:
        for op in b["operators"]:
            series.append(
                {
                    "batch": b["batch_id"],
                    "rows": op["rows_total"],
                    "bytes": op["memory_bytes"],
                }
            )
    peak = max(series, key=lambda s: s["bytes"]) if series else {"rows": 0, "bytes": 0}
    out = {
        "variant": variant,
        "layout": layout,
        "shards": shards if variant == "sharded" else 1,
        "wall_sec": wall,
        "peak_state_bytes": peak["bytes"],
        "peak_state_rows": peak["rows"],
        "peak_bytes_per_row": round(peak["bytes"] / peak["rows"]) if peak["rows"] else 0,
        "series": series,
    }
    spark.stop()
    shutil.rmtree(hot_dir, ignore_errors=True)
    shutil.rmtree(src, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    shards = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    layout = sys.argv[3] if len(sys.argv) > 3 else "hot"
    for variant in ("unsharded", "sharded"):
        r = run_arm(sf_dir, variant, shards, layout)
        series = r.pop("series")
        print(json.dumps(r), flush=True)
        print(
            "  per-batch (rows, MiB):",
            [(s["rows"], round(s["bytes"] / 1048576, 1)) for s in series],
            flush=True,
        )


if __name__ == "__main__":
    main()
