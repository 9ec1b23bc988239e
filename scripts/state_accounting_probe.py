"""Measured state-store accounting for the stateful streaming families.

SCALE.md §4 claims which streaming operators hold bounded state (watermark
eviction) and which intentionally hold hours-cardinality state. This probe
replays the events table as event-time-ascending micro-batches through each
family and prints the per-batch state rows Spark reports
(``StreamingQueryProgress.stateOperators``) — the series SHAPE is the
claim: bounded operators plateau, unbounded ones grow with keys seen.

Usage:  python scripts/state_accounting_probe.py [sf_dir] [n_chunks]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from energy_data_stream_processing_spark.functions.stage_metrics import (
    run_stream_with_state_metrics,
    state_rows_series,
)
from energy_data_stream_processing_spark.session import get_spark
from energy_data_stream_processing_spark.streaming.runner import (
    append_watermark_sentinel,
    ascending_time_chunks,
    energy_events_stream,
    hourly_metrics_native_stream,
    hourly_metrics_stateful_bounded_stream,
    hourly_metrics_stateful_stream,
    stream_raw_events,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("state-accounting-probe")
    src = ascending_time_chunks(spark, sf_dir, n_chunks)

    def profile(name, stream_df, mode):
        _, batches = run_stream_with_state_metrics(spark, stream_df, mode=mode)
        series = state_rows_series(batches)
        removed = [sum(o["rows_removed"] for o in b["operators"]) for b in batches]
        mem = max(
            (sum(o["memory_bytes"] for o in b["operators"]) for b in batches),
            default=0,
        )
        print(f"{name:<34} peak={max(series):>8}  final={series[-1]:>8}  "
              f"evicted={sum(removed):>8}  peak_mem={mem:>10}B")
        print(f"  series: {series}")
        return {"series": series, "removed": removed, "peak_memory_bytes": mem}

    out = {}
    ev = energy_events_stream(spark, sf_dir, source_dir=src, max_files_per_trigger=1)
    out["hourly_window_wm2h"] = profile(
        "hourly window agg (2h watermark)",
        hourly_metrics_native_stream(ev, watermark="2 hours"),
        "append",
    )
    raw = stream_raw_events(spark, sf_dir, source_dir=src, max_files_per_trigger=1)
    out["dedup_within_watermark"] = profile(
        "dropDuplicatesWithinWatermark(2h)",
        raw.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(["event_id"]),
        "append",
    )
    raw2 = stream_raw_events(spark, sf_dir, source_dir=src, max_files_per_trigger=1)
    out["dedup_plain"] = profile(
        "plain dropDuplicates (anti-pattern)",
        raw2.dropDuplicates(["event_id"]),
        "append",
    )
    ev2 = energy_events_stream(spark, sf_dir, source_dir=src, max_files_per_trigger=1)
    out["hourly_stateful_exact"] = profile(
        "exact stateful hourly (no horizon)",
        hourly_metrics_stateful_stream(ev2),
        "update",
    )
    # bounded variant gets its OWN chunk dir: the sentinel file that flushes
    # its tail must not leak into the other profiles' replays
    src_b = ascending_time_chunks(spark, sf_dir, n_chunks)
    append_watermark_sentinel(spark, sf_dir, src_b)
    ev3 = energy_events_stream(spark, sf_dir, source_dir=src_b, max_files_per_trigger=1)
    out["hourly_stateful_bounded"] = profile(
        "bounded exact hourly (2h timeout)",
        hourly_metrics_stateful_bounded_stream(ev3, horizon="2 hours"),
        "append",
    )

    row = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()[0]
    )
    print(json.dumps({"sf_dir": sf_dir, "n_chunks": n_chunks, "rows": row["rows"], "state": out}))


if __name__ == "__main__":
    main()
