#!/usr/bin/env python
"""Replicated A/B for the customer_view physical plans at scaled density.

Round-11 verdict item 1: single-shot ladder100 readings disagreed across
rounds (driver r10: twophase 15.9 s vs prefilter 24.5 s; builder-controlled
runs: prefilter 17.5-19.6 s, twophase 17.0-17.3 s), so the auto-dispatch
default rested on noise. This script settles it with N alternating
repetitions per variant on one session:

    python scripts/customer_view_ladder_ab.py [sf_dir] [scale_x] [reps] [entries]

``entries`` (optional) generalizes the harness to any comma-separated
catalog entries over a scaled events table (e.g.
``hourly_business_metrics,hourly_business_metrics_twophase``); default is
the customer_view trio with the single variant pinned.

- events replicated ``scale_x`` times with fresh event_ids, same time span
  and SAME customer set (per-customer density scales, cardinality doesn't) —
  identical generation to bench.py's ladder rungs;
- variants run INTERLEAVED round-robin (rep 1: single, twophase, prefilter;
  rep 2: ...) so slow machine drift hits every variant equally instead of
  biasing whichever ran last;
- prints per-variant sorted timings, median, and spread, plus a JSON line
  for SCALE.md §6.

All three variants share ONE DuckDB oracle (result-identity is the driver's
job, not this script's); this measures wall clock only.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import _scaled_dir
from energy_data_stream_processing_spark.plans.catalog import all_queries
from energy_data_stream_processing_spark.session import get_spark

VARIANTS = {
    "single": ("customer_view", {"variant": "single"}),
    "twophase": ("customer_view_twophase", {}),
    "prefilter": ("customer_view_prefilter", {}),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scale_x = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    variants = VARIANTS
    if len(sys.argv) > 4:
        variants = {e: (e, {}) for e in sys.argv[4].split(",")}

    spark = get_spark("customer-view-ladder-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    scaled = _scaled_dir(sf_dir, "events")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    (
        ev.crossJoin(spark.range(scale_x).withColumnRenamed("id", "_rep"))
        .withColumn("event_id", F.col("event_id") * scale_x + F.col("_rep"))
        .drop("_rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{scaled}/events.parquet")
    )

    catalog = all_queries()
    # one untimed warmup pass per variant: codegen + page cache, so rep 1
    # is not the odd one out
    for name, (entry, kw) in variants.items():
        catalog[entry].builder(spark, scaled, **kw).write.format("noop").mode(
            "overwrite"
        ).save()

    times: dict[str, list[float]] = {v: [] for v in variants}
    for rep in range(reps):
        for name, (entry, kw) in variants.items():
            t0 = time.perf_counter()
            catalog[entry].builder(spark, scaled, **kw).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            times[name].append(dt)
            print(f"rep {rep + 1}/{reps}  {name:<10} {dt:7.2f} s", flush=True)

    summary = {
        name: {
            "median": round(statistics.median(ts), 2),
            "min": min(ts),
            "max": max(ts),
            "reps": ts,
        }
        for name, ts in times.items()
    }
    print(json.dumps({"sf_dir": sf_dir, "scale_x": scale_x, "ab": summary}))
    spark.stop()


if __name__ == "__main__":
    main()
