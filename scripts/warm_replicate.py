#!/usr/bin/env python
"""N-rep interleaved warm replicate of any catalog query vs the frozen
canary — the generalization of the round-15 cosine harness (round-15
verdict item 3 needs the same protocol for `hourly_business_metrics`).

A single driver-run warm/canary ratio carries ~±30% tail variance on this
VM, so a cross-round shift below the gate's alert bar is settled by
REPLICATION, not by staring at two single shots: one discarded warm-up of
each plan, then `reps` interleaved (canary, query) pairs, medians
reported. The canary is bench.py's frozen plan, IMPORTED — one
denominator, no copy that could silently drift from the tracked ratios.

    python scripts/warm_replicate.py <query> [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def replicate(query: str, sf_dir: str, reps: int) -> dict:
    from energy_data_stream_processing_spark.plans.catalog import all_queries
    from energy_data_stream_processing_spark.session import get_spark

    spark = get_spark("warm-replicate", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()[query].builder

    def run_query() -> float:
        t0 = time.perf_counter()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def run_canary() -> float:
        from bench import frozen_canary_run

        return frozen_canary_run(spark)

    # one discarded warm-up each (scan/codegen/Arrow pool)
    run_canary()
    run_query()
    canary_reps, query_reps = [], []
    for _ in range(reps):
        canary_reps.append(run_canary())
        query_reps.append(run_query())
    out = {
        "query": query,
        "sf_dir": sf_dir,
        "reps": reps,
        "query_warm": query_reps,
        "canary_warm": canary_reps,
        "query_median": statistics.median(query_reps),
        "canary_median": statistics.median(canary_reps),
        "per_canary_median": round(
            statistics.median(query_reps) / statistics.median(canary_reps), 3
        ),
        "per_canary_reps": [
            round(a / b, 3) for a, b in zip(query_reps, canary_reps)
        ],
    }
    spark.stop()
    return out


def main() -> None:
    query = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    print(json.dumps(replicate(query, sf_dir, reps)))


if __name__ == "__main__":
    main()
