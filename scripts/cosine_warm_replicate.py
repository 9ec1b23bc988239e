#!/usr/bin/env python
"""N-rep warm replicate of `embedding_cosine_topk` (round-14 verdict item 4).

The r13→r14 driver runs moved this query's warm/canary ratio 0.79 → 0.97 —
below the gate's alert bar but the largest headline shift, and it is pure
compute (a synthetic-free brute-force cosine over the embeddings table, no
table-read skew), so a replicate either clears it as warm-tail noise or
catches a real codegen/Arrow regression. Protocol mirrors bench.py: same
session settings, same canary plan (frozen), interleaved canary/query warm
reps after one discarded warm-up of each, medians reported.

    python scripts/cosine_warm_replicate.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from energy_data_stream_processing_spark.plans.catalog import all_queries
    from energy_data_stream_processing_spark.session import get_spark

    spark = get_spark("cosine-replicate", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()["embedding_cosine_topk"].builder

    def run_query() -> float:
        t0 = time.perf_counter()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def run_canary() -> float:
        # bench.py's frozen canary, IMPORTED — one denominator, no copy
        # that could silently drift from the tracked ratios
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
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
