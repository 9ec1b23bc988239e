"""Round-17 AQE coalescing A/B (r16 verdict item 4, guide §1.2 step 3).

``spark.sql.adaptive.coalescePartitions.parallelismFirst`` defaults to
true (partition sizing chases cluster parallelism, producing many tiny
post-shuffle tasks); the Spark tuning docs recommend false in production
so coalescing respects ``advisoryPartitionSizeInBytes``. Locally the
question is whether fewer, larger post-shuffle tasks shave the per-query
fixed overhead the 8-vs-32-core readings exposed.

Interleaved same-session A/B (the conf is runtime-settable): per headline
query, alternate A (session default, true) / B (false) reps back to back,
5 each, compare medians. Prints a per-query table + totals; commit the
numbers in OPTIMIZATION_r17.md, ship the config only if the win is
repeatable and scale-justified.

Usage: python scripts/aqe_ab_r17.py [--reps 5]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from energy_data_stream_processing_spark.plans.catalog import all_queries
from energy_data_stream_processing_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEY = "spark.sql.adaptive.coalescePartitions.parallelismFirst"


def main() -> None:
    reps = 5
    for i, a in enumerate(sys.argv):
        if a == "--reps":
            reps = int(sys.argv[i + 1])
    spark = get_spark("aqe-ab-r17")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    catalog = all_queries()
    headline = [n for n, q in catalog.items() if q.headline]
    out: dict[str, dict] = {}
    tot = {"A": 0.0, "B": 0.0}
    for name in headline:
        q = catalog[name]
        # one untimed warm pass so codegen/page cache are hot for both arms
        q.builder(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        series: dict[str, list[float]] = {"A": [], "B": []}
        for _ in range(reps):
            for arm, val in (("A", "true"), ("B", "false")):
                spark.conf.set(KEY, val)
                t0 = time.perf_counter()
                q.builder(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                series[arm].append(time.perf_counter() - t0)
        spark.conf.unset(KEY)
        med = {k: statistics.median(v) for k, v in series.items()}
        out[name] = {
            "A_true_med": round(med["A"], 3),
            "B_false_med": round(med["B"], 3),
            "B_over_A": round(med["B"] / med["A"], 3),
        }
        tot["A"] += med["A"]
        tot["B"] += med["B"]
        print(f"{name:28s} A(true)={med['A']:.3f}  B(false)={med['B']:.3f}  "
              f"B/A={med['B']/med['A']:.3f}", flush=True)
    print(f"TOTALS A={tot['A']:.2f} B={tot['B']:.2f} B/A={tot['B']/tot['A']:.3f}")
    outp = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "plans", "r17", "aqe_parallelism_first_ab.json")
    with open(outp, "w") as f:
        json.dump({"reps": reps, "per_query": out,
                   "totals": {k: round(v, 3) for k, v in tot.items()}}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
