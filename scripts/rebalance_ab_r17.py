"""Round-17 scan-rebalance A/B for the single-task TPC-H aggregations.

The round-16 opt-in layout rebalance (adapter._maybe_parallelize_scan) was
kept only where interleaved A/B proved it (explode/sign-accumulation doc
pipelines); the heavy-decimal single-scan queries (pricing_summary's four
decimal sums over a single-row-group lineitem scan = ONE task on 32
cores) were never tried. Interleaved same-session A/B over the RAW
builders (bypassing the plan memo, which would otherwise serve arm A's
plan to arm B): arm A = as-registered, arm B = identical builder with the
engine's load_table(..., rebalance=True) forced on the fact table via a
scoped patch. Medians of --reps (default 5) per arm, reps interleaved.

Usage: python scripts/rebalance_ab_r17.py [--reps 5]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from energy_data_stream_processing_spark.session import get_spark
from energy_data_stream_processing_spark.sources import adapter

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTS = {"lineitem", "orders", "events"}


class force_rebalance:
    """Scoped patch: load_table(fact) -> load_table(fact, rebalance=True)."""

    def __enter__(self):
        self.orig = adapter.load_table

        def patched(spark, sf_dir, name, rebalance=False):
            return self.orig(
                spark, sf_dir, name, rebalance=rebalance or name in FACTS
            )

        adapter.load_table = patched
        # plan modules import load_table by name at module top: patch those
        # references too
        import energy_data_stream_processing_spark.plans.tpch_queries as T

        self.t_orig = T.load_table
        T.load_table = patched
        return self

    def __exit__(self, *exc):
        adapter.load_table = self.orig
        import energy_data_stream_processing_spark.plans.tpch_queries as T

        T.load_table = self.t_orig


def main() -> None:
    reps = 5
    for i, a in enumerate(sys.argv):
        if a == "--reps":
            reps = int(sys.argv[i + 1])
    spark = get_spark("rebalance-ab-r17")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    from energy_data_stream_processing_spark.plans import tpch_queries as T

    builders = {
        "pricing_summary": T.q_pricing_summary,
        "top_customer_revenue": T.q_top_customer_revenue,
        "value_percentiles_by_type": getattr(
            T, "q_value_percentiles_by_type", None
        ),
    }
    builders = {k: v for k, v in builders.items() if v is not None}

    out = {}
    for name, raw in builders.items():
        # untimed warm pass for both arms (codegen + page cache)
        raw(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        with force_rebalance():
            raw(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        series: dict[str, list[float]] = {"A": [], "B": []}
        for _ in range(reps):
            t0 = time.perf_counter()
            raw(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            series["A"].append(time.perf_counter() - t0)
            with force_rebalance():
                t0 = time.perf_counter()
                raw(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                series["B"].append(time.perf_counter() - t0)
        med = {k: statistics.median(v) for k, v in series.items()}
        out[name] = {
            "A_med": round(med["A"], 3),
            "B_rebalance_med": round(med["B"], 3),
            "B_over_A": round(med["B"] / med["A"], 3),
        }
        print(f"{name:28s} A={med['A']:.3f} B(rebalance)={med['B']:.3f} "
              f"B/A={med['B']/med['A']:.3f}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
