"""Round-17 scaling probe (r16 verdict item 6).

At sf0.1 every driver table is ONE parquet file with ONE row group, so
every scan stage is a single task and the 8-vs-32-core bench ratios
measure fixed overhead, not the engine (14/20 queries read <= 1.0 in
PERF_r16.json's scaling block). This probe answers whether the ENGINE
scales when the LAYOUT allows it: it rewrites the three data-bearing
tables (events, lineitem, documents — plus orders for the join queries)
into 32-way multi-file layouts in a temp FIXTURES variant (same rows,
layout only) and times a data-heavy headline subset there.

Two modes, composed by the wrapper loop at the bottom:

  python scripts/rowgroup_scaling_probe.py prepare <variant_dir>
  SPARK_GRAFT_CPUS=32 python scripts/rowgroup_scaling_probe.py run <variant_dir> <out.json>
  SPARK_GRAFT_CPUS=8  python scripts/rowgroup_scaling_probe.py run <variant_dir> <out.json>

`run` executes in a fresh process (core count is a session-construction
property) and reports per-query warm medians (3 reps) through the noop
sink. The committed artifact is plans/r17/scaling_probe.json; the finding
goes in OPTIMIZATION_r17.md / SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
#: tables worth re-laying (the rest are dimension-sized)
SPLIT = {"events": 32, "lineitem": 32, "documents": 32, "orders": 32}

#: data-heavy subset: scan-stage work dominates (aggregation partials,
#: adapter projection, shingling) — the queries whose 8-vs-32 ratio the
#: layout currently caps
QUERIES = [
    "pricing_summary",
    "hourly_business_metrics",
    "customer_view",
    "user_sessions",
    "value_percentiles_by_type",
    "dedup_ngram_jaccard",
    "dedup_exact",
    "top_customer_revenue",
]


def prepare(variant_dir: str) -> None:
    from energy_data_stream_processing_spark.session import get_spark

    spark = get_spark("rowgroup-probe-prepare")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(variant_dir, exist_ok=True)
    for t in TABLES:
        src = f"{SF_DIR}/{t}.parquet"
        dst = f"{variant_dir}/{t}.parquet"
        if t in SPLIT:
            # layout-only rewrite: same rows, 32 files -> 32 row groups.
            # nanos timestamps survive as int64+nanosAsLong reads both ways.
            spark.read.parquet(src).repartition(SPLIT[t]).write.mode(
                "overwrite"
            ).parquet(dst)
        elif not os.path.exists(dst):
            os.symlink(src, dst)
    spark.stop()


def run(variant_dir: str, out_path: str) -> None:
    from energy_data_stream_processing_spark.plans.catalog import all_queries
    from energy_data_stream_processing_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("rowgroup-probe-run")
    spark.sparkContext.setLogLevel("ERROR")
    # bench-equivalent warmup
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    catalog = all_queries()
    res: dict[str, float] = {}
    for name in QUERIES:
        q = catalog[name]
        reps = []
        for _ in range(4):  # first rep = cold (dropped), 3 warm reps
            t0 = time.perf_counter()
            q.builder(spark, variant_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            reps.append(round(time.perf_counter() - t0, 3))
        res[name] = sorted(reps[1:])[1]
        print(f"cpus={cpus} {name}: cold={reps[0]} warm_med={res[name]}",
              flush=True)
    with open(out_path, "w") as f:
        json.dump({"cpus": int(cpus), "queries": res}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    mode, variant_dir = sys.argv[1], sys.argv[2]
    if mode == "prepare":
        prepare(variant_dir)
    elif mode == "run":
        run(variant_dir, sys.argv[3])
    else:
        raise SystemExit(f"unknown mode {mode}")
