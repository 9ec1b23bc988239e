#!/usr/bin/env python
"""Warm A/B of ONE catalog query across two BUILDS (round-11 verdict item 5).

The round-11 driver bench read customer_view 1.40 -> 1.90 s warm vs round
10 while untouched cheap queries also inflated (VM-drift signature), but
customer_view was the one inflated query whose code changed (footer-probe
dispatch). This harness settles it: run the SAME warm protocol in a fresh
process per (build, rep), interleaved A,B,A,B,... so machine drift lands
on both arms equally, and compare medians.

    python scripts/customer_view_warm_ab_builds.py <repoA> <repoB> [reps]

Each arm process: fresh SparkSession -> one cold run (discarded from the
comparison, reported for context) -> 5 warm runs to the noop sink. Pass a
git worktree of the old commit as repoA, the live checkout as repoB.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

QUERY = os.environ.get("SPARK_GRAFT_AB_QUERY", "customer_view")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Runs inside the arm's own process so each build imports ONLY its tree.
_ARM_BODY = r"""
import json, sys, time
repo, query, sf_dir, warm_reps = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
sys.path.insert(0, repo)
from energy_data_stream_processing_spark.session import get_spark
from energy_data_stream_processing_spark.plans.catalog import all_queries
spark = get_spark("cv-warm-ab")
spark.sparkContext.setLogLevel("ERROR")
build = all_queries()[query].builder

def run():
    t0 = time.perf_counter()
    build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)

cold = run()
warm = [run() for _ in range(warm_reps)]
print("ARM_RESULT " + json.dumps({"cold": cold, "warm": warm}))
spark.stop()
"""


def run_arm(repo: str, warm_reps: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _ARM_BODY, repo, QUERY, SF_DIR, str(warm_reps)],
        capture_output=True, text=True, check=True,
    )
    line = next(
        ln for ln in out.stdout.splitlines() if ln.startswith("ARM_RESULT ")
    )
    return json.loads(line[len("ARM_RESULT "):])


def main() -> None:
    repo_a, repo_b = sys.argv[1], sys.argv[2]
    process_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    warm_reps = 5
    arms: dict[str, list[float]] = {repo_a: [], repo_b: []}
    colds: dict[str, list[float]] = {repo_a: [], repo_b: []}
    for i in range(process_reps):
        for repo in (repo_a, repo_b):  # interleaved: drift hits both arms
            r = run_arm(repo, warm_reps)
            arms[repo].extend(r["warm"])
            colds[repo].append(r["cold"])
            print(
                f"rep {i + 1} {repo}: cold={r['cold']} warm={r['warm']}",
                flush=True,
            )
    for repo in (repo_a, repo_b):
        print(
            json.dumps({
                "repo": repo,
                "query": QUERY,
                "sf_dir": SF_DIR,
                "cold_median": round(statistics.median(colds[repo]), 3),
                "warm_median": round(statistics.median(arms[repo]), 3),
                "warm_min": min(arms[repo]),
                "warm_max": max(arms[repo]),
                "n_warm": len(arms[repo]),
            })
        )


if __name__ == "__main__":
    main()
