"""Round-16 measurement harness (guide §1: measure first).

Per headline query, on the SAME session shape the bench uses (get_spark
configs; UI enabled so the REST API can report per-job/stage metrics):

- ``build_sec``   — Python plan-construction time (builder() call alone):
                    py4j round trips, eager probe jobs, temp-view churn;
- ``cold_sec``    — first noop-sink write (plan+codegen+scan+exec);
- ``warm_sec``    — second noop-sink write (codegen/pagecache warm);
- ``jobs``/``stages``/``tasks`` — counted for the WARM write via the REST
                    API, so the steady-state overhead structure is visible
                    (AQE stage materializations show up as extra jobs);
- ``explain``     — .explain("formatted") saved to plans/r17/<q>_before.txt
                    (or _after.txt with --after).

Usage: python scripts/perf_profile_r17.py [--after] [--only name,name...]
Writes a JSON summary to plans/r17/profile_<before|after>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from energy_data_stream_processing_spark.plans.catalog import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_profiling_spark() -> SparkSession:
    """get_spark()'s config surface + the UI (REST metrics source)."""
    from energy_data_stream_processing_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    # get_spark reads no UI env var; build the same session with UI on by
    # pre-creating the builder here (first session in the process wins).
    import tempfile

    run_dir = os.path.join(tempfile.gettempdir(), f"edsp-prof-{os.getpid()}")
    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("perf-profile-r17")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.sql.warehouse.dir", os.path.join(run_dir, "warehouse"))
    )
    # mirror the rest of get_spark's confs by asking it AFTER seeding ours
    s = b.getOrCreate()
    ref = get_spark("perf-profile-r17")  # no-op reuse; confs already applied
    assert ref is s
    return s


def _rest(spark: SparkSession, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    after = "--after" in sys.argv
    only = None
    for i, a in enumerate(sys.argv):
        if a == "--only":
            only = set(sys.argv[i + 1].split(","))
    tag = "after" if after else "before"
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17")
    os.makedirs(outdir, exist_ok=True)

    # Session confs come from get_spark via the builder above.
    from energy_data_stream_processing_spark.session import get_spark  # noqa: F401

    spark = get_profiling_spark()
    spark.sparkContext.setLogLevel("ERROR")

    # bench-equivalent lightweight warmup (parquet reader + noop sink + a
    # pandas-udf worker), so cold numbers approximate the bench's per-query
    # cold path (which follows the bench's own session warmup).
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    spark.read.parquet(f"{SF_DIR}/region.parquet").write.format("noop").mode("overwrite").save()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _noop(s):
        return s

    spark.range(32).select(_noop("id")).write.format("noop").mode("overwrite").save()

    catalog = all_queries()
    headline = {n: q for n, q in catalog.items() if q.headline}
    if only:
        headline = {n: q for n, q in headline.items() if n in only}

    results = {}
    for name, q in headline.items():
        spark.sparkContext.setJobDescription(f"{name}: cold")
        t0 = time.perf_counter()
        df = q.builder(spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()

        jobs_before = {j["jobId"] for j in _rest(spark, "jobs")}
        spark.sparkContext.setJobDescription(f"{name}: warm")
        t3 = time.perf_counter()
        df2 = q.builder(spark, SF_DIR)
        t4 = time.perf_counter()
        df2.write.format("noop").mode("overwrite").save()
        t5 = time.perf_counter()
        jobs = [j for j in _rest(spark, "jobs") if j["jobId"] not in jobs_before]
        n_stages = sum(len(j["stageIds"]) for j in jobs)
        n_tasks = sum(j["numTasks"] for j in jobs)

        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(df2._sc._jvm.PythonSQLUtils.explainString(
                df2._jdf.queryExecution(), "formatted"))

        results[name] = {
            "build_sec": round(t1 - t0, 3),
            "cold_sec": round(t2 - t1, 3),
            "build2_sec": round(t4 - t3, 3),
            "warm_sec": round(t5 - t4, 3),
            "warm_jobs": len(jobs),
            "warm_stages": n_stages,
            "warm_tasks": n_tasks,
        }
        print(f"{name:32s} build={t1-t0:6.3f} cold={t2-t1:6.3f} "
              f"build2={t4-t3:6.3f} warm={t5-t4:6.3f} "
              f"jobs={len(jobs)} stages={n_stages} tasks={n_tasks}", flush=True)

    with open(os.path.join(outdir, f"profile_{tag}.json"), "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
