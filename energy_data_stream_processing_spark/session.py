"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads); the
same settings are what we would ship as cluster defaults:

- AQE on (runtime re-plan, skew-join handling, shuffle coalescing);
- shuffle partitions sized to cores locally — on a real cluster this becomes
  ``spark.sql.adaptive.coalescePartitions`` + a high initial partition count
  so 100 TB shuffles can split finer than the default 200;
- UTC session timezone so event-time bucketing is deterministic and matches
  the DuckDB oracle (naive timestamps);
- Arrow enabled for the few Pandas-UDF paths (multimodal plumbing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "energy-spark", shuffle_partitions: int | None = None) -> SparkSession:
    import tempfile

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    parts = str(shuffle_partitions or cpus)
    # Keep session byproducts (spark-warehouse/ from saveAsTable, Derby's
    # derby.log/metastore_db) out of the caller's cwd: root them under a
    # per-process scratch dir instead of littering the repo.
    run_dir = os.path.join(
        os.environ.get("SPARK_GRAFT_SCRATCH", tempfile.gettempdir()),
        f"edsp-spark-{os.getpid()}",
    )
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", os.path.join(run_dir, "warehouse"))
        .config(
            "spark.driver.extraJavaOptions", f"-Dderby.system.home={run_dir}"
        )
        .getOrCreate()
    )
