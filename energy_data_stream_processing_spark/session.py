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


def _driver_java_options(run_dir: str) -> str:
    """The Derby-home flag APPENDED to any pre-existing driver Java options
    rather than replacing them: a deployment that sets
    ``spark.driver.extraJavaOptions`` in ``spark-defaults.conf`` (resolved
    via ``$SPARK_CONF_DIR`` / ``$SPARK_HOME/conf``) or through the
    ``SPARK_DRIVER_EXTRA_JAVA_OPTIONS`` environment variable keeps those
    flags; ours is added once (never duplicated on re-entry)."""
    base = os.environ.get("SPARK_DRIVER_EXTRA_JAVA_OPTIONS", "").strip()
    if not base:
        conf_dir = os.environ.get("SPARK_CONF_DIR") or (
            os.path.join(os.environ["SPARK_HOME"], "conf")
            if os.environ.get("SPARK_HOME")
            else None
        )
        if conf_dir:
            try:
                with open(os.path.join(conf_dir, "spark-defaults.conf")) as f:
                    for line in f:
                        parts = line.strip().split(None, 1)
                        if (
                            len(parts) == 2
                            and parts[0] == "spark.driver.extraJavaOptions"
                        ):
                            base = parts[1].strip()
            except OSError:
                pass
    flags = [f"-Dderby.system.home={run_dir}"]
    # Round 16 (guide §4.1/§7): HotSpot refuses to JIT-compile methods over
    # 8,000 bytecode bytes (DontCompileHugeMethods, on by default), and the
    # engine's wide codegen'd expressions — the 64-term unrolled dot/norm
    # sums in operators/similarity.py, the 15-aggregate hourly expression
    # tree — generate exactly such methods, which then run as INTERPRETED
    # bytecode (measured 14x on the brute-force cosine stage: 7.25 s -> 0.52
    # s per 1M-row dot pass, OPTIMIZATION_r16.md). Standard Spark deployment
    # tuning for generated code; scale-independent (per-row cost, not a
    # local-mode artifact). On a cluster set the same flag in
    # spark.executor.extraJavaOptions; in local mode driver == executor.
    if "DontCompileHugeMethods" not in base:  # a deployment's explicit
        flags.append("-XX:-DontCompileHugeMethods")  # choice wins
    parts = base.split()
    add = [f for f in flags if f not in parts]
    return f"{base} {' '.join(add)}".strip()


def get_spark(app_name: str = "energy-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    NOTE: ``getOrCreate()`` REUSES any live session in the process — in
    that case none of these configs (warehouse dir, Derby home, shuffle
    partitions) are applied; they only take effect for the process's FIRST
    session. Callers embedding this engine next to another Spark app get
    that app's session settings."""
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
        .config("spark.driver.extraJavaOptions", _driver_java_options(run_dir))
        .getOrCreate()
    )
