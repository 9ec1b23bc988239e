"""Job-scoped stage-metric capture: shuffle / spill / input accounting.

The reference instruments its pipeline with per-event Prometheus counters
(consumer/consumer.py:29-35); the engine's row-level twin is
``functions/observe.py``. This module is the PLAN-level counterpart: it
captures, for exactly the jobs a callable triggers, the executor-aggregated
stage metrics Spark already tracks — shuffle bytes written/read, memory and
disk spill, scan input bytes — via the driver's AppStatusStore.

This is the measurement tool behind SCALE.md §2's shuffle-accounting table:
instead of asserting "the hourly aggregate collapses map-side" from the
plan shape alone, tests and ``scripts/shuffle_accounting_probe.py`` check
the actual bytes that crossed (or didn't cross) the wire.

Scope: driver-side tooling for classic (py4j) sessions — it reads
``SparkContext`` internals, so it is not Spark-Connect-portable. Metrics
for stages SKIPPED via exchange reuse are (correctly) absent: a reused
shuffle moved no new bytes.
"""

from __future__ import annotations

import uuid
from typing import Any, Callable

from pyspark.sql import SparkSession

METRIC_FIELDS = (
    "shuffle_write_bytes",
    "shuffle_read_bytes",
    "memory_spill_bytes",
    "disk_spill_bytes",
    "input_bytes",
    "output_bytes",
)


def measure_job_metrics(
    spark: SparkSession, fn: Callable[[], Any]
) -> dict[str, int | list[int] | Any]:
    """Run ``fn`` (which must execute Spark actions) inside a unique job
    group and return the summed stage metrics of exactly those jobs.

    Returns a dict with ``METRIC_FIELDS`` totals plus ``stages`` (stage
    count with recorded attempts), ``jobs`` (job ids) and ``result``
    (``fn``'s return value). Byte totals are executor-aggregated across all
    task attempts of each stage's LAST attempt.
    """
    sc = spark.sparkContext
    group = f"stage-metrics-{uuid.uuid4().hex[:12]}"
    sc.setJobGroup(group, "stage-metrics capture")
    try:
        result = fn()
    finally:
        sc.setJobGroup(f"{group}-done", "stage-metrics capture done")
    tracker = sc.statusTracker()
    jobs = sorted(tracker.getJobIdsForGroup(group))
    stage_ids = sorted(
        {
            sid
            for j in jobs
            for sid in (tracker.getJobInfo(j).stageIds if tracker.getJobInfo(j) else [])
        }
    )
    store = spark._jsc.sc().statusStore()
    totals = dict.fromkeys(METRIC_FIELDS, 0)
    recorded = 0
    for sid in stage_ids:
        try:
            s = store.lastStageAttempt(sid)
        except Exception:  # noqa: BLE001 — skipped stage: no attempt, no bytes moved
            continue
        recorded += 1
        totals["shuffle_write_bytes"] += s.shuffleWriteBytes()
        totals["shuffle_read_bytes"] += s.shuffleReadBytes()
        totals["memory_spill_bytes"] += s.memoryBytesSpilled()
        totals["disk_spill_bytes"] += s.diskBytesSpilled()
        totals["input_bytes"] += s.inputBytes()
        totals["output_bytes"] += s.outputBytes()
    return {**totals, "stages": recorded, "jobs": jobs, "result": result}


def run_to_noop(df) -> None:
    """Materialize a DataFrame end-to-end without driver collection — the
    action ``measure_job_metrics`` callables should use for plan-cost
    measurement (the ``noop`` sink executes every operator, returns
    nothing)."""
    df.write.format("noop").mode("overwrite").save()
