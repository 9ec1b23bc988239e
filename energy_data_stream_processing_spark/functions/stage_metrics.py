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
    count with recorded attempts), ``jobs`` (job ids), ``result``
    (``fn``'s return value) and ``peak_execution_memory_bytes`` — the MAX
    single-stage peak execution memory (sort/agg/join buffer high-water
    mark; a max, not a sum, because stages of one job run sequentially and
    summing would overstate concurrent pressure). Byte totals are
    executor-aggregated across all task attempts of each stage's LAST
    attempt.
    """
    sc = spark.sparkContext
    group = f"stage-metrics-{uuid.uuid4().hex[:12]}"
    prior_group = sc.getLocalProperty("spark.jobGroup.id")
    prior_desc = sc.getLocalProperty("spark.job.description")
    sc.setJobGroup(group, "stage-metrics capture")
    try:
        result = fn()
    finally:
        # restore the caller's group (None clears) so cancellation scoping
        # and UI attribution outside this capture are untouched
        sc.setLocalProperty("spark.jobGroup.id", prior_group)
        sc.setLocalProperty("spark.job.description", prior_desc)
    # the AppStatusStore is fed asynchronously off the listener bus; drain it
    # so jobs/stages whose completion events are still queued are not missed
    # (undercounted bytes would pass the byte-budget gates vacuously)
    spark._jsc.sc().listenerBus().waitUntilEmpty(30_000)
    tracker = sc.statusTracker()
    jobs = sorted(tracker.getJobIdsForGroup(group))
    stage_ids = set()
    for j in jobs:
        info = tracker.getJobInfo(j)
        if info:
            stage_ids.update(info.stageIds)
    stage_ids = sorted(stage_ids)
    store = spark._jsc.sc().statusStore()
    totals = dict.fromkeys(METRIC_FIELDS, 0)
    recorded = 0
    peak_mem = 0
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
        peak_mem = max(peak_mem, s.peakExecutionMemory())
    return {
        **totals,
        "peak_execution_memory_bytes": peak_mem,
        "stages": recorded,
        "jobs": jobs,
        "result": result,
    }


def run_to_noop(df) -> None:
    """Materialize a DataFrame end-to-end without driver collection — the
    action ``measure_job_metrics`` callables should use for plan-cost
    measurement (the ``noop`` sink executes every operator, returns
    nothing)."""
    df.write.format("noop").mode("overwrite").save()


def run_stream_with_state_metrics(
    spark: SparkSession, streaming_df, mode: str = "update", timeout_s: int = 300
) -> tuple[Any, list[dict]]:
    """Execute a streaming DataFrame with ``availableNow`` into a memory
    sink and return ``(result_table_df, per_batch_state_metrics)``.

    The streaming counterpart of ``measure_job_metrics``: where that sums
    shuffle bytes per batch job, this captures the STATE STORE accounting
    Spark reports per micro-batch (``StreamingQueryProgress
    .stateOperators``) — the numbers that decide whether a stateful
    operator survives an unbounded stream. Each returned dict has
    ``batch_id``, ``input_rows``, ``watermark`` and one
    ``(operator, rows_total, rows_updated, rows_removed, memory_bytes)``
    tuple list under ``operators``. State-free streams return entries with
    empty ``operators`` lists.

    Uses only public API (``query.recentProgress``), so unlike
    ``measure_job_metrics`` it is Spark-Connect-portable. Two guards
    (round-10 advice): the run is bounded by ``timeout_s`` — a wedged
    availableNow stream surfaces as an error with the query stopped, not a
    suite hang — and the returned series is VERIFIED COMPLETE against the
    last batch id: ``recentProgress`` retains only
    ``spark.sql.streaming.numRecentProgressUpdates`` entries (default 100),
    so a replay with more micro-batches than that would silently drop its
    earliest batches and corrupt the plateau/monotonicity shapes callers
    assert on; that now raises instead.
    """
    name = f"state_metrics_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(
                f"availableNow stream still running after {timeout_s}s "
                "(wedged stream; see query.lastProgress for the stuck batch)"
            )
    finally:
        q.stop()
    progress = list(q.recentProgress)
    ids = sorted(p.batchId for p in progress)
    last = q.lastProgress
    # Anchored at batch 0 BY CONSTRUCTION (round-11 advice): this helper
    # always starts its own query above, so ids begin at 0 and eviction
    # (recentProgress drops the OLDEST entries, leaving a contiguous
    # suffix) is exactly what the 0-anchor catches. Do NOT relax this to
    # min(ids)-anchoring — a truncated fresh series IS a contiguous
    # suffix and would pass. The check is wrong only for a checkpoint-
    # RESUMED query (ids continue from the prior run), which cannot reach
    # this code path; if this guard is ever extracted for resumed
    # queries, it needs the query's own starting batch id, not 0.
    if last is not None and ids != list(range(last.batchId + 1)):
        raise RuntimeError(
            f"recentProgress is incomplete: saw batch ids {ids} but the "
            f"last batch id is {last.batchId} — raise "
            "spark.sql.streaming.numRecentProgressUpdates above the "
            "micro-batch count (or lower n_chunks); a truncated series "
            "would silently corrupt state-accounting shapes"
        )
    batches: list[dict] = []
    for p in progress:
        batches.append(
            {
                "batch_id": p.batchId,
                "input_rows": p.numInputRows,
                "trigger_ms": (p.durationMs or {}).get("triggerExecution"),
                "watermark": (p.eventTime or {}).get("watermark"),
                "operators": [
                    {
                        "operator": s.operatorName,
                        "rows_total": s.numRowsTotal,
                        "rows_updated": s.numRowsUpdated,
                        "rows_removed": s.numRowsRemoved,
                        "memory_bytes": s.memoryUsedBytes,
                    }
                    for s in (p.stateOperators or [])
                ],
            }
        )
    return spark.table(name), batches


def state_rows_series(batches: list[dict], operator: str | None = None) -> list[int]:
    """Per-batch total state rows (summed across state operators, or one
    named operator) from ``run_stream_with_state_metrics`` output — the
    series whose SHAPE is the scale claim: bounded operators plateau,
    unbounded ones grow monotonically with keys seen."""
    out = []
    for b in batches:
        ops = [
            o
            for o in b["operators"]
            if operator is None or o["operator"] == operator
        ]
        out.append(sum(o["rows_total"] for o in ops))
    return out
