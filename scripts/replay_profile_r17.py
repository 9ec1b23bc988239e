"""Round-17 replay-rung anatomy (guide §1: measure first).

The three streaming rungs are the bench's largest untouched cost
(driver r16: replay 13.1 s, replay_sharded 17.7 s, replay_hot 20.6 s —
VERDICT.md item 3). This harness reproduces each rung's exact bench
construction and localizes the time three ways:

1. per-micro-batch ``durationMs`` from ``StreamingQueryProgress``
   (triggerExecution / addBatch / getBatch / queryPlanning / walCommit /
   commitOffsets) plus ``stateOperators`` commit times;
2. for the sharded arm, wall-clock of each phase INSIDE the foreachBatch
   body (staging write, touched probe, merge+upsert, prune), captured by
   wrapping the sink fn;
3. totals per rung, comparable to BENCH_DETAIL.json's rungs.

Usage: python scripts/replay_profile_r17.py [--rungs replay,sharded,hot]
Writes plans/r17/replay_profile.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from energy_data_stream_processing_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def progress_summary(q) -> list[dict]:
    out = []
    for p in q.recentProgress:
        d = p.get("durationMs", {}) or {}
        so = p.get("stateOperators") or []
        out.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": d,
                "state": [
                    {
                        k: s.get(k)
                        for k in (
                            "numRowsTotal",
                            "numRowsUpdated",
                            "commitTimeMs",
                            "allUpdatesTimeMs",
                            "allRemovalsTimeMs",
                            "timeTakenToUpdateNumRows",
                        )
                        if k in s
                    }
                    for s in so
                ],
            }
        )
    return out


def main() -> None:
    rungs = {"replay", "sharded", "hot"}
    for i, a in enumerate(sys.argv):
        if a == "--rungs":
            rungs = set(sys.argv[i + 1].split(","))

    spark = get_spark("replay-profile-r17")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    from energy_data_stream_processing_spark.sources.adapter import (
        normalize_event_ts,
    )
    from energy_data_stream_processing_spark.streaming import runner as R
    from energy_data_stream_processing_spark.streaming.runner import (
        HOURS_STATE_PARTITIONS,
        append_watermark_sentinel,
        ascending_time_chunks,
        energy_events_stream,
        hourly_metrics_stateful_bounded_stream,
        run_hourly_pipeline_dispatched,
    )

    tmp_dirs: list[str] = []

    def scaled_dir() -> str:
        d = tempfile.mkdtemp(prefix="replayprof-")
        tmp_dirs.append(d)
        for t in (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "documents", "embeddings",
        ):
            os.symlink(f"{SF_DIR}/{t}.parquet", f"{d}/{t}.parquet")
        return d

    results: dict = {}
    replay_chunks = 8

    # ---- rung 1: bounded replay at 10x (memory sink) --------------------
    if "replay" in rungs:
        ladder_dir = scaled_dir()
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        (
            ev.crossJoin(spark.range(10).withColumnRenamed("id", "_rep"))
            .withColumn("event_id", F.col("event_id") * 10 + F.col("_rep"))
            .drop("_rep")
            .write.mode("overwrite")
            .parquet(f"{ladder_dir}/events.parquet")
        )
        src = ascending_time_chunks(spark, ladder_dir, replay_chunks)
        append_watermark_sentinel(spark, ladder_dir, src)
        stream_ev = energy_events_stream(
            spark, ladder_dir, source_dir=src, max_files_per_trigger=1
        )
        import uuid

        name = f"prof_{uuid.uuid4().hex[:8]}"
        prior = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(HOURS_STATE_PARTITIONS)
        )
        t0 = time.perf_counter()
        q = (
            hourly_metrics_stateful_bounded_stream(stream_ev, horizon="2 hours")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = round(time.perf_counter() - t0, 3)
        spark.conf.set("spark.sql.shuffle.partitions", prior)
        results["replay"] = {
            "wall_sec": wall,
            "batches": progress_summary(q),
        }
        print(f"replay: {wall} s", flush=True)
        shutil.rmtree(src, ignore_errors=True)

    # ---- instrumented sharded sink --------------------------------------
    from energy_data_stream_processing_spark.sources import sinks as S

    phase_log: list[dict] = []
    orig_flush = S.foreach_batch_sharded_flush

    def instrumented_flush(*args, **kwargs):
        inner = orig_flush(*args, **kwargs)

        def fn(batch_df, batch_id):
            rec = {"batch_id": batch_id}
            t0 = time.perf_counter()
            # re-implement the phases with timing (same calls as sinks.fn)
            from energy_data_stream_processing_spark.streaming.runner import (
                merge_sharded_hourly_partials,
            )

            staging_path = args[0]
            metrics_path = kwargs.get("metrics_path")
            two_stage = kwargs.get("two_stage_sessions", False)
            prune_closed = kwargs.get("prune_closed", False)
            sp = batch_df.sparkSession
            batch_df.persist()
            try:
                # mirrors sinks.foreach_batch_sharded_flush round-17 order:
                # probe first (full-plan action), write only when non-empty
                touched = [
                    r["hour_epoch_ms"]
                    for r in batch_df.select("hour_epoch_ms").distinct().collect()
                ]
                rec["touched_probe"] = round(time.perf_counter() - t0, 3)
                rec["n_touched"] = len(touched)
                if touched:
                    t1 = time.perf_counter()
                    S.overwrite_partitions(
                        batch_df.withColumn("_batch_id", F.lit(batch_id)),
                        staging_path,
                        "_batch_id",
                        "hour_epoch_ms",
                    )
                    rec["staging_write"] = round(time.perf_counter() - t1, 3)
            finally:
                batch_df.unpersist()
            if touched:
                t2 = time.perf_counter()
                staged = sp.read.parquet(staging_path).where(
                    F.col("hour_epoch_ms").isin(touched)
                )
                merged = merge_sharded_hourly_partials(
                    staged, two_stage_sessions=two_stage
                )
                if metrics_path is not None:
                    S.upsert_hourly_metrics_parquet(sp, merged, metrics_path)
                rec["merge_upsert"] = round(time.perf_counter() - t2, 3)
                if prune_closed:
                    t3 = time.perf_counter()
                    S.prune_sharded_staging(
                        staging_path,
                        max(touched) + 3_600_000,
                        keep_hours=set(touched),
                    )
                    rec["prune"] = round(time.perf_counter() - t3, 3)
            rec["total"] = round(time.perf_counter() - t0, 3)
            phase_log.append(rec)

        return fn

    hot_epoch_us = 1_699_999_200 * 1_000_000

    # ---- rung 2: sharded hot-hour at base sf -----------------------------
    if "sharded" in rungs:
        R_sinks_patched = False
        import energy_data_stream_processing_spark.streaming.runner as runner_mod

        S.foreach_batch_sharded_flush_orig = orig_flush
        S.foreach_batch_sharded_flush = instrumented_flush
        R_sinks_patched = True
        try:
            hot_dir = scaled_dir()
            (
                normalize_event_ts(spark.read.parquet(f"{SF_DIR}/events.parquet"))
                .withColumn(
                    "ts",
                    F.timestamp_micros(
                        F.lit(hot_epoch_us)
                        + F.unix_micros("ts") % F.lit(3_600_000_000)
                    ),
                )
                .write.mode("overwrite")
                .parquet(f"{hot_dir}/events.parquet")
            )
            hot_src = ascending_time_chunks(spark, hot_dir, replay_chunks)
            append_watermark_sentinel(spark, hot_dir, hot_src)
            hot_ev = energy_events_stream(
                spark, hot_dir, source_dir=hot_src, max_files_per_trigger=1
            )
            work = tempfile.mkdtemp(prefix="replayprof-sharded-")
            tmp_dirs.append(work)
            phase_log.clear()
            t0 = time.perf_counter()
            run_hourly_pipeline_dispatched(
                spark,
                hot_ev,
                metrics_path=f"{work}/hours",
                checkpoint=f"{work}/ckpt",
                variant="sharded",
                shards=32,
                horizon="2 hours",
            )
            wall = round(time.perf_counter() - t0, 3)
            results["sharded"] = {
                "wall_sec": wall,
                "sink_phases": list(phase_log),
                "progress": (
                    dict(R.LAST_STREAM_PROGRESS.get("durationMs", {}))
                    if isinstance(R.LAST_STREAM_PROGRESS, dict)
                    else None
                ),
            }
            print(f"sharded: {wall} s", flush=True)
            shutil.rmtree(hot_src, ignore_errors=True)
        finally:
            if R_sinks_patched:
                S.foreach_batch_sharded_flush = orig_flush

    # ---- rung 3: hot 10x (one rep each arm) ------------------------------
    if "hot" in rungs:
        hot10_dir = scaled_dir()
        (
            normalize_event_ts(spark.read.parquet(f"{SF_DIR}/events.parquet"))
            .crossJoin(spark.range(10).withColumnRenamed("id", "_rep"))
            .withColumn("event_id", F.col("event_id") * 10 + F.col("_rep"))
            .drop("_rep")
            .withColumn(
                "ts",
                F.timestamp_micros(
                    F.lit(hot_epoch_us)
                    + F.unix_micros("ts") % F.lit(3_600_000_000)
                ),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{hot10_dir}/events.parquet")
        )
        hot10_src = ascending_time_chunks(spark, hot10_dir, replay_chunks)
        append_watermark_sentinel(spark, hot10_dir, hot10_src)
        for hot_variant in ("sharded", "bounded"):
            patched = hot_variant == "sharded"
            if patched:
                S.foreach_batch_sharded_flush = instrumented_flush
            try:
                hot_ev_dense = energy_events_stream(
                    spark, hot10_dir, source_dir=hot10_src, max_files_per_trigger=1
                ).withColumn(
                    "customer_id",
                    F.concat(
                        F.lit("C"),
                        F.pmod(F.xxhash64("event_id"), F.lit(120_000)).cast(
                            "string"
                        ),
                    ),
                )
                hot_work = tempfile.mkdtemp(prefix=f"replayprof-hot-{hot_variant}-")
                tmp_dirs.append(hot_work)
                phase_log.clear()
                t0 = time.perf_counter()
                run_hourly_pipeline_dispatched(
                    spark,
                    hot_ev_dense,
                    metrics_path=f"{hot_work}/hours",
                    checkpoint=f"{hot_work}/ckpt",
                    variant=hot_variant,
                    peak_hour_distinct=120_000,
                    horizon="2 hours",
                )
                wall = round(time.perf_counter() - t0, 3)
                results[f"hot_{hot_variant}"] = {
                    "wall_sec": wall,
                    "sink_phases": list(phase_log) if patched else None,
                }
                print(f"hot_{hot_variant}: {wall} s", flush=True)
            finally:
                if patched:
                    S.foreach_batch_sharded_flush = orig_flush
        shutil.rmtree(hot10_src, ignore_errors=True)

    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r17",
    )
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "replay_profile.json"), "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps({k: v.get("wall_sec") for k, v in results.items()}))
    for d in tmp_dirs:
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
