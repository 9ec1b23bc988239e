"""Command-line entrypoint: the reference's docker-compose workflows as
engine subcommands, so a user of the reference can run every piece of their
pipeline against this repo directly (see MIGRATION.md for the full map).

  python -m energy_data_stream_processing_spark list-queries [--filter S]
  python -m energy_data_stream_processing_spark run-query NAME
         [--sf-dir DIR] [--limit N] [--explain]
  python -m energy_data_stream_processing_spark oracle-check NAME [--sf-dir DIR]
  python -m energy_data_stream_processing_spark pipeline --input events.jsonl
         --output DIR [--streaming] [--lines-per-batch N]

``pipeline`` is the producer+consumer pair end-to-end: JSONL in, envelope +
semantic validation with a dead-letter quarantine, partitioned raw event
store, hourly business metrics table, and an ingest-metrics summary on
stdout (the reference's Prometheus counters, engine-side). ``--streaming``
replays the file through the custom jsonl_replay source in paced
micro-batches with checkpointed upserts — the Kafka-consumer form.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from .session import get_spark

    return get_spark("energy-cli")


def cmd_list_queries(args) -> int:
    from .plans.catalog import all_queries

    for name, q in sorted(all_queries().items()):
        if args.filter and args.filter.lower() not in name.lower():
            continue
        doc = (q.doc or "").split(". ")[0][:90]
        mark = "oracle" if q.oracle else "rows-only"
        print(f"{name:40s} [{mark}] {doc}")
    return 0


def cmd_run_query(args) -> int:
    from .plans.catalog import all_queries

    qs = all_queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; see list-queries", file=sys.stderr)
        return 2
    spark = _spark()
    df = qs[args.name].builder(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)
    return 0


def cmd_oracle_check(args) -> int:
    import duckdb

    from .plans.catalog import all_queries

    qs = all_queries()
    q = qs.get(args.name)
    if q is None:
        print(f"unknown query {args.name!r}", file=sys.stderr)
        return 2
    if q.oracle is None:
        print(f"{args.name} is a rows-only entry (no SQL oracle)")
        return 0
    spark = _spark()
    sdf = q.builder(spark, args.sf_dir)
    cols = sdf.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    srows = sorted(tuple(repr(r[i]) for i in order) for r in sdf.collect())
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")
    res = con.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
    orows = sorted(tuple(repr(r[i]) for i in oorder) for r in res.fetchall())
    ok = srows == orows and sorted(cols) == sorted(ocols)
    print(f"{args.name}: {'MATCH' if ok else 'MISMATCH'} ({len(srows)} rows)")
    return 0 if ok else 1


def cmd_pipeline(args) -> int:
    from pyspark.sql import functions as F

    from .operators.hourly import hourly_business_metrics
    from .operators.validation import split_events
    from .sources.jsonl import PAYLOAD_SCHEMA, read_events_jsonl
    from .sources.sinks import (
        refresh_hourly_incremental,
        write_quarantine,
        write_raw_events_parquet,
    )

    spark = _spark()
    out = args.output.rstrip("/")
    if args.streaming:
        from .sources.replay_source import JsonlReplayDataSource

        spark.dataSource.register(JsonlReplayDataSource)
        stream = (
            spark.readStream.format("jsonl_replay")
            .option("path", args.input)
            .option("lines_per_batch", str(args.lines_per_batch))
            .load()
        )
        counts = {"valid": 0, "invalid": 0, "batches": 0}

        def fold(batch_df, batch_id):
            s = batch_df.sparkSession
            # reconstruct the envelope frame the batch validators expect;
            # envelope-invalid replay rows go straight to the dead letter
            envelope = batch_df.where(F.col("valid")).select(
                "event_type",
                "event_time",
                F.from_json("payload", PAYLOAD_SCHEMA).alias("payload"),
                F.lit(None).cast("string").alias("_corrupt"),
            )
            transport_bad = batch_df.where(~F.col("valid")).select(
                F.col("raw"), F.col("reason")
            )
            valid, invalid = split_events(envelope)
            n_valid = valid.count()
            counts["valid"] += n_valid
            counts["invalid"] += invalid.count() + transport_bad.count()
            counts["batches"] += 1
            write_quarantine(
                invalid.select(F.to_json(F.struct("*")).alias("raw"), "reason")
                .unionByName(transport_bad),
                f"{out}/dead_letter",
            )
            if n_valid:
                # idempotent landing + touched-hour recompute (exact
                # distincts across batches — no additive-merge drift)
                refresh_hourly_incremental(
                    s, f"{out}/raw_events", f"{out}/hourly_metrics",
                    valid, increment_id=f"b{batch_id}",
                )

        # NOT availableNow: that trigger snapshots latestOffset once, but
        # this source paces by advancing the offset lines_per_batch per
        # trigger — processAllAvailable() drives triggers until the file is
        # drained, preserving the multi-micro-batch replay.
        q = (
            stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", f"{out}/_checkpoint")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        print(json.dumps({"mode": "streaming", **counts, "output": out}))
    else:
        raw = read_events_jsonl(spark, args.input)
        valid, invalid = split_events(raw)
        write_raw_events_parquet(valid, f"{out}/raw_events")
        write_quarantine(
            invalid.select(F.to_json(F.struct("*")).alias("raw"), "reason"),
            f"{out}/dead_letter",
        )
        metrics = hourly_business_metrics(valid)
        metrics.write.mode("overwrite").parquet(f"{out}/hourly_metrics")
        print(
            json.dumps(
                {
                    "mode": "batch",
                    "valid": valid.count(),
                    "invalid": invalid.count(),
                    "hours": spark.read.parquet(f"{out}/hourly_metrics").count(),
                    "output": out,
                }
            )
        )
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="energy_data_stream_processing_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lq = sub.add_parser("list-queries")
    lq.add_argument("--filter", default=None)
    lq.set_defaults(fn=cmd_list_queries)

    rq = sub.add_parser("run-query")
    rq.add_argument("name")
    rq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    rq.add_argument("--limit", type=int, default=20)
    rq.add_argument("--explain", action="store_true")
    rq.set_defaults(fn=cmd_run_query)

    oc = sub.add_parser("oracle-check")
    oc.add_argument("name")
    oc.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    oc.set_defaults(fn=cmd_oracle_check)

    pl = sub.add_parser("pipeline")
    pl.add_argument("--input", required=True)
    pl.add_argument("--output", required=True)
    pl.add_argument("--streaming", action="store_true")
    pl.add_argument("--lines-per-batch", type=int, default=100)
    pl.set_defaults(fn=cmd_pipeline)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
