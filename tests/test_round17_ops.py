"""Round-17 optimization gates.

Focused tests for the operator internals this round changed (round rules:
an optimization that changes an operator's internals gets its own test):

- empty-micro-batch skip in the durable sinks (foreach_batch_upsert /
  foreach_batch_sharded_flush) — store contents and replay idempotence
  unchanged, only the per-trigger write-commit overhead goes;
- the reliable-checkpoint swap for the curation pipeline (r16 verdict
  item 8 — a tested code path, not prose);
- the per-JVM parse memo for the unrolled similarity expressions;
- the stateful streams' input projection (only the columns the state
  function reads cross the Python boundary);
- the round-16 advice regression: two frames built from the SAME memoized
  gateway-column list composed into ONE plan (shared Alias exprIds must
  not mis-bind or fail analysis).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from energy_data_stream_processing_spark.sources.sinks import (
    foreach_batch_sharded_flush,
    foreach_batch_upsert,
)


def test_upsert_sink_skips_empty_batch(spark, tmp_path):
    """An empty micro-batch must leave NO store directory behind (no
    write job ran) and a later non-empty batch must land normally."""
    store = str(tmp_path / "hours")
    fn = foreach_batch_upsert(store)

    hours = spark.createDataFrame(
        [("2024-06-01 10:00:00",)], "h string"
    ).select(F.col("h").cast("timestamp").alias("hour"), F.lit(7).alias("m"))

    fn(hours.where(F.lit(False)), 0)  # empty batch
    assert not os.path.exists(store), "empty batch must not write the store"

    fn(hours, 1)
    got = spark.read.parquet(store)
    assert got.count() == 1 and got.select("m").first()["m"] == 7

    # replayed empty batch after a non-empty one: store untouched
    before = sorted(os.listdir(store))
    fn(hours.where(F.lit(False)), 2)
    assert sorted(os.listdir(store)) == before


def test_sharded_flush_skips_empty_batch(spark, tmp_path):
    """The sharded staged flush must not create staging (nor run its
    dynamic-overwrite commit) for a batch with zero evicted partials."""
    staging = str(tmp_path / "staging")
    store = str(tmp_path / "hours")
    fn = foreach_batch_sharded_flush(staging, metrics_path=store)

    from energy_data_stream_processing_spark.streaming.runner import (
        SHARD_PARTIAL_SCHEMA,
    )

    empty = spark.createDataFrame([], SHARD_PARTIAL_SCHEMA)
    fn(empty, 0)
    assert not os.path.exists(staging) and not os.path.exists(store)


def test_curation_reliable_checkpoint_result_identical(spark, sf_dir, tmp_path):
    """checkpoint='reliable' (the cluster swap for localCheckpoint) must
    produce the identical curated doc set."""
    from energy_data_stream_processing_spark.plans.sampling_queries import (
        curated_document_set,
    )

    sc = spark.sparkContext
    prev = sc._jsc.sc().getCheckpointDir()
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        rel = sorted(
            r["doc_id"]
            for r in curated_document_set(spark, sf_dir, checkpoint="reliable")
            .select("doc_id")
            .collect()
        )
    finally:
        if prev.isDefined():
            sc.setCheckpointDir(prev.get())
    local = sorted(
        r["doc_id"]
        for r in curated_document_set(spark, sf_dir, checkpoint=True)
        .select("doc_id")
        .collect()
    )
    assert rel == local and len(rel) > 0


def test_parsed_expr_memoizes_per_gateway(spark):
    """parsed_expr returns the SAME Column object for the same SQL within
    one JVM, a fresh one after a (simulated) gateway restart, and its
    values match a fresh F.expr parse."""
    from energy_data_stream_processing_spark.functions import columns as C
    from energy_data_stream_processing_spark.operators.similarity import (
        cosine_expr,
        parsed_expr,
    )

    sql = cosine_expr("q", "v", dim=4, cast=True)
    first = parsed_expr(sql)
    assert parsed_expr(sql) is first

    # stale-gateway simulation: identity check forces a rebuild
    C._GATEWAY_MEMO[f"parsed-expr:{sql}"] = (object(), first)
    rebuilt = parsed_expr(sql)
    assert rebuilt is not first

    df = spark.range(3).selectExpr(
        "transform(sequence(0, 3), i -> cast(id + i AS float)) AS q",
        "transform(sequence(0, 3), i -> cast(2 * id + i AS float)) AS v",
    )
    got = [r[0] for r in df.select(parsed_expr(sql)).collect()]
    want = [r[0] for r in df.select(F.expr(sql)).collect()]
    assert got == want


def test_stateful_input_projection_matches_state_fn(spark):
    """_STATE_INPUT_COLS must cover exactly what _stateful_update_fn reads
    (plus the watermark column): the bounded stream built over a frame
    carrying EXTRA columns (event_id, channel) must not reference them
    above the source in its analyzed plan."""
    from energy_data_stream_processing_spark.streaming.runner import (
        _STATE_INPUT_COLS,
        hourly_metrics_stateful_bounded_stream,
    )

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr(
            "value AS event_id",
            "timestamp AS event_time",
            "'click' AS event_type",
            "cast(null AS decimal(10,2)) AS payment_amount",
            "cast(null AS decimal(10,3)) AS energy_consumed",
            "cast(value % 10 AS int) AS session_id",
            "concat('CUST', value % 5) AS customer_id",
            "cast(null AS string) AS tariff_type",
            "'web_portal' AS channel",
        )
    )
    out = hourly_metrics_stateful_bounded_stream(src)
    plan = out._jdf.queryExecution().analyzed().toString()
    # everything ABOVE the watermark (the state operator and its keyed
    # projections) must not mention the pruned columns; they may of course
    # appear in the user projection below it
    above_watermark = plan.split("EventTimeWatermark", 1)[0]
    assert "event_id" not in above_watermark, above_watermark
    assert "channel" not in above_watermark, above_watermark
    assert set(_STATE_INPUT_COLS) == {
        "event_time", "event_type", "payment_amount", "energy_consumed",
        "session_id", "customer_id", "tariff_type",
    }


def test_gateway_columns_two_frames_one_plan(spark):
    """Round-16 advice: Column.alias pins an exprId at construction, so
    every plan built from a memoized gateway-column list shares those
    exprIds. Composing TWO such frames into ONE plan (join of two hourly
    slices) must analyze and bind each side to its own input."""
    from energy_data_stream_processing_spark.operators.hourly import (
        hourly_business_metrics,
    )

    def mk(values):
        return spark.createDataFrame(
            [(f"2024-06-01 0{i}:00:00", f"CUST{i}", "bill_payment", v)
             for i, v in enumerate(values)],
            "et string, customer_id string, event_type string, pay double",
        ).selectExpr(
            "cast(et AS timestamp) AS event_time",
            "customer_id",
            "event_type",
            "cast(pay AS decimal(10,2)) AS payment_amount",
            "cast(null AS decimal(10,3)) AS energy_consumed",
            "cast(1 AS int) AS session_id",
            "cast(null AS string) AS tariff_type",
        )

    a = hourly_business_metrics(mk([10.0, 20.0]))
    b = hourly_business_metrics(mk([300.0, 400.0]))
    joined = a.alias("a").join(b.alias("b"), "hour", "inner").select(
        "hour", F.col("a.total_payments"), F.col("b.total_payments")
    )
    rows = {
        (str(r[0]), r[1], r[2]) for r in joined.collect()
    }
    assert rows == {
        ("2024-06-01 00:00:00", 10.0, 300.0),
        ("2024-06-01 01:00:00", 20.0, 400.0),
    }, rows
