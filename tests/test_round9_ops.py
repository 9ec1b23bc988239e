"""Round 9: reference-sample replay fidelity + measured shuffle byte gates.

Part 1 — the reference's OWN sample corpus replayed through the engine.

Every prior correctness gate runs on the driver's synthetic testdata mapped
through the energy adapter. This module closes the remaining fidelity gap at
the INPUT boundary: the literal 220-event ``data/events.jsonl`` the reference
ships (219 newlines + an unterminated final record — the reference README's
"219" count misses the last line; producer/producer.py:41-53 reads exactly
this file). The sample goes through the
engine's real ingestion surface — JSONL envelope scan, dead-letter split,
exact stateful hourly aggregation — and the result is pinned three ways:

- against reference-derived constants (event counts per type, valid/invalid
  split, bucket count) computed from the sample file itself;
- Spark batch vs DuckDB running the SAME oracle SQL over the flattened
  valid rows (engine-independent value check);
- streaming (applyInPandasWithState over a paced 2-file JSONL stream) vs
  batch, the standard differential.

The live-PostgreSQL leg of the same replay (metrics + dead letters flushed
into the reference's schema on a real server) lives in
``test_postgres_live.py::test_reference_sample_end_to_end_live``.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

REF_SAMPLE = "/root/reference/data/events.jsonl"
# One full pass over data/events.jsonl (220 lines, no trailing-newline loss;
# reference README.md:176-184 describes the same run): per-type counts and
# the hour-bucket count are properties of the FILE, derived independently of
# the code under test and pinned here as constants.
SAMPLE_TYPE_COUNTS = {
    "view_tariffs": 37,
    "user_login": 35,
    "tariff_switch": 34,
    "user_logout": 27,
    "energy_consumed": 27,
    "incentive_claim": 30,
    "bill_payment": 30,
}
SAMPLE_VALID = 220  # every line passes F1/F2 validation
SAMPLE_HOURS = 125  # distinct event-time hours (span 2025-05-29..2025-06-05)
MALFORMED_LINE = "not a json line at all"  # reference data/bad_events.log:2

# Scoped to the sample-replay tests only (NOT module-wide: the shuffle
# gates below run on driver testdata and need no reference checkout).
needs_ref_sample = pytest.mark.skipif(
    not os.path.exists(REF_SAMPLE), reason="reference sample not present"
)


@pytest.fixture()
def ingest_dir(tmp_path):
    """The sample file plus a second file carrying the reference's recorded
    dead-letter line — two files so maxFilesPerTrigger=1 forces the
    streaming leg across a real micro-batch boundary."""
    d = tmp_path / "ingest"
    d.mkdir()
    shutil.copy(REF_SAMPLE, d / "events.jsonl")
    (d / "tail.jsonl").write_text(MALFORMED_LINE + "\n")
    return str(d)


def _split_sample(spark, ingest_dir):
    from energy_data_stream_processing_spark.operators.validation import (
        split_events,
    )
    from energy_data_stream_processing_spark.sources.jsonl import (
        read_events_jsonl,
    )

    return split_events(read_events_jsonl(spark, ingest_dir))


@needs_ref_sample
def test_reference_sample_validation_accounting(spark, ingest_dir):
    valid, invalid = _split_sample(spark, ingest_dir)
    got_types = {
        r["event_type"]: r["n"]
        for r in valid.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got_types == SAMPLE_TYPE_COUNTS
    assert valid.count() == SAMPLE_VALID
    bad = invalid.collect()
    assert len(bad) == 1
    assert bad[0]["reason"] == "Malformed JSON"
    # tariff_switch / incentive_claim rows in the sample carry no
    # payment_amount — they must still be VALID (the reference requires
    # tariff_type, not payment, for these types: consumer.py:102-110) and
    # flatten to NULL payments, not zeros.
    null_pay = (
        valid.where(F.col("event_type") == "tariff_switch")
        .where(F.col("payment_amount").isNull())
        .count()
    )
    assert null_pay == SAMPLE_TYPE_COUNTS["tariff_switch"]


@needs_ref_sample
def test_reference_sample_hourly_batch_vs_duckdb(spark, ingest_dir, tmp_path):
    import duckdb

    from energy_data_stream_processing_spark.operators.hourly import (
        HOURLY_ORACLE_BODY,
        hourly_business_metrics,
    )

    valid, _ = _split_sample(spark, ingest_dir)
    got = hourly_business_metrics(valid)
    assert got.count() == SAMPLE_HOURS

    flat = str(tmp_path / "valid.parquet")
    valid.write.parquet(flat)
    oracle = (
        "WITH energy_events AS "
        f"(SELECT * FROM read_parquet('{flat}/*.parquet')) "
        f"SELECT * FROM ({HOURLY_ORACLE_BODY}) ORDER BY hour"
    )
    want = duckdb.sql(oracle).fetchall()
    cols = [f.name for f in got.schema.fields]
    rows = [tuple(r[c] for c in cols) for r in got.orderBy("hour").collect()]
    assert len(rows) == len(want) == SAMPLE_HOURS
    for spark_row, duck_row in zip(rows, want):
        assert spark_row[0] == duck_row[0]  # hour
        for c, s, d in zip(cols[1:], spark_row[1:], duck_row[1:]):
            assert float(s) == pytest.approx(float(d), abs=1e-9), (spark_row[0], c)


@needs_ref_sample
def test_reference_sample_stream_matches_batch(spark, ingest_dir):
    from pyspark.sql.window import Window

    from energy_data_stream_processing_spark.operators.hourly import (
        hourly_business_metrics,
    )
    from energy_data_stream_processing_spark.operators.validation import (
        split_events,
    )
    from energy_data_stream_processing_spark.sources.jsonl import (
        CORRUPT_COL,
        ENVELOPE_SCHEMA,
    )
    from energy_data_stream_processing_spark.streaming.runner import (
        hourly_metrics_stateful_stream,
        run_stream_to_table,
    )

    raw = (
        spark.readStream.schema(ENVELOPE_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("maxFilesPerTrigger", 1)
        .json(ingest_dir)
    )
    valid_stream, _ = split_events(raw)
    out = run_stream_to_table(
        spark, hourly_metrics_stateful_stream(valid_stream)
    )
    w = Window.partitionBy("hour").orderBy(F.col("update_seq").desc())
    final = (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "update_seq")
    )

    valid_batch, _ = _split_sample(spark, ingest_dir)
    want = {
        r["hour"]: r.asDict()
        for r in hourly_business_metrics(valid_batch).collect()
    }
    got = {r["hour"]: r.asDict() for r in final.collect()}
    assert set(got) == set(want) and len(got) == SAMPLE_HOURS
    for hour, row in got.items():
        for c, v in row.items():
            if c == "hour":
                continue
            assert float(v) == pytest.approx(
                float(want[hour][c]), abs=1e-9
            ), (hour, c)


# ---------------------------------------------------------------------------
# Measured shuffle accounting: SCALE.md §2's collapse claims as byte gates.
# ---------------------------------------------------------------------------

# (query, shuffle_write upper bound in bytes at sf0.01). Measured values sit
# 4-6x below each bound (calibration: scripts/shuffle_accounting_probe.py at
# sf0.01 — total_energy_trend 14.8 KB, hourly_business_metrics 339 KB,
# rolling_24h 198 KB, customer_view 688 KB / twophase 834 KB / prefilter
# 627 KB, user_sessions 254 KB, shipping_priority 37 KB, pricing_insights
# 54 KB, dedup_exact 23 KB, dedup_minhash_lsh 157 KB, dedup_ngram_jaccard
# 812 KB, cosine_topk 2.3 KB, ann_ivf 42 KB, packing 155 B — against a
# 221 KB events scan). The bounds stay meaningful: a plan that stops
# collapsing map-side (or shuffles the fact where it should shuffle hours,
# or re-grows an all-pairs join) blows through them immediately.
SHUFFLE_GATES = [
    ("total_energy_trend", 64 * 1024),
    ("revenue_rollup", 64 * 1024),
    ("hourly_business_metrics", 1536 * 1024),
    ("hourly_business_metrics_twophase", 2 * 1024 * 1024),
    ("rolling_24h_metrics", 1024 * 1024),
    ("customer_view", 3 * 1024 * 1024),
    ("customer_view_twophase", 4 * 1024 * 1024),
    ("customer_view_prefilter", 3 * 1024 * 1024),
    ("user_sessions", 1024 * 1024),
    ("shipping_priority", 192 * 1024),
    ("pricing_insights", 256 * 1024),
    ("dedup_exact", 128 * 1024),
    ("dedup_minhash_lsh", 768 * 1024),
    ("dedup_ngram_jaccard", 4 * 1024 * 1024),
    ("embedding_cosine_topk", 16 * 1024),
    ("ann_ivf_topk", 256 * 1024),
    ("sequence_packing_audit", 8 * 1024),
    # training-pipeline composed operators (first-class in the coverage
    # story): measured 7-340 KB at sf0.01 against a 580 KB documents scan —
    # every one collapses to vocab-/bin-/panel-sized frames before the wire
    ("corpus_curation_pipeline", 256 * 1024),
    ("semantic_dedup_keep", 96 * 1024),
    ("greedy_sequence_packing", 64 * 1024),
    ("tfidf_top_terms", 1536 * 1024),
    ("bm25_search", 384 * 1024),
    ("epoch_shuffle_assignment", 320 * 1024),
    ("dedup_simhash", 320 * 1024),
    ("unigram_surprisal_filter", 1536 * 1024),
    ("label_cap_sample", 48 * 1024),
    ("embedding_gram_matrix", 192 * 1024),
]


@pytest.mark.parametrize("name,bound", SHUFFLE_GATES)
def test_shuffle_volume_and_spill_gates(spark, name, bound):
    """The map-side-collapse story, measured: each family representative
    must move fewer shuffle bytes than its gate (hours-/audit-sized, never
    fact-sized) and spill NOTHING at test scale. This is the byte-level
    twin of test_plans.py's exchange-count gates."""
    from energy_data_stream_processing_spark.functions.stage_metrics import (
        measure_job_metrics,
        run_to_noop,
    )
    from energy_data_stream_processing_spark.plans.catalog import all_queries

    df = all_queries()[name].builder(spark, "/root/testdata/sf0.01")
    m = measure_job_metrics(spark, lambda: run_to_noop(df))
    assert m["stages"] >= 1 and m["jobs"], "no jobs captured for the query"
    assert m["memory_spill_bytes"] == 0 and m["disk_spill_bytes"] == 0
    assert m["shuffle_write_bytes"] <= bound, (
        f"{name} shuffled {m['shuffle_write_bytes']}B > gate {bound}B"
    )


@needs_ref_sample
def test_reference_sample_bounded_stream_matches_batch(spark, ingest_dir):
    """The bounded-state variant over the reference's OWN corpus: the same
    220-event sample through hourly_metrics_stateful_bounded_stream —
    eviction by event-time timeout, final-only append emission, a valid
    far-future sentinel event flushing the tail — must reproduce the batch
    aggregation on every one of the 125 sample hours, all 15 metrics
    including both exact distincts. Fidelity x capability cross-check: the
    snapshot-and-trim variant is proven not just on driver testdata but on
    the reference's literal inputs."""
    import json

    from energy_data_stream_processing_spark.operators.hourly import (
        hourly_business_metrics,
    )
    from energy_data_stream_processing_spark.operators.validation import (
        split_events,
    )
    from energy_data_stream_processing_spark.sources.jsonl import (
        CORRUPT_COL,
        ENVELOPE_SCHEMA,
    )
    from energy_data_stream_processing_spark.streaming.runner import (
        hourly_metrics_stateful_bounded_stream,
        run_stream_to_table,
    )

    # sentinel: a VALID far-future event (first sample line, timestamp
    # moved to 2035) in its own file — the final micro-batch pushes the
    # watermark past every real hour's timeout
    with open(REF_SAMPLE) as f:
        ev = json.loads(f.readline())
    ev["event_time"] = "2035-01-01T00:00:00.000000"
    with open(os.path.join(ingest_dir, "z_sentinel.jsonl"), "w") as f:
        f.write(json.dumps(ev) + "\n")

    raw = (
        spark.readStream.schema(ENVELOPE_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("maxFilesPerTrigger", 1)
        .json(ingest_dir)
    )
    valid_stream, _ = split_events(raw)
    out = run_stream_to_table(
        spark,
        hourly_metrics_stateful_bounded_stream(valid_stream, horizon="2 hours"),
        mode="append",
    )
    import datetime

    cut = datetime.datetime(2030, 1, 1)
    got = {r["hour"]: r for r in out.collect() if r["hour"] < cut}

    valid_batch, _ = _split_sample(spark, ingest_dir)
    # exclude the sentinel from the batch twin too (same hour filter)
    want = {
        r["hour"]: r.asDict()
        for r in hourly_business_metrics(valid_batch).collect()
        if r["hour"] < cut
    }
    assert set(got) == set(want) and len(got) == SAMPLE_HOURS
    for hour, row in got.items():
        for c in want[hour]:
            if c in ("hour", "update_seq"):
                continue
            assert float(row[c]) == pytest.approx(
                float(want[hour][c]), abs=1e-9
            ), (hour, c)
