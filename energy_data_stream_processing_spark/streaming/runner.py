"""Structured Streaming surface (SURVEY.md §2.5).

The reference consumer is a hand-rolled streaming engine: Kafka poll loop,
``Dict[hour, HourlyStats]`` under a lock, 30 s flush thread with an additive
SQL upsert (consumer/consumer.py:240-415). Spark-first, that is:

- ``readStream`` file/Kafka source -> the same adapter/validation transforms
  as batch (transforms are source-agnostic DataFrames);
- **native path**: event-time window + watermark aggregation — counters and
  sums exact, distinct counts via ``approx_count_distinct`` (Spark's
  streaming agg does not allow exact distincts; documented divergence);
- **stateful path**: ``applyInPandasWithState`` keyed by hour holding
  exact distinct sets + counters — the faithful ``HourlyStats`` machine,
  with the reference's merge bugs fixed (true distincts across flushes,
  GREATEST peak instead of last-write-wins; SURVEY.md §2.3 fidelity
  warnings). Money stays exact: cents/milli-units integers in state, one
  correctly-rounded double conversion on emit — bit-identical to the batch
  DECIMAL path, so the streaming query shares the batch oracle SQL.

The catalog entry runs the stateful query with ``availableNow`` into a
memory sink and returns the final per-hour rows: the batch==streaming
equivalence the reference can only approximate is an actual differential
gate here.

Scale notes: state is one row per (hour) group — tiny; the distinct sets
bound memory by |customers-per-hour| (at 100 TB: swap the sets for HLL
sketches or pre-aggregate by (hour, customer), and keep RocksDB state
store). Watermark 24 h mirrors the reference's eviction horizon
(consumer/consumer.py:377-381).
"""

from __future__ import annotations

import math
import os
import tempfile
import uuid
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.hourly import METRIC_COLUMNS
from ..sources.adapter import ENERGY_EVENTS_SQL, normalize_event_ts
from ..sources.sinks import _conf_override, overwrite_partitions
from ..plans.catalog import register

OUTPUT_SCHEMA = StructType(
    [
        StructField("hour", TimestampType(), False),
        # True epoch ms of the hour start, carried through the group key.
        # The naive session-tz `hour` label is LOSSY on a DST fall-back
        # (two epoch hours share one wall label); this column is the
        # tz-proof identity the stream builders reconstruct `hour` from
        # (and which sinks can key on). Round-11 advice fix.
        StructField("hour_epoch_ms", LongType(), False),
        StructField("update_seq", LongType(), False),
    ]
    + [
        StructField(c, LongType() if c in {
            "tariff_switches", "incentive_claims", "green_tariff_switches",
            "active_customers", "new_sessions", "total_logins", "payment_events",
        } else DoubleType(), False)
        for c in METRIC_COLUMNS
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("tariff_switches", LongType(), False),
        StructField("switch_revenue_cents", LongType(), False),
        StructField("incentive_claims", LongType(), False),
        StructField("incentive_cents", LongType(), False),
        StructField("green_switches", LongType(), False),
        StructField("total_logins", LongType(), False),
        StructField("energy_milli", LongType(), False),
        StructField("peak_milli", LongType(), False),
        StructField("payment_cents", LongType(), False),
        StructField("payment_events", LongType(), False),
        StructField("customers", ArrayType(StringType()), False),
        StructField("sessions", ArrayType(LongType()), False),
        StructField("update_seq", LongType(), False),
    ]
)

# Per-(hour, shard) PARTIAL emitted by the sharded hot-hour variant
# (round-11 verdict item 6): raw integer accumulators — the same
# quantized representation the state carries — plus the shard's exact
# distinct-customer COUNT (shards are customer-hash-disjoint, so counts
# add) and its exact session ID SET (sessions are only customer-scoped
# by convention, not by schema, so cross-shard exactness needs the set;
# the merge dedups across shards). Emitted ONCE per (hour, shard) at
# eviction, never rewritten.
SHARD_PARTIAL_SCHEMA = StructType(
    [
        StructField("hour", TimestampType(), False),
        StructField("hour_epoch_ms", LongType(), False),
        StructField("shard", LongType(), False),
        StructField("update_seq", LongType(), False),
        StructField("tariff_switches", LongType(), False),
        StructField("switch_revenue_cents", LongType(), False),
        StructField("incentive_claims", LongType(), False),
        StructField("incentive_cents", LongType(), False),
        StructField("green_switches", LongType(), False),
        StructField("total_logins", LongType(), False),
        StructField("energy_milli", LongType(), False),
        StructField("peak_milli", LongType(), False),
        StructField("payment_cents", LongType(), False),
        StructField("payment_events", LongType(), False),
        StructField("n_customers", LongType(), False),
        StructField("sessions", ArrayType(LongType()), False),
    ]
)


def stream_raw_events(
    spark: SparkSession,
    sf_dir: str,
    source_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream source over the driver's events parquet.

    The file source needs a directory; testdata is a single read-only file,
    so a session-scoped temp dir of symlinks stands in (test plumbing only —
    production would point at the ingest directory or a Kafka topic).
    ``source_dir``/``max_files_per_trigger`` let tests replay a pre-split
    directory in several micro-batches to exercise cross-batch state.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if source_dir is None:
        source_dir = tempfile.mkdtemp(prefix="stream-events-")
        os.symlink(f"{sf_dir}/events.parquet", f"{source_dir}/events.parquet")
        schema_src = f"{sf_dir}/events.parquet"
    else:
        # Pre-split chunk dirs (ascending_time_chunks) hold vintage-NORMALIZED
        # ts; inferring from the raw events.parquet would mismatch under the
        # nanos-long vintage (ts:bigint vs chunk INT96/micros timestamps).
        schema_src = source_dir
    batch_schema = spark.read.parquet(schema_src).schema
    reader = spark.readStream.schema(batch_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(source_dir)
    return normalize_event_ts(raw)


def energy_events_stream(
    spark: SparkSession,
    sf_dir: str,
    source_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    raw = stream_raw_events(spark, sf_dir, source_dir, max_files_per_trigger)
    view = f"events_stream_{uuid.uuid4().hex[:8]}"
    raw.createOrReplaceTempView(view)
    return spark.sql(ENERGY_EVENTS_SQL.replace("FROM events", f"FROM {view}"))


def hourly_metrics_native_stream(
    events: DataFrame, watermark: str = "24 hours", with_emit_ordinal: bool = False
) -> DataFrame:
    """Built-in watermarked window aggregation (the idiomatic default).

    Exact for counters/sums; distincts are HLL approximations — at 100 TB
    this is usually the right trade (documented divergence from the exact
    batch/stateful results). ``watermark`` is the lateness horizon: it
    bounds BOTH late-data acceptance and state size (windows older than
    the watermark evict — measured in
    tests/test_round9_ops.py::test_watermark_eviction_bounds_window_state).

    ``with_emit_ordinal=True`` appends ``_rows_total`` — the window's
    cumulative row count. Update mode re-emits a window only when NEW rows
    fold into it, so the count strictly increases across a window's
    emissions: it is the per-window emission ordinal the memory sink does
    not otherwise provide, which ``collapse_native_updates`` needs to keep
    the LAST (final) emission without assuming sums are monotone.
    """
    t = F.col("event_type")
    pay = F.col("payment_amount")
    energy = F.col("energy_consumed")
    ordinal = (
        [F.count(F.lit(1)).alias("_rows_total")] if with_emit_ordinal else []
    )
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "1 hour"))
        .agg(
            F.count(F.when(t == "tariff_switch", 1)).alias("tariff_switches"),
            F.coalesce(F.sum(F.when(t == "tariff_switch", pay)).cast("double"), F.lit(0.0)).alias(
                "total_switch_revenue"
            ),
            F.count(F.when(t == "incentive_claim", 1)).alias("incentive_claims"),
            F.count(F.when(t == "user_login", 1)).alias("total_logins"),
            F.approx_count_distinct("customer_id").alias("active_customers_approx"),
            F.approx_count_distinct(F.when(t == "user_login", F.col("session_id"))).alias(
                "new_sessions_approx"
            ),
            F.coalesce(F.sum(F.when(t == "energy_consumed", energy)).cast("double"), F.lit(0.0)).alias(
                "total_energy_consumed"
            ),
            F.coalesce(F.sum(F.when(t == "bill_payment", pay)).cast("double"), F.lit(0.0)).alias(
                "total_payments"
            ),
            *ordinal,
        )
        .select(F.col("window.start").alias("hour"), "*")
        .drop("window")
    )


def collapse_native_updates(out: DataFrame) -> DataFrame:
    """Collapse the native stream's update-mode memory sink to one FINAL row
    per hour, ordered by the ``_rows_total`` emission ordinal.

    Each update-mode re-emission of a window is CUMULATIVE, and a window
    re-emits only when new rows folded into it, so its cumulative row count
    strictly increases across emissions — ``max_by`` on it keeps the last
    emission WHOLESALE. The round-14 collapse took per-column ``max()`` on
    the stated ground that every column is non-decreasing; that holds for
    counters and HLL register maxima but NOT for sums once a negative
    value (meter corrections / exports — the ``PEAK_NONE_MILLI`` rationale)
    arrives in a later micro-batch: the cumulative sum DECREASES and
    ``max()`` keeps the stale earlier partial, under exactly the
    multi-batch split the dedup exists to defend against (r14 verdict
    item 2; regression pinned in tests/test_round15_ops.py::
    test_native_collapse_keeps_last_emission_under_negative_values).
    """
    cols = [c for c in out.columns if c not in ("hour", "_rows_total")]
    fin = F.max_by(
        F.struct(*[F.col(c) for c in cols]), F.col("_rows_total")
    ).alias("_fin")
    return (
        out.groupBy("hour")
        .agg(fin)
        .select("hour", *[F.col(f"_fin.{c}").alias(c) for c in cols])
    )


#: State sentinel for "no energy rows seen yet". The batch oracle's
#: coalesce(max(energy), 0) floors ONLY when no energy rows exist; a
#: 0-seeded max() would also floor a genuinely negative peak (meter
#: corrections / exports), silently diverging from the oracle. The
#: sentinel loses max() to any real milli value and renders as 0.0 at
#: emission; it flows through shard partials so the downstream merge
#: keeps the same rule.
PEAK_NONE_MILLI = -(1 << 62)


def _stateful_update_fn(final_only: bool = False, shard_partial: bool = False):
    """Closure (pickled by value — workers never import this package).

    ``final_only=True`` is the bounded-state flavor: merge batches emit
    NOTHING; the hour's single final row emits when its event-time timeout
    fires (the watermark passed the hour end), after which the state row is
    REMOVED. Requires ``outputMode="append"`` +
    ``GroupStateTimeout.EventTimeTimeout`` at the call site.

    ``shard_partial=True`` (implies ``final_only``) is the hot-hour
    sharded flavor: the key is ``(hour, hour_epoch_ms, shard)`` and the
    eviction emits a RAW PARTIAL (``SHARD_PARTIAL_SCHEMA``) instead of
    derived metrics — ``merge_sharded_hourly_partials`` folds the shards
    back into the exact hourly row downstream of the state function.

    Keyed by ``(hour, hour_epoch_ms)``: the naive session-tz ``hour``
    label arrives lossy (a DST fall-back maps TWO epoch hours onto one
    wall label, and ``getCurrentWatermarkMs``/``setTimeoutTimestamp``
    speak true epoch), so the JVM side computes the hour start's epoch ms
    (``cast(hour as long) * 1000`` — tz-independent: Spark timestamps are
    internal epoch micros) and carries it in the key. ``key[1]`` makes the
    timeout arithmetic exact and the output rows tz-proof with no
    ambiguous re-localization anywhere (round-10/11 advice)."""
    if shard_partial and not final_only:
        raise ValueError(
            "shard_partial emits once per (hour, shard) at eviction — it "
            "requires final_only=True (append-mode EventTimeTimeout)"
        )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def f64(series: pd.Series):
            """DECIMAL/object column -> float64 array with NaN for nulls.

            Arrow hands DECIMAL columns to the state function as
            object-dtype ``decimal.Decimal`` cells; ``pd.to_numeric``
            converts them one object at a time over the WHOLE column
            (measured 30 ms per 100k-row chunk at the real 23% non-null
            payment density). Converting only the non-null cells through
            numpy's C loop is ~5x faster (6 ms), value-identical — and a
            cheap passthrough when the column already arrives numeric.
            (Defined inside the closure: the update fn is pickled by
            value; workers never import this package.)"""
            a = series.to_numpy()
            if a.dtype != object:
                return a.astype(np.float64, copy=False)
            out = np.full(len(a), np.nan)
            m = pd.notna(a)
            out[m] = a[m].astype(np.float64)
            return out
        def final_row(ts, src, ic, icc, gs, tl, em, pk, pc, pe, n_cust, n_sess, seq):
            def r2(x: float) -> float:
                return math.floor(x * 100.0 + 0.5) / 100.0

            switch_rev = src / 100.0
            incentive = icc / 100.0
            energy_total = em / 1000.0
            payments = pc / 100.0
            return pd.DataFrame(
                [
                    {
                        "hour": key[0],
                        "hour_epoch_ms": int(key[1]),
                        "update_seq": seq,
                        "tariff_switches": ts,
                        "total_switch_revenue": switch_rev,
                        "avg_switch_value": r2(switch_rev / ts) if ts else 0.0,
                        "incentive_claims": ic,
                        "total_incentive_payouts": incentive,
                        "green_tariff_switches": gs,
                        "active_customers": n_cust,
                        "new_sessions": n_sess,
                        "total_logins": tl,
                        "total_energy_consumed": energy_total,
                        "avg_consumption_per_customer": r2(energy_total / n_cust) if n_cust else 0.0,
                        "peak_hour_usage": (
                            pk / 1000.0 if pk != PEAK_NONE_MILLI else 0.0
                        ),
                        "total_payments": payments,
                        "payment_events": pe,
                        "avg_payment_amount": r2(payments / pe) if pe else 0.0,
                    }
                ]
            )

        def partial_row(ts, src, ic, icc, gs, tl, em, pk, pc, pe, customers, sessions, seq):
            return pd.DataFrame(
                [
                    {
                        "hour": key[0],
                        "hour_epoch_ms": int(key[1]),
                        "shard": int(key[2]),
                        "update_seq": seq,
                        "tariff_switches": ts,
                        "switch_revenue_cents": src,
                        "incentive_claims": ic,
                        "incentive_cents": icc,
                        "green_switches": gs,
                        "total_logins": tl,
                        "energy_milli": em,
                        "peak_milli": pk,
                        "payment_cents": pc,
                        "payment_events": pe,
                        "n_customers": len(customers),
                        "sessions": sorted(sessions),
                    }
                ]
            )

        if final_only and state.hasTimedOut:
            (ts, src, ic, icc, gs, tl, em, pk, pc, pe, customers, sessions, seq) = state.get
            state.remove()
            if shard_partial:
                yield partial_row(
                    ts, src, ic, icc, gs, tl, em, pk, pc, pe,
                    customers, sessions, seq,
                )
            else:
                yield final_row(
                    ts, src, ic, icc, gs, tl, em, pk, pc, pe,
                    len(customers), len(sessions), seq,
                )
            return

        if state.exists:
            (ts, src, ic, icc, gs, tl, em, pk, pc, pe, customers, sessions, seq) = state.get
            cust, sess = set(customers), set(sessions)
        else:
            ts = src = ic = icc = gs = tl = em = pc = pe = seq = 0
            pk = PEAK_NONE_MILLI
            cust, sess = set(), set()
        seq += 1

        for pdf in pdfs:
            # Vectorized per Arrow chunk (round 10): pandas masks +
            # int64 sums replace the former per-event Python loop — the
            # last interpreted per-row path any catalog entry crossed
            # (reference twin consumer/consumer.py:240-293). Quantization
            # is bit-identical to the scalar form it replaced: DECIMAL ->
            # float64, * 100 (or * 1000), half-even rounding per element
            # (np.round == Python round on float64 — both round-half-even,
            # and DECIMAL(10,2)*100 never lands on an exact .5 anyway),
            # then exact int64 accumulation.
            # one factorize pass replaces five object-string equality scans
            # (measured 3 ms vs 21.5 ms per 100k-row chunk)
            codes, uniques = pd.factorize(pdf["event_type"])
            code_of = {v: i for i, v in enumerate(uniques)}

            def m(name: str):
                return codes == code_of.get(name, -2)

            pay_cents = np.round(f64(pdf["payment_amount"]) * 100.0)
            # NaN marks absent payment
            has_pay = ~np.isnan(pay_cents)
            is_switch = m("tariff_switch")
            is_claim = m("incentive_claim")
            is_login = m("user_login")
            is_energy = m("energy_consumed")
            is_bill = m("bill_payment")

            ts += int(is_switch.sum())
            src += int(pay_cents[is_switch & has_pay].astype(np.int64).sum())
            gs += int((is_switch & (pdf["tariff_type"] == "green").to_numpy()).sum())
            ic += int(is_claim.sum())
            icc += int(pay_cents[is_claim & has_pay].astype(np.int64).sum())
            tl += int(is_login.sum())
            # unique() first: the C hash pass collapses the chunk before
            # the Python set sees it (chunk rows >> distincts per hour)
            sess.update(
                int(s) for s in pdf.loc[is_login, "session_id"].dropna().unique()
            )
            en = f64(pdf["energy_consumed"])
            en_milli = np.round(en[is_energy & ~np.isnan(en)] * 1000.0).astype(np.int64)
            em += int(en_milli.sum())
            if en_milli.size:
                pk = max(pk, int(en_milli.max()))  # GREATEST merge (reference bug fixed)
            paid = is_bill & has_pay
            pc += int(pay_cents[paid].astype(np.int64).sum())
            pe += int(paid.sum())
            cust.update(pdf["customer_id"].dropna().unique())

        state.update((ts, src, ic, icc, gs, tl, em, pk, pc, pe, sorted(cust), sorted(sess), seq))

        if final_only:
            # Evict as soon as the watermark passes the hour end: lateness
            # tolerance = the withWatermark delay, state held no longer than
            # (hour + delay). An hour already below the watermark (late rows
            # re-opened it) times out at the next batch boundary. key[1] is
            # the hour start's TRUE epoch ms (computed JVM-side before the
            # groupBy), so the hour-end arithmetic is exact in every
            # session tz — including the DST fall-back wall hour, whose two
            # occurrences arrive as two distinct keys here (pinned in
            # test_stateful_bounded_hourly_dst_fall_back).
            hour_end_ms = int(key[1]) + 3_600_000
            state.setTimeoutTimestamp(max(hour_end_ms, state.getCurrentWatermarkMs() + 1))
            return

        yield final_row(
            ts, src, ic, icc, gs, tl, em, pk, pc, pe, len(cust), len(sess), seq
        )

    return update


#: Exactly the columns ``_stateful_update_fn`` reads (plus ``event_time``,
#: which carries the watermark). Projected BEFORE the stateful groupBy so
#: the per-batch shuffle and the Arrow transfer into the Python state
#: function ship only what the function needs (guide §4.1: Spark cannot
#: see inside the UDF, so unused columns — event_id, channel — would
#: otherwise cross the boundary on every micro-batch; round 17).
_STATE_INPUT_COLS = (
    "event_time",
    "event_type",
    "payment_amount",
    "energy_consumed",
    "session_id",
    "customer_id",
    "tariff_type",
)


def _hour_keyed(events: DataFrame) -> DataFrame:
    """hour (naive label) + hour_epoch_ms (tz-proof identity) group keys.

    ``cast(hour as long)`` reads the internal epoch micros — session-tz
    independent — so the pair keeps the two occurrences of a DST
    fall-back wall hour distinct all the way through the Python state
    function and back."""
    return events.withColumn(
        "hour", F.date_trunc("hour", F.col("event_time"))
    ).withColumn("hour_epoch_ms", F.col("hour").cast("long") * F.lit(1000))


def _epoch_hour_restored(out: DataFrame) -> DataFrame:
    """Rebuild ``hour`` from the tz-proof epoch key and drop the helper.

    The pandas->Spark conversion of the NAIVE hour label re-localizes
    through the session tz, which on a DST fall-back collapses the two
    ambiguous rows onto one instant; ``timestamp_millis(hour_epoch_ms)``
    restores each row's true instant WITHIN Spark, so the two fall-back
    rows stay distinct TimestampType values (round-10 advice). That alone
    does not cover a transport that re-renders the instant through a
    local tz: ``foreach_batch_statement_upsert`` therefore binds ``hour``
    as an epoch-derived NAIVE UTC WALL TIME (sinks.py — naive on purpose:
    an aware datetime adapts to ``timestamptz`` and PostgreSQL's
    assignment cast to a naive TIMESTAMP column re-renders through the
    session tz, re-colliding the two instants), so the statement
    dialects' ``hour`` PK never collides either (round-11 verdict
    item 2)."""
    return out.withColumn(
        "hour", F.timestamp_millis(F.col("hour_epoch_ms"))
    ).drop("hour_epoch_ms")


def hourly_metrics_stateful_stream(events: DataFrame) -> DataFrame:
    """Exact HourlyStats as a custom stateful operator
    (applyInPandasWithState keyed by event-time hour)."""
    return _epoch_hour_restored(
        _hour_keyed(
            events.select(*_STATE_INPUT_COLS).withWatermark(
                "event_time", "24 hours"
            )
        )
        .groupBy("hour", "hour_epoch_ms")
        .applyInPandasWithState(
            _stateful_update_fn(),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def hourly_metrics_stateful_bounded_stream(
    events: DataFrame, horizon: str = "2 hours"
) -> DataFrame:
    """Exact HourlyStats with BOUNDED state: the snapshot-and-trim variant.

    Same merge logic and EXACT distincts as ``hourly_metrics_stateful_stream``
    (the reference's additive flush, consumer.py:341-356), but each hour's
    state self-evicts by event-time timeout once the watermark passes the
    hour end — ``horizon`` is the lateness tolerance AND the state-retention
    bound. Merge batches emit nothing; the single final row per hour emits
    at eviction (append mode), so downstream sinks never see retractions.

    The trade, measured in tests/test_state_accounting.py: the unbounded
    twin holds hours-cardinality state forever; this plateaus at the open
    horizon. Rows arriving LATER than the horizon are DROPPED before they
    reach the state function — Spark filters watermark-late input whenever
    event-time timeouts are active (FlatMapGroupsWithStateExec; measured in
    test_stateful_bounded_hourly_drops_beyond_horizon_rows: the late batch
    reports zero state updates) — so the semantics match the native
    windowed aggregation's lateness contract, with exact distincts instead
    of HLL. Pick by lateness regime: bounded when the replay horizon is
    known, unbounded (NoTimeout twin, which Spark does NOT late-filter)
    when any-lateness exactness is worth hours-cardinality state
    (8,760 rows/year — trivially small either way)."""
    return _epoch_hour_restored(
        _hour_keyed(
            events.select(*_STATE_INPUT_COLS).withWatermark(
                "event_time", horizon
            )
        )
        .groupBy("hour", "hour_epoch_ms")
        .applyInPandasWithState(
            _stateful_update_fn(final_only=True),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def hourly_metrics_stateful_sharded_stream(
    events: DataFrame, horizon: str = "2 hours", shards: int = 8
) -> DataFrame:
    """Hot-hour-bounded variant of the exact bounded stream (round-11
    verdict item 6, SCALE.md §5.1's top 1000x hazard): the exact distinct
    ID sets live INSIDE each hour's state row, so one hot hour at 100 TB
    is a multi-MB row re-serialized by a single task on every touched
    micro-batch. This variant salts the state key to
    ``(hour, hour_epoch_ms, shard)`` with ``shard =
    pmod(xxhash64(customer_id), shards)``: each state row holds ~1/shards
    of the hot hour's sets (measured in scripts/hot_hour_shard_probe.py),
    and the per-batch state rewrite parallelizes across state partitions
    instead of serializing on one.

    Exactness is preserved by construction, not assumption: customers are
    hash-DISJOINT across shards (counts add); sessions are NOT provably
    disjoint (a session_id could span customers), so each shard emits its
    exact session SET and ``merge_sharded_hourly_partials`` dedups across
    shards — the merged row is bit-identical to the unsharded twin's (and
    the batch oracle's) for any input. Emission stays final-only
    append-mode: one raw partial per (hour, shard) at eviction, merged
    DOWNSTREAM of the state function (post-collect or foreachBatch), so
    the merge itself holds no streaming state."""
    keyed = _hour_keyed(
        events.select(*_STATE_INPUT_COLS).withWatermark("event_time", horizon)
    ).withColumn(
        "shard", F.pmod(F.xxhash64(F.col("customer_id")), F.lit(shards))
    )
    return keyed.groupBy("hour", "hour_epoch_ms", "shard").applyInPandasWithState(
        _stateful_update_fn(final_only=True, shard_partial=True),
        outputStructType=SHARD_PARTIAL_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def merge_sharded_hourly_partials(
    partials: DataFrame, two_stage_sessions: bool = False
) -> DataFrame:
    """Fold per-(hour, shard) raw partials into the exact hourly metrics.

    Numeric identity with ``final_row`` (and hence the batch oracle): the
    accumulators arrive in the state's quantized integer units (cents /
    milli), sums stay exact int64, the three ratio metrics re-derive with
    the same ``floor(x*100 + 0.5)/100`` half-up rounding on float64, and
    ``peak`` is a max — all order- and shard-count-independent.
    ``n_customers`` ADDS (shards partition the customer hash space);
    sessions dedup across shards via array union, exact regardless of
    whether session ids are customer-scoped.

    Merge-side memory bound (round-12 advice): the default session dedup
    (``collect_list`` + ``flatten`` + ``array_distinct``) reassembles each
    hour's FULL session set in ONE aggregation buffer — sharding moved the
    multi-MB hot-hour payload off the state row, but this merge form moves
    it onto the merge task. Fine through ~10^5 distinct ids per hour
    (single-digit MB); for hotter hours pass ``two_stage_sessions=True``:
    the session count then computes via ``explode`` + ``count_distinct``,
    which Spark plans as distributed two-phase partial dedup (no
    whole-set buffer anywhere), joined back to the hours-sized accumulator
    frame. Both forms are value-identical on any input
    (tests/test_round13_ops.py); the two-stage form costs one extra
    hours-sized shuffle+join, so it is opt-in, not the default."""
    r2 = lambda c: F.floor(c * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)  # noqa: E731
    sums = [
        F.sum("tariff_switches").alias("ts"),
        F.sum("switch_revenue_cents").alias("src"),
        F.sum("incentive_claims").alias("ic"),
        F.sum("incentive_cents").alias("icc"),
        F.sum("green_switches").alias("gs"),
        F.sum("total_logins").alias("tl"),
        F.sum("energy_milli").alias("em"),
        F.max("peak_milli").alias("pk"),
        F.sum("payment_cents").alias("pc"),
        F.sum("payment_events").alias("pe"),
        F.sum("n_customers").alias("n_cust"),
    ]
    if two_stage_sessions:
        # renamed key: both branches share the partials lineage, and a
        # same-name join on a self-derived frame trips attribute-conflict
        # analysis
        sess = (
            partials.select(
                F.col("hour_epoch_ms").alias("_sess_h"),
                F.explode_outer("sessions").alias("_sid"),
            )
            .groupBy("_sess_h")
            .agg(F.count_distinct("_sid").alias("n_sess"))
        )
        agg = (
            partials.groupBy("hour_epoch_ms")
            .agg(*sums)
            .join(sess, F.col("hour_epoch_ms") == F.col("_sess_h"), "left")
            .drop("_sess_h")
            .withColumn("n_sess", F.coalesce(F.col("n_sess"), F.lit(0)))
        )
    else:
        agg = partials.groupBy("hour_epoch_ms").agg(
            *sums,
            F.size(
                F.array_distinct(F.flatten(F.collect_list("sessions")))
            ).alias("n_sess"),
        )
    switch_rev = F.col("src") / F.lit(100.0)
    energy_total = F.col("em") / F.lit(1000.0)
    payments = F.col("pc") / F.lit(100.0)
    return agg.select(
        F.timestamp_millis(F.col("hour_epoch_ms")).alias("hour"),
        F.col("ts").alias("tariff_switches"),
        switch_rev.alias("total_switch_revenue"),
        F.when(F.col("ts") > 0, r2(switch_rev / F.col("ts")))
        .otherwise(F.lit(0.0))
        .alias("avg_switch_value"),
        F.col("ic").alias("incentive_claims"),
        (F.col("icc") / F.lit(100.0)).alias("total_incentive_payouts"),
        F.col("gs").alias("green_tariff_switches"),
        F.col("n_cust").alias("active_customers"),
        F.col("n_sess").cast("long").alias("new_sessions"),
        F.col("tl").alias("total_logins"),
        energy_total.alias("total_energy_consumed"),
        F.when(F.col("n_cust") > 0, r2(energy_total / F.col("n_cust")))
        .otherwise(F.lit(0.0))
        .alias("avg_consumption_per_customer"),
        F.when(F.col("pk") != F.lit(PEAK_NONE_MILLI), F.col("pk") / F.lit(1000.0))
        .otherwise(F.lit(0.0))
        .alias("peak_hour_usage"),
        payments.alias("total_payments"),
        F.col("pe").alias("payment_events"),
        F.when(F.col("pe") > 0, r2(payments / F.col("pe")))
        .otherwise(F.lit(0.0))
        .alias("avg_payment_amount"),
    )


#: Engine default for HOURS-keyed stateful streams (round-11 verdict item 1).
#:
#: ``applyInPandasWithState`` pays one Arrow/Python state-function round per
#: STATE PARTITION per micro-batch — near-empty partitions included — so a
#: stream whose live-key count is far below ``spark.sql.shuffle.partitions``
#: burns fixed dispatch cost proportional to the partition count, not the
#: data (SCALE.md §4.3: the 10x bounded hourly replay reads 21.1 s at the
#: 32-partition session default vs 14.6 s at 8, ~100 live hour keys;
#: reproducible via scripts/streaming_replay_partition_probe.py). Hour keys
#: live at most (watermark horizon + open hour) at a time — single-to-low
#: double digits — so 8 keeps every partition busy while still spreading the
#: state store. USER-keyed streams (sessionization, SCD2, dedup, running
#: totals) have key cardinality >> the session default and keep it.
HOURS_STATE_PARTITIONS = 8

#: Final ``StreamingQueryProgress`` of the last ``run_stream_to_table``
#: call (``q.lastProgress``, read synchronously after awaitTermination —
#: no listener race). Tests pin engine choices through it, e.g. that the
#: hourly twins really ran with ``numShufflePartitions == 8``.
#: SEQUENTIAL-ONLY contract (same as the shuffle-partition override it
#: rides along with): this is a module global mutated by every
#: ``run_stream_to_table`` call, so two concurrent streams on one session
#: (or threaded tests) would race and a reader could see the OTHER
#: query's progress. In-tree callers are sequential; concurrent callers
#: must capture ``q.lastProgress`` from their own query handle instead.
LAST_STREAM_PROGRESS: dict | None = None


def run_stream_to_table(
    spark: SparkSession,
    streaming_df: DataFrame,
    mode: str = "update",
    state_partitions: int | None = None,
) -> DataFrame:
    """Execute with availableNow into a memory sink; return final rows per
    hour (last update wins, keyed by micro-batch order).

    ``state_partitions`` sizes the stateful operator's state-store count to
    the stream's live-key cardinality class (pass
    ``HOURS_STATE_PARTITIONS`` for hours-keyed streams). It must be applied
    HERE, not as an upstream ``repartition``: stateful operators require
    ``StatefulOpClusteredDistribution`` with exactly the shuffle-partition
    count captured at first query start (then pinned in the checkpoint), so
    a pre-shuffle cannot change it — the engine instead scopes
    ``spark.sql.shuffle.partitions`` for this query's lifetime and restores
    the session value afterwards. The override is session-visible while the
    blocking call runs; callers that plan OTHER queries concurrently on the
    same session should pin their own conf (in-tree callers are
    sequential)."""
    global LAST_STREAM_PROGRESS
    # cleared up front so a failed start/execution cannot leave a PREVIOUS
    # query's progress behind for a caller to mis-validate against
    LAST_STREAM_PROGRESS = None
    name = f"sink_{uuid.uuid4().hex[:8]}"
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            streaming_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        LAST_STREAM_PROGRESS = q.lastProgress
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prior)
    return spark.table(name)


#: Per-hour distinct-customer count at/above which the dispatcher takes
#: the SHARDED exact variant (round-12 verdict item 2: SCALE.md §4.4's
#: measured decision table made engine behavior). The measured poles: at
#: a planted hot hour (~60k distinct ids folded into ONE event-time hour)
#: sharding reads 9.1 s vs 13.1 s unsharded with the per-row
#: serialization unit divided ~10.5x; at normal density (sf0.1 spread
#: over its real hours, ~hundreds of ids/hour) sharding is 2.7x SLOWER
#: with 4.7x the state — pure per-key dispatch tax. 50k sits below the
#: measured hot-hour win and orders of magnitude above every normal-hours
#: reading: the point where the single state row (~ids x ~20 B) enters
#: the MB class whose per-batch single-task rewrite the variant exists to
#: break up.
HOT_HOUR_SHARD_THRESHOLD = 50_000

#: Batch-aware crossover for the TURNKEY pipeline (round-15 verdict item
#: 4): the bounded arm's cost driver is one python worker absorbing the
#: hot key's whole micro-batch serially plus its cardinality-sized state
#: row, so the win sharding buys scales with rows-per-trigger ×
#: cardinality — a PRODUCT, not cardinality alone. Measured poles at
#: sf0.1 (SCALE.md §4.4, medians of 3 interleaved reps per arm): the
#: arms TIE (bounded/sharded 0.98) at ~68k ids × 12.5k rows/trigger
#: (product 8.5e8 — the sharded arm's staged flush eats the state win at
#: small batches) and sharding WINS 1.47× at 120k ids × 125k
#: rows/trigger (product 1.5e10). 4e9 is the geometric midpoint of the
#: two measured products, rounded. The rule applies only when the caller
#: can state expected rows-per-trigger; with it unknown the dispatch
#: falls back to the cardinality-only rule (the pre-r16 behavior — at
#: ≥50k ids sharding is never the measured-loss arm, only sometimes a
#: tie, so cardinality-only stays the safe default).
HOT_HOUR_SHARD_MIN_PRODUCT = 4_000_000_000

#: Shard sizing rule (SCALE.md §4.4 rule of thumb, quantized): 8 shards
#: per 100k hot-hour distinct ids — floor 8 so every HOURS state
#: partition owns work, cap 64 (= 8 partitions x 8) past which the §4.3
#: per-key dispatch tax outgrows the serialization win at any measured
#: density.
SHARD_IDS_BUDGET = 100_000


def shard_count_for(peak_hour_distinct: int) -> int:
    return min(64, max(8, 8 * math.ceil(peak_hour_distinct / SHARD_IDS_BUDGET)))


def estimate_peak_hour_distinct_customers(events: DataFrame) -> int:
    """Cheap density probe for the stateful dispatch — the streaming twin
    of ``estimate_events_per_customer`` (customer_view_dispatch): per-hour
    approx-distinct customers, maxed over hours. One narrow two-column job
    (at 100 TB it reads only the event_time/customer_id pages; HLL's ±2%
    is irrelevant against a threshold set orders of magnitude from both
    measured poles). Must run on a BATCH frame — a backfill slice or
    yesterday's landing of the SAME feed — because a streaming frame
    cannot be eagerly aggregated; callers that already know their density
    pass ``peak_hour_distinct`` instead."""
    row = (
        events.groupBy(F.date_trunc("hour", F.col("event_time")).alias("_h"))
        .agg(F.approx_count_distinct("customer_id").alias("_c"))
        .agg(F.max("_c").alias("_m"))
        .first()
    )
    return int(row["_m"] or 0)


#: Decision record of the last ``run_hourly_stream_dispatched`` call
#: ({"variant", "shards", "peak_hour_distinct", "state_partitions",
#: "two_stage_sessions"}). Same SEQUENTIAL-ONLY contract as
#: ``LAST_STREAM_PROGRESS`` above.
LAST_HOURLY_DISPATCH: dict | None = None


def run_hourly_stream_dispatched(
    spark: SparkSession,
    events: DataFrame,
    variant: str = "auto",
    horizon: str = "2 hours",
    peak_hour_distinct: int | None = None,
    probe_df: DataFrame | None = None,
    shards: int | None = None,
    two_stage_sessions: bool | None = None,
    expected_rows_per_trigger: int | None = None,
) -> DataFrame:
    """Density-dispatched exact bounded hourly stream (round-12 verdict
    item 2): run the BOUNDED twin at normal per-hour key density, the
    SHARDED hot-hour variant (+ downstream merge) when one hour's distinct
    customer set would make a single state row the serialization
    bottleneck — the stateful analogue of ``customer_view_dispatch``'s
    density probe. All paths share the batch oracle; the dispatch only
    picks the physical strategy.

    - ``variant="auto"`` decides from ``peak_hour_distinct`` (pass it when
      known) or probes ``probe_df`` — a BATCH slice of the same feed —
      via ``estimate_peak_hour_distinct_customers``; ≥
      ``HOT_HOUR_SHARD_THRESHOLD`` takes sharded with
      ``shard_count_for(peak)`` shards (override with ``shards``).
      When ``expected_rows_per_trigger`` is also given, the rule is
      batch-aware: sharding additionally requires the cardinality ×
      rows-per-trigger product to clear ``HOT_HOUR_SHARD_MIN_PRODUCT``
      (below it the measured arms tie and bounded is cheaper to operate
      — see the constant's docstring and SCALE.md §4.4).
    - ``variant="bounded"`` / ``"sharded"`` are the explicit opt-outs.
    - sharded state partitions scale with the live-key multiplication
      (hours x shards; §4.3's sizing rule), bounded keeps
      ``HOURS_STATE_PARTITIONS``.
    - ``two_stage_sessions`` defaults to True when the decided/declared
      density reaches ~10^5 ids (the merge-side buffer bound documented on
      ``merge_sharded_hourly_partials``).

    Returns final hourly rows (merged when sharded, ``update_seq``
    dropped when bounded); the decision is recorded in
    ``LAST_HOURLY_DISPATCH`` for tests/observability."""
    global LAST_HOURLY_DISPATCH
    LAST_HOURLY_DISPATCH = None
    decision = decide_hourly_variant(
        variant=variant,
        peak_hour_distinct=peak_hour_distinct,
        probe_df=probe_df,
        shards=shards,
        two_stage_sessions=two_stage_sessions,
        expected_rows_per_trigger=expected_rows_per_trigger,
    )
    if decision["variant"] == "sharded":
        out = run_stream_to_table(
            spark,
            hourly_metrics_stateful_sharded_stream(
                events, horizon=horizon, shards=decision["shards"]
            ),
            mode="append",
            state_partitions=decision["state_partitions"],
        )
        result = merge_sharded_hourly_partials(
            out, two_stage_sessions=decision["two_stage_sessions"]
        )
    else:
        out = run_stream_to_table(
            spark,
            hourly_metrics_stateful_bounded_stream(events, horizon=horizon),
            mode="append",
            state_partitions=decision["state_partitions"],
        )
        result = out.drop("update_seq")
    LAST_HOURLY_DISPATCH = decision
    return result


def decide_hourly_variant(
    variant: str = "auto",
    peak_hour_distinct: int | None = None,
    probe_df: DataFrame | None = None,
    shards: int | None = None,
    two_stage_sessions: bool | None = None,
    expected_rows_per_trigger: int | None = None,
) -> dict:
    """The dispatch DECISION, factored out so the memory-sink runner and
    the durable pipeline share one rule (see run_hourly_stream_dispatched
    for the semantics). Returns {variant, peak_hour_distinct, shards,
    state_partitions, two_stage_sessions, expected_rows_per_trigger}.

    ``expected_rows_per_trigger`` makes the auto rule BATCH-AWARE
    (round-15 verdict item 4): at hot cardinality, sharding is taken only
    when ``peak_hour_distinct × expected_rows_per_trigger`` clears
    ``HOT_HOUR_SHARD_MIN_PRODUCT`` — below it the staged flush eats the
    state win and the measured arms tie, so bounded (no staging store, no
    re-merge) is the cheaper-to-operate choice. Pass the feed's typical
    rows per micro-batch (file sources: rows per file ×
    maxFilesPerTrigger; rate/kafka: rows-per-second × trigger interval);
    omit it to keep the cardinality-only rule."""
    if variant == "auto":
        if peak_hour_distinct is None:
            if probe_df is None:
                raise ValueError(
                    "variant='auto' needs peak_hour_distinct or probe_df (a "
                    "batch slice of the feed) — a streaming frame cannot be "
                    "probed eagerly"
                )
            peak_hour_distinct = estimate_peak_hour_distinct_customers(probe_df)
        hot = peak_hour_distinct >= HOT_HOUR_SHARD_THRESHOLD
        if hot and expected_rows_per_trigger is not None:
            hot = (
                peak_hour_distinct * expected_rows_per_trigger
                >= HOT_HOUR_SHARD_MIN_PRODUCT
            )
        variant = "sharded" if hot else "bounded"
    if variant not in ("bounded", "sharded"):
        raise ValueError(f"unknown variant: {variant}")
    decision: dict = {
        "variant": variant,
        "peak_hour_distinct": peak_hour_distinct,
        "expected_rows_per_trigger": expected_rows_per_trigger,
    }
    if variant == "sharded":
        n_shards = shards if shards is not None else shard_count_for(
            peak_hour_distinct or 0
        )
        if two_stage_sessions is None:
            two_stage_sessions = bool(
                peak_hour_distinct and peak_hour_distinct >= SHARD_IDS_BUDGET
            )
        decision.update(
            shards=n_shards,
            # live keys multiply by the shard count — re-apply §4.3's sizing
            state_partitions=min(32, max(HOURS_STATE_PARTITIONS, n_shards)),
            two_stage_sessions=two_stage_sessions,
        )
    else:
        decision.update(
            shards=None,
            state_partitions=HOURS_STATE_PARTITIONS,
            two_stage_sessions=False,
        )
    return decision


def run_stream_foreach_batch(
    spark: SparkSession,
    streaming_df: DataFrame,
    fn,
    checkpoint: str,
    mode: str = "append",
    state_partitions: int | None = None,
) -> dict | None:
    """``run_stream_to_table``'s durable twin: execute with availableNow
    into a ``foreachBatch`` sink under a REAL checkpoint (kill-and-resume
    capable — the memory-sink runner is for tests/oracles, this is for
    stores). Same scoped state-partition contract and sequential-only
    ``LAST_STREAM_PROGRESS`` behavior; returns the final progress."""
    global LAST_STREAM_PROGRESS
    LAST_STREAM_PROGRESS = None
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            streaming_df.writeStream.foreachBatch(fn)
            .outputMode(mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        LAST_STREAM_PROGRESS = q.lastProgress
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prior)
    return LAST_STREAM_PROGRESS


def _write_dispatch_pin(pin_path: str, decision: dict) -> None:
    """Atomic pin write: a crash mid-write must not leave a truncated
    dispatch.json that breaks every later invocation — stage to a temp
    name in the same directory and os.replace (atomic on POSIX)."""
    import json as _json

    tmp = pin_path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(decision, f)
    os.replace(tmp, pin_path)


#: Relative staging partitions deleted by the last
#: ``run_hourly_pipeline_dispatched`` call's post-run retention pass
#: (None before any call / when pruning was skipped; [] when nothing was
#: closed). Same SEQUENTIAL-ONLY contract as ``LAST_STREAM_PROGRESS``.
LAST_STAGING_PRUNED: list | None = None


def run_hourly_pipeline_dispatched(
    spark: SparkSession,
    events: DataFrame,
    metrics_path: str,
    checkpoint: str,
    staging_path: str | None = None,
    variant: str = "auto",
    horizon: str = "2 hours",
    peak_hour_distinct: int | None = None,
    probe_df: DataFrame | None = None,
    shards: int | None = None,
    two_stage_sessions: bool | None = None,
    expected_rows_per_trigger: int | None = None,
    prune_staging: bool = True,
) -> dict:
    """The full turnkey pipeline: density dispatch -> exact bounded/sharded
    stateful stream -> DURABLE idempotent parquet hour store, one call.
    ``run_hourly_stream_dispatched`` ends in a memory sink (the
    test/oracle form); this composes the same decision with the real
    sinks under a real checkpoint, so kill-and-resume lands the same
    store contents (both sink bodies are replay-idempotent:
    ``foreach_batch_upsert`` is full-aggregate dynamic overwrite,
    ``foreach_batch_sharded_flush`` stages by batch id and re-merges).

    ``staging_path`` holds the sharded variant's partial store (defaults
    to ``<metrics_path>_staging``); unused — and not created — on the
    bounded arm. After a completed sharded invocation the staging store is
    auto-PRUNED (``prune_staging=True``): partials of hours strictly
    behind the final committed batch's executed watermark are deleted
    under ``sinks.prune_sharded_staging``'s provably-safe closure rule, so
    staging tracks the open hours instead of the stream's history (the
    deleted paths land in ``LAST_STAGING_PRUNED``). Returns the decision
    dict (also in ``LAST_HOURLY_DISPATCH``).

    The decision is PINNED in the checkpoint (``<checkpoint>/dispatch.json``,
    written on first run, loaded on every later run): Spark already pins
    the state-partition count at first query start, and a variant or
    shard-count flip on an existing checkpoint would fail with an opaque
    state-schema/distribution error — so repeated scheduled invocations
    (the availableNow catch-up pattern) keep the first run's physical
    strategy and skip re-probing; retire the checkpoint to re-decide.
    (Local-filesystem checkpoints assumed, as everywhere in this repo;
    a remote checkpoint store would pin through its own fs API.)

    Catch-up COMPLETENESS CONTRACT (measured, not assumed — the probe
    runs are in round-13's test/dev notes): with repeated availableNow
    invocations, an invocation durably lands every hour whose end fell
    behind the watermark built from the PREVIOUS batches of the SAME
    run — pending event-time timeouts do NOT fire in a restart's first
    batch (they fire only after an in-run watermark advance), and the
    trailing no-data micro-batch that would flush the final tail is
    scheduling-dependent under availableNow. Net effect: store
    completeness lags the stream head by the lateness horizon plus up to
    one batch, and the lag drains on the NEXT invocation that brings
    newer data — identical to a live stream's steady state, where
    no-data triggers keep firing and no lag survives. Two operational
    corollaries: (1) a far-future sentinel file closes out the tail only
    within a single run that processes data batches AFTER it advanced
    the watermark — it is a test fixture, not a restart tool; for batch
    catch-up that must end complete, use the batch path
    (``sinks.refresh_hourly_incremental`` / ``backfill_hourly_range``);
    (2) source files must arrive in event-time order within the horizon
    — a file landing after a later-event-time file is watermark-late and
    the bounded variants DROP it by the documented lateness contract
    (the unbounded twin accepts any lateness)."""
    import json as _json

    from ..sources.sinks import foreach_batch_sharded_flush, foreach_batch_upsert

    global LAST_HOURLY_DISPATCH
    LAST_HOURLY_DISPATCH = None
    pin_path = os.path.join(checkpoint, "dispatch.json")
    if os.path.exists(pin_path):
        try:
            with open(pin_path) as f:
                decision = _json.load(f)
            required = {"variant", "state_partitions"}
            if isinstance(decision, dict) and decision.get("variant") == "sharded":
                required |= {"shards", "two_stage_sessions"}
            if not isinstance(decision, dict) or required - set(decision):
                raise ValueError(f"not a full decision dict: {decision!r:.80}")
        except ValueError as e:
            raise ValueError(
                f"corrupt dispatch pin at {pin_path} ({e}); the checkpoint's "
                "state layout is unknown — restore the file from the first "
                "run's decision, or retire the whole checkpoint to re-decide"
            ) from e
        # explicit STATE-BOUND arguments must not silently lose to the pin:
        # a variant or shard-count flip on an existing checkpoint would
        # fail later with an opaque state-schema error, so refuse here
        # with the real story instead. ``shards`` is only state-bound on
        # the sharded arm — on a bounded pin it is as meaningless as it
        # was on the first (deciding) run, so repeating the ORIGINAL
        # arguments (e.g. variant='auto' + shards=16 that decided
        # bounded) must not start raising on invocation two
        conflicts = [
            (k, v, decision.get(k))
            for k, v in (("variant", variant), ("shards", shards))
            if v not in (None, "auto")
            and v != decision.get(k)
            and not (k == "shards" and decision.get("variant") != "sharded")
        ]
        if conflicts:
            raise ValueError(
                "dispatch is pinned in the checkpoint and the explicit "
                f"arguments conflict with it: {conflicts} (requested vs "
                "pinned). Spark pins the state layout at first query start "
                "— retire the checkpoint (and staging) to re-decide."
            )
        if (
            two_stage_sessions is not None
            and decision["variant"] == "sharded"
            and two_stage_sessions != decision.get("two_stage_sessions")
        ):
            # merge-layout knob only (value-identical forms, not
            # state-bound) — honor the override and re-pin it
            decision["two_stage_sessions"] = two_stage_sessions
            _write_dispatch_pin(pin_path, decision)
    else:
        decision = decide_hourly_variant(
            variant=variant,
            peak_hour_distinct=peak_hour_distinct,
            probe_df=probe_df,
            shards=shards,
            two_stage_sessions=two_stage_sessions,
            expected_rows_per_trigger=expected_rows_per_trigger,
        )
        os.makedirs(checkpoint, exist_ok=True)
        _write_dispatch_pin(pin_path, decision)
    staging = staging_path or f"{metrics_path}_staging"
    if decision["variant"] == "sharded":
        stream = hourly_metrics_stateful_sharded_stream(
            events, horizon=horizon, shards=decision["shards"]
        )
        fn = foreach_batch_sharded_flush(
            staging,
            metrics_path=metrics_path,
            two_stage_sessions=decision["two_stage_sessions"],
            # in-batch retention is safe HERE because the input is the
            # sharded stateful stream, whose eviction order is structural;
            # the standalone seam defaults to False (silent mid-hour
            # deletion must be opted into, not stumbled into)
            prune_closed=True,
        )
    else:
        stream = hourly_metrics_stateful_bounded_stream(
            events, horizon=horizon
        ).drop("update_seq")
        fn = foreach_batch_upsert(metrics_path)
    progress = run_stream_foreach_batch(
        spark,
        stream,
        fn,
        checkpoint=checkpoint,
        mode="append",
        state_partitions=decision["state_partitions"],
    )
    global LAST_STAGING_PRUNED
    LAST_STAGING_PRUNED = None
    if decision["variant"] == "sharded" and prune_staging:
        from ..sources.sinks import (
            prune_sharded_staging,
            staging_prune_watermark_ms,
        )

        LAST_STAGING_PRUNED = prune_sharded_staging(
            staging, staging_prune_watermark_ms(progress)
        )
    LAST_HOURLY_DISPATCH = decision
    return decision


# --------------------------------------------------------------------------
# Catalog entries
# --------------------------------------------------------------------------
def _hourly_oracle() -> str:
    from ..operators.hourly import HOURLY_ORACLE_BODY

    return (
        f"WITH energy_events AS ({ENERGY_EVENTS_SQL}),\n"
        f"hourly_business_metrics AS ({HOURLY_ORACLE_BODY})\n"
        "SELECT * FROM hourly_business_metrics"
    )


@register(
    "streaming_hourly_metrics",
    oracle=_hourly_oracle(),
    doc="Stateful streaming (applyInPandasWithState) hourly metrics, run "
    "with availableNow — shares the BATCH oracle, i.e. batch==streaming "
    "equivalence is differential-checked, not asserted.",
)
def q_streaming_hourly_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = energy_events_stream(spark, sf_dir)
    out = run_stream_to_table(
        spark,
        hourly_metrics_stateful_stream(ev),
        state_partitions=HOURS_STATE_PARTITIONS,
    )
    # availableNow on one file = one micro-batch => one row per hour already;
    # dedup defensively in case the source ever splits batches.
    from pyspark.sql.window import Window

    w = Window.partitionBy("hour").orderBy(F.col("update_seq").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "update_seq")
    )


@register(
    "streaming_hourly_native",
    oracle=None,  # approx distincts by design
    doc="Built-in watermarked window aggregation (approx distincts) — the "
    "idiomatic native streaming path.",
)
def _native_hourly_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the native windowed stream and collapse the update-mode memory
    sink to one FINAL row per hour. The single-file availableNow source
    emits each hour once, but a multi-batch split (maxFilesPerTrigger, a
    multi-file dir) re-emits touched windows per batch with stale partial
    counts — the same defensive dedup the exact stateful twin applies.
    The collapse keeps each hour's LAST emission via the ``_rows_total``
    ordinal (``collapse_native_updates``); the earlier per-column ``max()``
    silently assumed monotone sums, which negative values break."""
    ev = energy_events_stream(spark, sf_dir)
    out = run_stream_to_table(
        spark, hourly_metrics_native_stream(ev, with_emit_ordinal=True)
    )
    return collapse_native_updates(out)


def q_streaming_hourly_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _native_hourly_final(spark, sf_dir)


@register(
    "streaming_hourly_native_audit",
    # The native path's EXACT columns (counters, decimal-exact sums cast to
    # double) must equal the batch aggregation bit-for-bit, and its HLL
    # approx-distincts must sit inside an absolute-or-relative error band
    # vs the exact batch distincts: |approx - exact| <= greatest(5,
    # 0.15*exact) (the audited band constants + measured-margin table live
    # in plans/audit_constants.py) — HLL++ at the default 5% rsd is relative for large
    # cardinalities and ±few for sparse ones, and the measured worst cases
    # on the gate corpora (abs 13 at exact 112; abs 2 at small counts)
    # sit well inside both arms. DuckDB twins the exact columns and pins
    # the band booleans; a native-aggregation regression (lost rows, wrong
    # filter, broken sketch) breaks equality or flips a boolean.
    oracle=f"""
WITH energy_events AS ({ENERGY_EVENTS_SQL}),
b AS (
  SELECT date_trunc('hour', event_time) AS hour,
    count(CASE WHEN event_type = 'tariff_switch' THEN 1 END) AS tariff_switches,
    count(CASE WHEN event_type = 'incentive_claim' THEN 1 END) AS incentive_claims,
    count(CASE WHEN event_type = 'user_login' THEN 1 END) AS total_logins,
    coalesce(cast(sum(CASE WHEN event_type = 'tariff_switch' THEN payment_amount END) AS DOUBLE), 0.0) AS total_switch_revenue,
    coalesce(cast(sum(CASE WHEN event_type = 'energy_consumed' THEN energy_consumed END) AS DOUBLE), 0.0) AS total_energy_consumed,
    coalesce(cast(sum(CASE WHEN event_type = 'bill_payment' THEN payment_amount END) AS DOUBLE), 0.0) AS total_payments
  FROM energy_events GROUP BY 1
)
SELECT hour, tariff_switches, incentive_claims, total_logins,
  total_switch_revenue, total_energy_consumed, total_payments,
  TRUE AS active_customers_ok, TRUE AS new_sessions_ok
FROM b
""",
    doc="Driver-checkable audit of the native watermarked-window streaming "
    "path (hourly_metrics_native_stream): full-outer join against the "
    "exact batch hourly aggregation — exact columns flow through from "
    "the STREAM (equality with the batch-side oracle is the law; a "
    "missing or extra hour breaks the row set), HLL approx-distincts "
    "must sit within greatest(5, 0.15*exact) of the exact distincts. "
    "Completes the round-14 audit-twin set: all five formerly rows-only "
    "entries now have a hash-checkable driver gate.",
)
def q_streaming_hourly_native_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.hourly import hourly_business_metrics
    from ..sources.adapter import energy_events

    nat = _native_hourly_final(spark, sf_dir)
    ex = hourly_business_metrics(energy_events(spark, sf_dir)).select(
        "hour",
        F.col("active_customers").alias("_ac"),
        F.col("new_sessions").alias("_ns"),
    )
    from ..plans.audit_constants import hll_band_ok

    def _band(approx: str, exact: str):
        return hll_band_ok(F.col(approx), F.col(exact))

    return nat.join(ex, "hour", "full_outer").select(
        "hour",
        "tariff_switches",
        "incentive_claims",
        "total_logins",
        "total_switch_revenue",
        "total_energy_consumed",
        "total_payments",
        _band("active_customers_approx", "_ac").alias("active_customers_ok"),
        _band("new_sessions_approx", "_ns").alias("new_sessions_ok"),
    )


def append_watermark_sentinel(spark: SparkSession, sf_dir: str, src: str):
    """Write one far-future event into a chunk dir so the final availableNow
    micro-batch pushes the global watermark past every real event-time
    timeout — every open state row flushes. Returns the max REAL timestamp
    (callers filter output to ``< max + margin`` to drop the sentinel's own
    rows). Built on the normalized frame so the file schema matches the
    chunk files regardless of the source parquet's timestamp vintage."""
    import shutil
    from datetime import timedelta

    norm = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    mx = norm.selectExpr("max(ts) AS m").collect()[0]["m"]
    sdf = spark.createDataFrame(
        [(-1, mx + timedelta(days=3650), -1, "sentinel", 0.0, "{}")],
        schema=norm.schema,
    )
    stage = tempfile.mkdtemp(prefix="sentinel-stage-")
    sdf.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    os.rename(f"{stage}/{part}", f"{src}/chunk_z_sentinel.parquet")
    shutil.rmtree(stage, ignore_errors=True)
    return mx


@register(
    "streaming_hourly_bounded",
    oracle=_hourly_oracle(),
    doc="Bounded-state exact hourly metrics: same merge logic and EXACT "
    "distincts as streaming_hourly_metrics, but each hour self-evicts by "
    "event-time timeout (applyInPandasWithState + EventTimeTimeout) once "
    "the watermark passes it, emitting its single final row append-mode — "
    "the snapshot-and-trim pattern. Three ascending time-chunk "
    "micro-batches force hours to close while later data still arrives; a "
    "far-future sentinel flushes the tail; the result must equal the BATCH "
    "oracle on every hour including the two exact distincts. Scale: state "
    "plateaus at the open lateness horizon (measured 96 rows vs 720 hours "
    "at sf0.01, tests/test_state_accounting.py) where the unbounded twin "
    "holds hours-cardinality — pick by lateness regime: rows later than "
    "the horizon are DROPPED (Spark late-filters stateful input under "
    "event-time timeouts — measured, zero state updates in the late "
    "batch), the native windowed aggregation's lateness contract with "
    "exact distincts instead of HLL; any-lateness exactness needs the "
    "unbounded twin.",
)
def q_streaming_hourly_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import timedelta

    src = ascending_time_chunks(spark, sf_dir, 3)
    mx = append_watermark_sentinel(spark, sf_dir, src)
    ev = energy_events_stream(spark, sf_dir, source_dir=src, max_files_per_trigger=1)
    out = run_stream_to_table(
        spark,
        hourly_metrics_stateful_bounded_stream(ev, horizon="2 hours"),
        mode="append",
        state_partitions=HOURS_STATE_PARTITIONS,
    )
    return out.where(F.col("hour") < mx + timedelta(days=30)).drop("update_seq")


def dedup_summary_stream(raw_events: DataFrame) -> DataFrame:
    """At-least-once -> effectively-once: drop replayed duplicates by
    event_id inside the watermark horizon (dropDuplicatesWithinWatermark
    keeps only the key + one timestamp in state and evicts it once the
    watermark passes — bounded state, unlike plain dropDuplicates), then
    aggregate per event type.

    The 45-day delay covers the test fixture's full 30-day event-time span
    so a whole-file replay dedups exactly; production tunes the delay to the
    real replay horizon (e.g. Kafka retention).
    """
    deduped = raw_events.withWatermark("ts", "45 days").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
    )


@register(
    "streaming_dedup_replay",
    oracle="""
SELECT event_type, count(*) AS n_events,
  cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events GROUP BY event_type
""",
    doc="Streaming exactly-once dedup under replay: the source replays the "
    "SAME events file twice in two micro-batches (at-least-once delivery), "
    "dropDuplicatesWithinWatermark collapses the duplicates across batches, "
    "and the result is gated against the BATCH oracle over a single copy — "
    "so the dedup guarantee is differential-checked, not asserted. Scale: "
    "dedup state is (event_id, ts) only, watermark-evicted; the shuffle "
    "keys by event_id.",
)
def q_streaming_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = tempfile.mkdtemp(prefix="stream-dedup-")
    os.symlink(f"{sf_dir}/events.parquet", f"{src}/events_a.parquet")
    os.symlink(f"{sf_dir}/events.parquet", f"{src}/events_b.parquet")
    raw = stream_raw_events(spark, sf_dir, source_dir=src, max_files_per_trigger=1)
    return run_stream_to_table(spark, dedup_summary_stream(raw), mode="complete")


def hourly_type_counts_stream(raw_events: DataFrame) -> DataFrame:
    """Watermarked per-(hour window, event_type) streaming counts."""
    return (
        raw_events.withWatermark("ts", "24 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("hour"), "event_type", "n")
    )


@register(
    "streaming_hourly_type_topk",
    oracle="""
WITH counts AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT hour, event_type, n,
  row_number() OVER (PARTITION BY hour ORDER BY n DESC, event_type) AS rk
FROM counts
QUALIFY rk <= 3
""",
    doc="Streaming windowed top-K: native watermarked window counts per "
    "(hour, event_type) replayed in FOUR ascending time-chunk micro-batches "
    "(each batch updates windows the previous batches opened; ascending "
    "order keeps every row inside the 24 h watermark, so nothing drops and "
    "the stream must converge to the batch answer), update-mode memory "
    "sink, then last-update-wins per key (counts are monotone, so max(n)) "
    "and a per-hour top-3 rank. The rank-after-sink split is the "
    "production shape: streaming maintains the counts, the cheap rank runs "
    "at read time. Fourth batch==streaming differential gate.",
)
def q_streaming_hourly_type_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    src = ascending_time_chunks(spark, sf_dir, 4)
    raw_stream = stream_raw_events(spark, sf_dir, source_dir=src, max_files_per_trigger=1)
    out = run_stream_to_table(spark, hourly_type_counts_stream(raw_stream), mode="update")
    final = out.groupBy("hour", "event_type").agg(F.max("n").alias("n"))
    rk = F.row_number().over(
        Window.partitionBy("hour").orderBy(F.col("n").desc(), "event_type")
    )
    return final.select("hour", "event_type", "n", rk.alias("rk")).where(F.col("rk") <= 3)


def running_user_totals_stream(raw_events: DataFrame) -> DataFrame:
    """Arbitrary stateful streaming with the Spark 4 ``StatefulProcessor``
    API (`transformWithStateInPandas`): per-user running event count and
    exact cents total kept in a ValueState, updated each micro-batch.

    This is the engine-managed replacement for the reference's locked
    in-memory dict (consumer/consumer.py:81-99) in its most general form —
    typed per-key state, Arrow-batched updates, shardable with the shuffle
    and checkpointable, where applyInPandasWithState (hourly metrics) shows
    the older GroupState flavor.
    """
    import pandas as pd  # noqa: F401 (imported for the processor closure)
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("user_id", LongType(), True),
            StructField("n_events", LongType(), True),
            StructField("total_cents", LongType(), True),
        ]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = StructType(
                [
                    StructField("n", LongType(), True),
                    StructField("cents", LongType(), True),
                ]
            )
            self._state = handle.getValueState("totals", schema)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, cents = (self._state.get() if self._state.exists() else (0, 0))
            for pdf in rows:
                n += len(pdf)
                # values are exact 2-decimal doubles -> cents are exact ints
                # dropna BEFORE the int cast: a null value is a legal
                # nullable-double row the oracle's sum() skips; NaN would
                # crash astype(int64)
                v = (pdf["value"] * 100).round().dropna()
                cents += int(v.astype("int64").sum())
            self._state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
            )

        def close(self) -> None:
            pass

    return (
        raw_events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotals(), outputStructType=out_schema, outputMode="Update", timeMode="None"
        )
    )


def _running_totals_update_fn():
    """Module-level factory for the GroupState running-totals update fn
    (closure pickled by value), so tests can drive the PRODUCTION merge
    directly with a fake GroupState — the round-14 null-value test
    re-implemented the dropna arithmetic inline and would not have caught a
    regression reverting the fix (r14 advice)."""

    def update(key, pdfs, state):
        import pandas as pd

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # values are exact 2-decimal doubles -> cents are exact ints
            # dropna BEFORE the int cast: see the transformWithState twin
            v = (pdf["value"] * 100).round().dropna()
            cents += int(v.astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    return update


def running_user_totals_stream_groupstate(raw_events: DataFrame) -> DataFrame:
    """Protobuf-free twin of ``running_user_totals_stream``: identical
    per-user running (count, cents) state kept through the older GroupState
    flavor (``applyInPandasWithState``), which rides the plain Arrow channel
    — no state-server protobuf — so the operator stays ACTIVE in containers
    without ``google.protobuf``. Exact integer merge, update-mode emission,
    same output schema; the catalog entry picks whichever flavor the
    environment supports and gates both against the same batch oracle."""
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("user_id", LongType(), True),
            StructField("n_events", LongType(), True),
            StructField("total_cents", LongType(), True),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType(), True),
            StructField("cents", LongType(), True),
        ]
    )

    return (
        raw_events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_totals_update_fn(),
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _has_protobuf() -> bool:
    # transformWithStateInPandas speaks protobuf to the state server; the
    # driver container may not ship google.protobuf (import-try, per the
    # no-new-deps rule). Where absent, the GroupState twin carries the entry.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@register(
    "streaming_running_totals",
    oracle="""
SELECT user_id, count(*) AS n_events,
  cast(sum(cast(cast(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_cents
FROM events GROUP BY user_id
""",
    doc="Arbitrary stateful streaming: per-user running totals, each "
    "micro-batch merging into typed per-key state; converged state is "
    "gated against the one-pass batch aggregation. Uses the Spark 4 "
    "StatefulProcessor (transformWithStateInPandas + ValueState) where "
    "the environment ships its protobuf dependency, else the semantically "
    "identical GroupState flavor (applyInPandasWithState) — same state, "
    "same output, same oracle. Counts/cents are exact integers, so the "
    "cross-batch merge is order-independent. Scale: state is two longs "
    "per user, sharded by the user_id shuffle, RocksDB-backed and "
    "checkpointed on a cluster.",
)
def q_streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    raw = stream_raw_events(spark, sf_dir)
    if _has_protobuf():
        # transformWithState requires the RocksDB state store provider (the
        # default HDFS-backed store does not implement it); scope the
        # override so later streams on the shared session keep the default.
        with _conf_override(
            spark,
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        ):
            out = run_stream_to_table(
                spark, running_user_totals_stream(raw), mode="update"
            )
    else:
        out = run_stream_to_table(
            spark, running_user_totals_stream_groupstate(raw), mode="update"
        )
    # availableNow on one file = one batch; dedup defensively (n is monotone)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def ascending_time_chunks(spark: SparkSession, sf_dir: str, n_chunks: int) -> str:
    """Split the events parquet into ``n_chunks`` event-time-ascending files
    in a fresh source dir, so a maxFilesPerTrigger=1 file stream replays them
    as ordered micro-batches (the file source lists oldest-mtime-first and
    the chunks are written sequentially).

    ``ts`` is vintage-normalized to timestamp first (nanos-long and
    timestamp_ntz parquet both land on micros), then split points are
    approxQuantile'd over a ``unix_micros(ts)`` projection — quantiles only
    support numeric columns — and the range predicates compare in micros.
    """
    import shutil

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    micros = raw.withColumn("_ts_us", F.unix_micros(F.col("ts")))
    probs = [i / n_chunks for i in range(1, n_chunks)]
    q = micros.approxQuantile("_ts_us", probs, 0.0)
    src = tempfile.mkdtemp(prefix="stream-chunks-")
    stage = tempfile.mkdtemp(prefix="stream-chunks-stage-")
    bounds = [None, *q, None]
    for i in range(n_chunks):
        chunk = micros
        if bounds[i] is not None:
            chunk = chunk.where(F.col("_ts_us") >= bounds[i])
        if bounds[i + 1] is not None:
            chunk = chunk.where(F.col("_ts_us") < bounds[i + 1])
        chunk = chunk.drop("_ts_us")
        d = f"{stage}/c{i}"
        chunk.coalesce(1).write.mode("overwrite").parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        os.rename(f"{d}/{part}", f"{src}/chunk_{i}.parquet")
    shutil.rmtree(stage, ignore_errors=True)
    return src


def view_purchase_attribution_stream(
    views: DataFrame, purchases: DataFrame, watermark: str = "45 days"
) -> DataFrame:
    """Stream-stream event-time interval join: attribute each purchase to
    every view by the same user in the preceding 24 h.

    Both sides carry watermarks; the time-range predicate lets the engine
    evict view state once ``view_ts + 24h`` falls behind the purchase-side
    watermark and purchase state once it falls behind the view-side
    watermark — bounded state, append-mode emission. The default 45-day
    ``watermark`` blankets the test fixture's span; the eviction mechanics
    under a tight 1-hour horizon are measured in
    tests/test_state_accounting.py::test_interval_join_state_evicts_by_condition.
    """
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    ).withWatermark("view_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    ).withWatermark("purchase_ts", watermark)
    return v.join(
        p,
        F.expr(
            "v_user = p_user AND purchase_ts > view_ts "
            "AND purchase_ts <= view_ts + INTERVAL 24 HOURS"
        ),
    )


@register(
    "streaming_view_purchase_attribution",
    oracle="""
SELECT v.user_id,
  count(*) AS n_pairs,
  count(DISTINCT p.event_id) AS attributed_purchases,
  count(DISTINCT v.event_id) AS converting_views
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND cast(p.ts AS TIMESTAMP) > cast(v.ts AS TIMESTAMP)
 AND cast(p.ts AS TIMESTAMP) <= cast(v.ts AS TIMESTAMP) + INTERVAL 24 HOUR
GROUP BY 1
""",
    doc="Stream-stream event-time interval join (the one join Structured "
    "Streaming treats as a stateful operator): views and purchases are two "
    "watermarked streams replayed in two ascending time-chunk micro-batches "
    "(cross-batch matches exercise the join state), joined per user within "
    "a 24 h attribution window in append mode; the per-user rollup runs "
    "batch-side on the sink (the production read-time split). Gated against "
    "the batch self-join oracle. The 45-day test watermark covers the "
    "fixture's span so replay loses nothing; production sets the real "
    "lateness budget, and the interval predicate is what lets the engine "
    "evict both sides' state. Scale: join state is bounded by "
    "|events in watermark horizon| per side, sharded by the user_id "
    "shuffle; RocksDB state store + per-key range scans on a cluster.",
)
def q_streaming_view_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = ascending_time_chunks(spark, sf_dir, 2)
    views = stream_raw_events(spark, sf_dir, source_dir=src, max_files_per_trigger=1).where(
        F.col("event_type") == "view"
    )
    purchases = stream_raw_events(spark, sf_dir, source_dir=src, max_files_per_trigger=1).where(
        F.col("event_type") == "purchase"
    )
    pairs = run_stream_to_table(
        spark, view_purchase_attribution_stream(views, purchases), mode="append"
    )
    return pairs.groupBy(F.col("v_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_distinct("purchase_id").alias("attributed_purchases"),
        F.count_distinct("view_id").alias("converting_views"),
    )


def sliding_event_rate_stream(raw_events: DataFrame) -> DataFrame:
    """Watermarked SLIDING-window counts (1 h window, 15 min slide): each
    event lands in 4 overlapping windows — the rate panel shape (smooth
    trailing-hour rate refreshed every 15 min)."""
    return (
        raw_events.withWatermark("ts", "24 hours")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


@register(
    "streaming_sliding_event_rate",
    oracle="""
WITH contrib AS (
  SELECT make_timestamp(
    ((cast(floor(epoch(ts)) AS BIGINT) // 900) * 900 - k.k * 900) * 1000000
  ) AS window_start
  FROM events, (SELECT unnest(generate_series(0, 3)) AS k) k
)
SELECT window_start, count(*) AS n_events FROM contrib GROUP BY 1
""",
    doc="Sliding event-time windows (1 h / 15 min slide) as a streaming "
    "aggregation, replayed in two ascending time-chunk micro-batches "
    "(update-mode emissions across batches, counts monotone so the "
    "read-time rollup takes max per window). The oracle expands each "
    "event into its 4 epoch-aligned windows arithmetically — checking "
    "Spark's window() alignment semantics, not just totals. Scale: "
    "sliding windows multiply state x(window/slide); the engine stores "
    "per-window partial counts (4 longs per active hour), watermark-"
    "evicted; at 100 TB prefer the tumbling-15min + read-time trailing-"
    "sum rewrite if window/slide grows large.",
)
def q_streaming_sliding_event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = ascending_time_chunks(spark, sf_dir, 2)
    raw = stream_raw_events(spark, sf_dir, source_dir=src, max_files_per_trigger=1)
    out = run_stream_to_table(spark, sliding_event_rate_stream(raw), mode="update")
    return out.groupBy(F.col("window_start")).agg(F.max("n").alias("n_events"))


def sessionize_timeout_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap sessionization as a CUSTOM stateful operator with event-time
    timeouts (applyInPandasWithState + GroupStateTimeout.EventTimeTimeout)
    — the API family the native session_window variant hides: per-user
    state holds the one OPEN session; in-batch gaps close sessions
    immediately; the timeout (open-session end + gap) fires when the
    GLOBAL watermark passes it and emits the final session per key.

    Gap boundaries replicate the batch operator bit-for-bit: second-floored
    epoch diffs strictly greater than gap close a session, and emitted
    timestamps are the original microsecond event times, so the closed
    sessions share the batch sessions oracle.

    Scale: state is 3 longs per ACTIVE user (idle keys are evicted by their
    own timeout — this is what bounds state under key churn, where the
    batch window plan would re-sort everything); emission is append-mode
    (sessions are final when emitted), so downstream sinks never see
    retractions. Lateness contract: Spark late-filters stateful input
    whenever event-time timeouts are active, so rows older than the 1-hour
    watermark are DROPPED, not sessionized — the same measured behavior as
    the bounded hourly variant (tests/test_state_accounting.py::
    test_stateful_bounded_hourly_drops_beyond_horizon_rows); batch parity
    therefore assumes arrival order within the watermark horizon.
    """
    from pyspark.sql.types import LongType

    out_schema = StructType(
        [
            StructField("user_id", LongType(), True),
            StructField("session_start_us", LongType(), True),
            StructField("session_end_us", LongType(), True),
            StructField("n_events", LongType(), True),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_us", LongType(), True),
            StructField("end_us", LongType(), True),
            StructField("n", LongType(), True),
        ]
    )

    return (
        events.withColumn("ts_us", F.unix_micros("ts"))
        .withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_update_fn(gap_minutes * 60),
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        # epoch longs cross the Python boundary; the public timestamps are
        # rendered JVM-side, immune to the session tz
        .select(
            "user_id",
            F.timestamp_micros("session_start_us").alias("session_start"),
            F.timestamp_micros("session_end_us").alias("session_end"),
            "n_events",
        )
    )


def _session_update_fn(gap_sec: int):
    """Closure for ``sessionize_timeout_stream`` (pickled by value —
    workers never import this package). Extracted to module level so the
    round-10 vectorization carries a direct differential property test
    against the sequential reference (tests/test_round10_ops.py)."""

    def update(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        def rows(starts, ends, counts) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(counts),
                    "session_start_us": np.asarray(starts, np.int64),
                    "session_end_us": np.asarray(ends, np.int64),
                    "n_events": counts,
                }
            )

        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield rows([start_us], [end_us], [n])
            return

        # ts_us is TRUE epoch micros computed JVM-side (unix_micros) — the
        # tz-proof key discipline the hourly paths adopted in rounds 10-11.
        # The Arrow-rendered timestamp column is session-tz WALL time: wall
        # micros fed to setTimeoutTimestamp sit a whole tz-offset away from
        # the epoch watermark (first batch dies under a negative offset,
        # silent late evictions under a positive one), and wall gaps lie
        # across DST transitions. Outputs are epoch longs for the same
        # reason; the wrapper renders them with timestamp_micros JVM-side.
        chunks = [pdf["ts_us"].to_numpy(np.int64) for pdf in pdfs if len(pdf)]
        arr = np.sort(np.concatenate(chunks)) if chunks else np.empty(0, np.int64)
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us = end_us = -1
            n = 0
        if arr.size:
            # Vectorized gap-split (round 10; value-identical to the
            # per-event loop it replaced). The loop compared each event to
            # the RUNNING max of everything before it (a carried session
            # end can exceed early events), so the previous-end series is
            # a running maximum seeded with the carried end, and a session
            # break is a second-floored epoch gap strictly > gap_sec —
            # batch parity with the lag()-window oracle.
            seed = end_us if n else arr[0]
            prev = np.maximum.accumulate(np.concatenate(([seed], arr)))[:-1]
            brk = (arr // 1_000_000) - (prev // 1_000_000) > gap_sec
            if n == 0:
                brk[0] = True  # first event opens a session (none carried)
            starts_i = np.flatnonzero(brk)  # index of each NEW session's head
            if starts_i.size:
                # segment ends: element before each next break + the final
                # element; sorted => a segment's last element is its max
                ends_i = np.concatenate((starts_i[1:] - 1, [arr.size - 1]))
                seg_start = arr[starts_i]
                seg_end = arr[ends_i]
                seg_n = np.diff(np.concatenate((starts_i, [arr.size])))
            else:  # no breaks: every event merges into the carried session
                seg_start = seg_end = seg_n = np.empty(0, np.int64)
            if n:
                # events before the first break extend the carried session
                head = int(starts_i[0]) if starts_i.size else arr.size
                c_end = max(end_us, int(arr[head - 1])) if head else end_us
                seg_start = np.concatenate(([start_us], seg_start))
                seg_end = np.concatenate(([c_end], seg_end))
                seg_n = np.concatenate(([n + head], seg_n))
            # all segments but the last are CLOSED sessions; the last stays
            # open in state awaiting its gap timeout
            if len(seg_n) > 1:
                yield rows(
                    seg_start[:-1].tolist(), seg_end[:-1].tolist(),
                    seg_n[:-1].tolist(),
                )
            start_us, end_us, n = int(seg_start[-1]), int(seg_end[-1]), int(seg_n[-1])
        if n:
            state.update((start_us, end_us, n))
            state.setTimeoutTimestamp(end_us // 1000 + gap_sec * 1000)
        # n == 0 with existing state is unreachable: stored state always
        # carries n >= 1 (update only runs under `if n`), and a carried
        # session's count can only grow — the old `elif state.exists`
        # re-store would have leaked the key forever (no timeout
        # re-registration); removed rather than kept as dead armor.

    return update


@register(
    "streaming_timeout_sessions",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
              OR cast(floor(epoch(ts)) AS BIGINT) - cast(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_no
""",
    doc="Timeout-driven streaming sessionization (applyInPandasWithState + "
    "EventTimeTimeout): three ascending time-chunk micro-batches keep "
    "per-user OPEN sessions in typed state, close them on in-data gaps "
    "immediately and on event-time timeouts as the watermark advances; a "
    "far-future sentinel event (filtered from the result) pushes the final "
    "watermark so every open session times out and emits — append-mode "
    "final-only emission. Gated against the batch sessionization oracle: "
    "the stream must reproduce every (start, end, count) exactly, "
    "including sessions split across micro-batches. Scale: state is 3 "
    "longs per active user and self-evicts by timeout; the native "
    "session_window variant (streaming_user_sessions) is the "
    "engine-managed twin — this is the API for session semantics the "
    "built-in merge cannot express (per-key custom close rules).",
)
def q_streaming_timeout_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = ascending_time_chunks(spark, sf_dir, 3)
    # Sentinel: one far-future event for a fake user advances the global
    # watermark past every real session's timeout in a final micro-batch.
    append_watermark_sentinel(spark, sf_dir, src)

    stream = stream_raw_events(spark, sf_dir, source_dir=src, max_files_per_trigger=1)
    out = run_stream_to_table(
        spark, sessionize_timeout_stream(stream, gap_minutes=30), mode="append"
    )
    return out.where(F.col("user_id") >= 0)


def ascending_doc_chunks(spark: SparkSession, sf_dir: str, n_chunks: int) -> str:
    """Split documents.parquet into doc_id-ascending chunk files so a
    maxFilesPerTrigger=1 stream replays them as ordered micro-batches —
    cross-batch duplicate groups are then guaranteed (duplicated content has
    scattered doc_ids), which is what the streaming-dedup gate must cover."""
    import shutil

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probs = [i / n_chunks for i in range(1, n_chunks)]
    q = docs.selectExpr("cast(doc_id AS DOUBLE) AS d").approxQuantile("d", probs, 0.0)
    src = tempfile.mkdtemp(prefix="doc-chunks-")
    stage = tempfile.mkdtemp(prefix="doc-chunks-stage-")
    bounds = [None, *q, None]
    for i in range(n_chunks):
        chunk = docs
        if bounds[i] is not None:
            chunk = chunk.where(F.col("doc_id") >= bounds[i])
        if bounds[i + 1] is not None:
            chunk = chunk.where(F.col("doc_id") < bounds[i + 1])
        d = f"{stage}/c{i}"
        chunk.coalesce(1).write.mode("overwrite").parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        os.rename(f"{d}/{part}", f"{src}/chunk_{i}.parquet")
    shutil.rmtree(stage, ignore_errors=True)
    return src


from ..plans.sampling_queries import CORPUS_CURATION_ORACLE  # noqa: E402


@register(
    "streaming_corpus_curation",
    oracle=CORPUS_CURATION_ORACLE,
    doc="Continuous corpus curation: documents arrive as ordered micro-"
    "batches; each foreachBatch increment quality-filters (>=10 words), "
    "dedups batch-locally (min doc_id per fingerprint), anti-joins against "
    "the accumulated corpus index (earlier batches win), and appends the "
    "survivors keyed by batch_id with dynamic partition overwrite — a "
    "retried batch rewrites exactly its own partition, so the store is "
    "idempotent under at-least-once replay. Final per-(split, lang) "
    "accounting must equal the one-pass batch pipeline exactly (shared "
    "oracle): the incremental anti-join dedup and the batch row_number "
    "dedup keep the SAME representatives. Scale: each increment shuffles "
    "only its own batch (fingerprint agg) plus a semi-join against the "
    "index's fp column — the accumulated corpus is never re-aggregated; "
    "this is the continuous-ingestion form of corpus_curation_pipeline.",
)
def q_streaming_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bpe_tokens, fingerprint, words
    from ..plans.sampling_queries import _BUCKETS, hash_bucket

    src = ascending_doc_chunks(spark, sf_dir, 3)
    kept_dir = tempfile.mkdtemp(prefix="curated-corpus-") + "/store"
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        base = batch_df.select(
            "doc_id",
            "lang",
            "source",
            fingerprint(F.col("text")).alias("fp"),
            F.size(words(F.col("text"))).alias("n_words"),
            F.size(bpe_tokens(F.col("text"))).alias("n_tokens"),
        ).where(F.col("n_words") >= 10)
        # batch-local dedup: min doc_id per fingerprint, carrying its row
        inc = base.groupBy("fp").agg(
            F.min_by(F.struct("doc_id", "lang", "source", "n_tokens"), "doc_id").alias("r")
        ).select("fp", "r.*")
        # Missing store == first batch; any OTHER read failure must
        # propagate — swallowing it would silently skip the cross-batch
        # anti-join and keep duplicate documents without an error.
        from pyspark.errors import AnalysisException

        try:
            prior = s.read.parquet(kept_dir).where(F.col("_batch_id") < batch_id)
        except AnalysisException:
            prior = None
        if prior is not None:
            inc = inc.join(prior.select("fp"), "fp", "left_anti")
        overwrite_partitions(
            inc.withColumn("_batch_id", F.lit(batch_id)),
            kept_dir,
            "_batch_id",
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="curated-ckpt-"))
        .start()
    )
    q.awaitTermination()

    kept = spark.read.parquet(kept_dir)
    m = hash_bucket(F.col("doc_id")) % 10
    split = F.when(m <= 7, "train").when(m == 8, "val").otherwise("test").alias("split")
    return kept.groupBy(split, "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_tokens").cast("long")).alias("total_tokens"),
        F.count_distinct(F.col("source")).alias("n_sources"),
    )


from ..plans.sampling_queries import WEIGHTED_RESERVOIR_ORACLE  # noqa: E402


@register(
    "streaming_weighted_reservoir",
    oracle=WEIGHTED_RESERVOIR_ORACLE,  # batch entry's oracle — true batch≡streaming gate
    doc="Streaming weighted reservoir (A-ES) over micro-batches: each "
    "foreachBatch increment computes its docs' ln(u)/w keys and persists "
    "ONLY its per-language top-5 keyed by batch id (dynamic partition "
    "overwrite — replayed batches rewrite their own files). Per-batch "
    "top-k is a SUFFICIENT STATISTIC for global top-k (selection is "
    "distributive over union), so ranking the stored candidates after "
    "the stream drains equals the one-pass batch sample exactly — the "
    "same oracle gates both. State is k rows per (batch, lang), not the "
    "corpus: the streaming form of the sampler a continuous ingest "
    "pipeline runs.",
)
def q_streaming_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.text import bpe_tokens
    from ..plans.sampling_queries import hash_bucket

    src = ascending_doc_chunks(spark, sf_dir, 3)
    store = tempfile.mkdtemp(prefix="reservoir-") + "/cands"
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        n_tokens = F.size(bpe_tokens(F.col("text"))).cast("long")
        base = batch_df.select(
            "doc_id", "lang", n_tokens.alias("n_tokens")
        ).where(F.col("n_tokens") >= 1)
        u = (hash_bucket(F.col("doc_id")) + F.lit(1)) / F.lit(4294967296.0)
        keyed = base.withColumn("k", F.log(u) / F.col("n_tokens").cast("double"))
        w = Window.partitionBy("lang").orderBy(F.col("k").desc(), "doc_id")
        top = keyed.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= 5)
        overwrite_partitions(
            top.drop("_rn").withColumn("_batch_id", F.lit(batch_id)),
            store,
            "_batch_id",
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="reservoir-ckpt-"))
        .start()
    )
    q.awaitTermination()

    cands = spark.read.parquet(store)
    w = Window.partitionBy("lang").orderBy(F.col("k").desc(), "doc_id")
    return (
        cands.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 5)
        .select("lang", "rank", "doc_id", "n_tokens")
        .orderBy("lang", "rank")
    )



from ..plans.training_queries import _NGRAM_PAIRS_CTES  # noqa: E402


@register(
    "streaming_incremental_dedup",
    # At the 0.5 operating threshold the deterministic 16-band LSH finds
    # every exact-Jaccard pair (verified at sf0.01/sf0.1 — all pairs
    # >= 0.2 collide), so the union-of-batches output must equal the
    # exact inverted-index Jaccard pairs over the whole corpus: a
    # value-exact cross-engine gate that also asserts full recall at gate
    # scale. The stream≡batch law test covers other thresholds.
    oracle=f"""
WITH {_NGRAM_PAIRS_CTES}
SELECT doc_a, doc_b, jaccard FROM jpairs WHERE jaccard >= 0.5
""",
    doc="Continuous near-dup detection: documents arrive as ordered micro-"
    "batches and each foreachBatch increment folds into the PERSISTED "
    "MinHash-LSH index (operators/dedup.py::dedup_increment — lands its "
    "band codes + shingle arrays keyed by increment id, then joins only "
    "ITS OWN bands against the store), persisting the discovered pairs "
    "keyed by batch id with dynamic partition overwrite. A pair "
    "(x∈bᵢ, y∈bⱼ, i<j) is found exactly once — when the LATER side "
    "arrives (the earlier side is already in the store); within-batch "
    "pairs surface from the batch's self-collisions. The union of all "
    "per-batch pair sets therefore equals batch minhash_lsh_pairs over "
    "the full corpus EXACTLY (jaccard values included) — the law "
    "tests/test_round4_ops.py pins. Work per batch is increment-sized; "
    "the corpus is never re-scanned — the streaming form of the ingest "
    "dedup a 100 TB pipeline runs. (availableNow replay note: a batch "
    "retried BEFORE later batches land is idempotent via its keyed "
    "partitions; that is the checkpoint contract Structured Streaming "
    "guarantees.)",
)
def q_streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import dedup_increment

    src = ascending_doc_chunks(spark, sf_dir, 3)
    root = tempfile.mkdtemp(prefix="stream-dedup-")
    idx = f"{root}/idx"
    pairs_dir = f"{root}/pairs"
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        found = dedup_increment(
            s, idx, batch_df, increment_id=f"b{batch_id}", threshold=0.5
        )
        overwrite_partitions(
            found.withColumn("_batch_id", F.lit(batch_id)),
            pairs_dir,
            "_batch_id",
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stream-dedup-ckpt-"))
        .start()
    )
    q.awaitTermination()

    return (
        spark.read.parquet(pairs_dir)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


from ..plans.energy_queries import SCD2_ORACLE  # noqa: E402


@register(
    "streaming_scd2_maintenance",
    oracle=SCD2_ORACLE,  # the batch build's oracle — stream≡batch SCD2 gate
    doc="Continuous SCD2 dimension maintenance: tariff-switch events arrive "
    "as 3 HASH-chunked micro-batches (interleaved in event time — every "
    "batch after the first is late data for some customer), and each "
    "foreachBatch increment folds into the persisted bucket-partitioned "
    "dimension via operators/scd2.py::scd2_apply_increment — reconstruct "
    "ONLY the affected buckets' switches from stored rows, union the "
    "increment (deduped on full switch identity, so at-least-once batch "
    "retries are no-ops), window-rebuild that slice, dynamic-overwrite "
    "its partitions. The final store must equal the one-shot batch SCD2 "
    "build (SHARED oracle) — versions renumbered and validity ranges "
    "reopened across batch boundaries exactly as a full rebuild would. "
    "This is the streaming leg of the incremental-dimension triple "
    "(batch build / incremental apply / continuous fold), the warehouse "
    "counterpart of streaming_incremental_dedup. Work per batch is "
    "bucket-slice-sized; the dimension is never rebuilt whole.",
)
def q_streaming_scd2_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from ..operators.scd2 import scd2_apply_increment, scd2_init_store
    from ..sources.adapter import energy_events

    sw = (
        energy_events(spark, sf_dir)
        .where(F.col("event_type") == "tariff_switch")
        .select("customer_id", "tariff_type", "event_time", "event_id")
    )
    # 3 hash-chunk files -> time-interleaved ordered micro-batches
    src = tempfile.mkdtemp(prefix="scd2-chunks-")
    stage = tempfile.mkdtemp(prefix="scd2-chunks-stage-")
    for i in range(3):
        d = f"{stage}/c{i}"
        (
            sw.where(F.pmod(F.xxhash64(F.col("event_id")), F.lit(3)) == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(d)
        )
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        os.rename(f"{d}/{part}", f"{src}/chunk_{i}.parquet")
    shutil.rmtree(stage, ignore_errors=True)

    store = tempfile.mkdtemp(prefix="scd2-stream-") + "/dim"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        if not os.path.isdir(store):
            scd2_init_store(s, store, batch_df)
        else:
            scd2_apply_increment(s, store, batch_df)

    q = (
        spark.readStream.schema(sw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="scd2-stream-ckpt-"))
        .start()
    )
    q.awaitTermination()

    return spark.read.parquet(store).select(
        "customer_id", "tariff_type", "valid_from", "valid_to",
        "version", "is_current",
    )


from ..plans.energy_queries import ASOF_ACTIVE_TARIFF_ORACLE  # noqa: E402


@register(
    "streaming_asof_enrichment",
    oracle=ASOF_ACTIVE_TARIFF_ORACLE,  # batch entry's oracle — true batch≡streaming gate
    doc="Continuous point-in-time enrichment: events replay as 4 time-"
    "ascending micro-batches; each foreachBatch increment (1) lands its "
    "tariff switches into an accumulating store keyed by batch id "
    "(dynamic overwrite — replay-idempotent), then (2) as-of joins ITS "
    "OWN consumption readings against the full switch store (operators/"
    "asof.py union+carry, one customer_id shuffle over batch-sized "
    "readings) and appends the enriched rows. Time-ordered arrival "
    "guarantees every switch at-or-before a reading is already in the "
    "store when the reading's batch runs (equal timestamps share a "
    "chunk), so the union over batches equals the batch as-of EXACTLY — "
    "gated by the SAME DuckDB ASOF JOIN oracle as asof_active_tariff. "
    "This is the streaming enrichment shape (trade-vs-quote, reading-vs-"
    "price) a 100 TB pipeline runs continuously: per-batch work is "
    "batch-sized; the store grows switch-sized, never fact-sized.",
)
def q_streaming_asof_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    src = ascending_time_chunks(spark, sf_dir, 4)
    root = tempfile.mkdtemp(prefix="stream-asof-")
    sw_dir = f"{root}/switches"
    out_dir = f"{root}/enriched"
    schema = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet")).schema

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        view = f"asof_batch_{uuid.uuid4().hex[:8]}"
        batch_df.createOrReplaceTempView(view)
        en = s.sql(ENERGY_EVENTS_SQL.replace("FROM events", f"FROM {view}"))
        sw = (
            en.where(F.col("event_type") == "tariff_switch")
            .groupBy("customer_id", "event_time")
            .agg(F.max_by("tariff_type", "event_id").alias("active_tariff"))
        )
        overwrite_partitions(
            sw.withColumn("_batch_id", F.lit(batch_id)),
            sw_dir,
            "_batch_id",
        )
        readings = en.where(F.col("event_type") == "energy_consumed").select(
            "event_id",
            "customer_id",
            "event_time",
            F.col("energy_consumed").cast("double").alias("energy_consumed"),
        )
        store = s.read.parquet(sw_dir).select(
            "customer_id", "event_time", "active_tariff"
        )
        enriched = asof_join(
            readings, store, key="customer_id", ts="event_time",
            value_cols=["active_tariff"],
        )
        overwrite_partitions(
            enriched.withColumn("_batch_id", F.lit(batch_id)),
            out_dir,
            "_batch_id",
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stream-asof-ckpt-"))
        .start()
    )
    q.awaitTermination()

    return (
        spark.read.parquet(out_dir)
        .select("event_id", "customer_id", "event_time", "energy_consumed", "active_tariff")
        .orderBy("event_id")
    )


from ..plans.timeseries_queries import WAU_GROWTH_ORACLE  # noqa: E402


@register(
    "streaming_wau_growth",
    oracle=WAU_GROWTH_ORACLE,  # batch entry's oracle — true batch≡streaming gate
    doc="Continuous weekly-active-users: events replay as 3 time-ascending "
    "micro-batches; each foreachBatch increment lands its DISTINCT "
    "(week, user) pairs keyed by batch id (dynamic overwrite — replay-"
    "idempotent), a pairs-not-counts store, so cross-batch duplicates "
    "collapse in the final distinct count and the result equals the "
    "batch weekly_active_users_growth EXACTLY (SHARED oracle; events "
    "totals ride exact per-batch counts summed by week). The "
    "distinct-pair store is the mergeable sufficient statistic for "
    "exact distinct aggregation — the same reason "
    "hourly_business_metrics_twophase pre-aggregates pairs; at 100 TB "
    "the store is (weeks × active users) sized, not event sized.",
)
def q_streaming_wau_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    src = ascending_time_chunks(spark, sf_dir, 3)
    store = tempfile.mkdtemp(prefix="wau-") + "/pairs"
    schema = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet")).schema

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        pairs = batch_df.select(
            F.date_trunc("week", F.col("ts")).alias("week"), "user_id"
        ).distinct()
        counts = batch_df.groupBy(
            F.date_trunc("week", F.col("ts")).alias("week")
        ).agg(F.count(F.lit(1)).alias("events"))
        inc = pairs.join(counts, "week").select(
            "week", "user_id", "events"
        )
        overwrite_partitions(
            inc.withColumn("_batch_id", F.lit(batch_id)),
            store,
            "_batch_id",
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="wau-ckpt-"))
        .start()
    )
    q.awaitTermination()

    raw = spark.read.parquet(store)
    # events per (batch, week) were replicated onto every pair row of that
    # batch — recover them via per-(batch, week) first, then sum batches
    ev_per_week = (
        raw.groupBy("_batch_id", "week")
        .agg(F.first("events").alias("events"))
        .groupBy("week")
        .agg(F.sum("events").alias("events"))
    )
    wau = (
        raw.select("week", "user_id")
        .distinct()
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    wk = wau.join(ev_per_week, "week")
    w = Window.orderBy("week")
    prev = F.lag("wau").over(w)
    return wk.select(
        "week",
        F.col("wau").cast("long").alias("wau"),
        F.col("events").cast("long").alias("events"),
        prev.cast("long").alias("prev_wau"),
        F.when(prev > 0, (F.col("wau") - prev) / prev.cast("double") * 100.0).alias(
            "wau_growth_pct"
        ),
    )


# --------------------------------------------------------------------------
# Lake hour-key migration audit (round 16)
# --------------------------------------------------------------------------
LAKE_MIGRATION_AUDIT_ORACLE = (
    f"WITH energy_events AS ({ENERGY_EVENTS_SQL}),\n"
    "h AS (SELECT DISTINCT date_trunc('hour', event_time) AS hour\n"
    "      FROM energy_events ORDER BY hour LIMIT 24),\n"
    "c AS (SELECT hour, CAST(epoch(hour) AS BIGINT) AS e FROM h)\n"
    "SELECT hour,\n"
    "  CASE (e // 3600) % 3 WHEN 0 THEN 'legacy'\n"
    "                       WHEN 1 THEN 'mismatched'\n"
    "                       ELSE 'clean' END AS offender_class,\n"
    "  strftime(hour, '%Y-%m-%d-%H') || '-' || CAST(e AS VARCHAR)\n"
    "    AS migrated_key,\n"
    "  CAST(e % 1000 AS DOUBLE) AS val,\n"
    "  (SELECT CAST(count(*) AS BIGINT) FROM c WHERE (e // 3600) % 3 < 2)\n"
    "    AS n_rewritten\n"
    "FROM c"
)


@register(
    "lake_hour_key_migration_audit",
    oracle=LAKE_MIGRATION_AUDIT_ORACLE,
    doc="End-to-end audit of laketable.migrate_lake_hour_keys (round-15 "
    "verdict item 2): a 24-hour panel from the real events table lands in "
    "a transactional LakeTable with each hour's key deliberately written "
    "in one of the three formats the guards classify — legacy label-only, "
    "label/epoch-MISMATCHED (label shifted +1h, the shape of the r14 DST "
    "residue), or canonical — chosen by epoch-hour mod 3 so the oracle "
    "derives the same classes arithmetically. One migration call must "
    "rewrite exactly the offenders (n_rewritten pinned per row), after "
    "which EVERY key read back equals the canonical label+epoch key the "
    "oracle recomputes in SQL (whole-string equality — the same contract "
    "the write guards enforce) with row values preserved. Everything is "
    "tz-proof epoch arithmetic on both sides; no wall-clock rendering.",
)
def q_lake_hour_key_migration_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil

    from ..sources.adapter import energy_events
    from ..sources.laketable import LakeTable, migrate_lake_hour_keys
    from ..sources.sinks import _canonical_hour_key_for_epoch

    hours = (
        energy_events(spark, sf_dir)
        .select(F.date_trunc("hour", "event_time").alias("hour"))
        .distinct()
        .orderBy("hour")
        .limit(24)
    )
    epoch = F.col("hour").cast("long")
    cls = F.pmod((epoch / F.lit(3600)).cast("long"), F.lit(3))
    canon = _canonical_hour_key_for_epoch(epoch)
    lbl = F.regexp_extract(canon, r"^(\d{4}-\d{2}-\d{2}-\d{2})", 1)
    lbl_shift = F.regexp_extract(
        _canonical_hour_key_for_epoch(epoch + F.lit(3600)),
        r"^(\d{4}-\d{2}-\d{2}-\d{2})",
        1,
    )
    seeded_key = (
        F.when(cls == 0, lbl)
        .when(cls == 1, F.concat_ws("-", lbl_shift, epoch.cast("string")))
        .otherwise(canon)
    )
    offender_class = (
        F.when(cls == 0, F.lit("legacy"))
        .when(cls == 1, F.lit("mismatched"))
        .otherwise(F.lit("clean"))
    )
    root = tempfile.mkdtemp(prefix="lake-keymigration-audit-")
    try:
        table = LakeTable(f"{root}/lake")
        table.merge_upsert(
            spark,
            hours.select(
                "hour",
                seeded_key.alias("hour_key"),
                (epoch % 1000).cast("double").alias("val"),
            ),
            "hour_key",
        )
        n = migrate_lake_hour_keys(spark, f"{root}/lake")
        after = table.read(spark)
        # stage before the tmp store vanishes (catalog.stage_result keeps
        # the materialization distributed)
        from ..plans.catalog import stage_result

        return stage_result(
            spark,
            after.select(
                "hour",
                offender_class.alias("offender_class"),
                # read-back key: equality with the oracle's recomputed
                # canonical key IS the audited law
                F.col("hour_key").alias("migrated_key"),
                "val",
                F.lit(int(n)).cast("long").alias("n_rewritten"),
            ),
            "lake_hour_key_migration_audit",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
