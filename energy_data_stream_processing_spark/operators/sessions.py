"""Gap-based sessionization over the events stream.

The reference keeps no session model beyond a client-supplied ``session_id``
column (consumer/consumer.py:249), but session analysis is a first-class
capability for any event-analytics engine, so we provide it engine-side:
a session = a maximal run of one user's events with inter-event gaps below a
threshold.

Two implementations, cross-validated in tests:

- ``sessionize``: the canonical window-function plan (lag -> gap flag ->
  running sum -> groupBy). Fully dialect-neutral, so it has an exact DuckDB
  oracle twin.
- ``sessionize_native``: Spark's built-in ``session_window`` grouping —
  the same sessions by construction (its window end is last_ts + gap, a
  representational difference only).

Scale shape: ONE shuffle, on ``user_id``. The running-sum window and the
per-session groupBy both consume that same hash partitioning (Catalyst
recognizes hashpartitioning(user_id) satisfies clustering by
(user_id, session_no)), so adding the aggregate costs no second exchange.
Skewed users (bots) are the known risk at 100 TB: AQE skew handling applies
to the groupBy but not the window, so the standard mitigation is a
coarse pre-split of pathological users by day before sessionizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize_numbered(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Event-level frame with its per-user gap session number attached —
    the shared first stage of sessionize; exposed so basket-style session
    analyses (e.g. within-session co-occurrence) can reuse the numbering
    without re-deriving the window chain."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    with_flag = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0).alias("is_new"),
    )
    return with_flag.withColumn(
        "session_no", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user gap sessions with stable numbering.

    Ordering ties (equal ts) break on event_id so session numbering is
    deterministic under any input order.
    """
    numbered = sessionize_numbered(events, gap_minutes)
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("event_type").alias("n_event_types"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
                "duration_sec"
            ),
        )
    )


def sessionize_native(
    events: DataFrame, gap_minutes: int = 30, exact_distinct: bool = True
) -> DataFrame:
    """Same sessions via the built-in session_window (merging-window state);
    usable identically under readStream for the streaming path with
    ``exact_distinct=False`` (streaming aggregation forbids exact distincts —
    same documented trade as the hourly native stream)."""
    ndistinct = (
        F.count_distinct("event_type")
        if exact_distinct
        else F.approx_count_distinct("event_type")
    )
    return (
        events.groupBy("user_id", F.session_window("ts", f"{gap_minutes} minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            ndistinct.alias("n_event_types"),
        )
        .drop("session_window")
    )


def session_summary(sessions: DataFrame) -> DataFrame:
    """Corpus-level session stats (the dashboardable rollup)."""
    return sessions.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count_distinct("user_id").alias("n_users"),
        F.avg("n_events").alias("avg_events_per_session"),
        F.avg("duration_sec").alias("avg_duration_sec"),
        F.max("n_events").alias("max_session_events"),
    )
