"""Sessionization catalog entries over the driver's generic ``events`` table.

The manual window-function plan is dialect-neutral, so its DuckDB oracle is
the SAME logical query — an exact value-level differential gate on a
stateful-looking operator. The native ``session_window`` variant is checked
against the manual one in tests/test_sessions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.sessions import session_summary, sessionize
from ..sources.adapter import load_table
from .catalog import register

_SESSIONS_ORACLE_CTE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
              OR cast(floor(epoch(ts)) AS BIGINT) - cast(floor(epoch(lag(ts) OVER w)) AS BIGINT) > {gap_sec}
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *, cast(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM flagged
),
sessions AS (
  SELECT user_id, session_no,
    min(ts) AS session_start,
    max(ts) AS session_end,
    count(*) AS n_events,
    count(DISTINCT event_type) AS n_event_types,
    cast(floor(epoch(max(ts))) AS BIGINT) - cast(floor(epoch(min(ts))) AS BIGINT) AS duration_sec
  FROM numbered
  GROUP BY user_id, session_no
)
"""


@register(
    "user_sessions",
    oracle=_SESSIONS_ORACLE_CTE.format(gap_sec=1800)
    + "SELECT user_id, session_no, session_start, session_end, n_events, n_event_types, duration_sec FROM sessions",
    headline=True,
    doc="Gap-based sessionization (30 min): lag -> flag -> running sum -> "
    "per-session aggregates; ONE shuffle on user_id shared by the window "
    "and the groupBy.",
)
def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_table(spark, sf_dir, "events"), gap_minutes=30)


@register(
    "session_summary",
    oracle=_SESSIONS_ORACLE_CTE.format(gap_sec=1800)
    + """
SELECT count(*) AS n_sessions,
       count(DISTINCT user_id) AS n_users,
       avg(n_events) AS avg_events_per_session,
       avg(duration_sec) AS avg_duration_sec,
       max(n_events) AS max_session_events
FROM sessions
""",
    doc="Corpus-level session rollup over the sessionization operator.",
)
def q_session_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_summary(sessionize(load_table(spark, sf_dir, "events"), gap_minutes=30))


@register(
    "streaming_user_sessions",
    oracle=_SESSIONS_ORACLE_CTE.format(gap_sec=1800)
    + "SELECT user_id, session_start, session_end, n_events FROM sessions",
    doc="Sessionization under Structured Streaming: native session_window "
    "(merging event-time windows, watermarked) run with availableNow — "
    "shares the BATCH sessions oracle, so streaming==batch is "
    "differential-checked. n_event_types excluded (streaming forbids exact "
    "distincts).",
)
def q_streaming_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessions import sessionize_native
    from ..streaming.runner import run_stream_to_table, stream_raw_events

    stream = stream_raw_events(spark, sf_dir)
    agg = sessionize_native(
        stream.withWatermark("ts", "1 hour"), gap_minutes=30, exact_distinct=False
    )
    out = run_stream_to_table(spark, agg, mode="complete")
    return out.select("user_id", "session_start", "session_end", "n_events")


@register(
    "ordered_event_funnel",
    oracle="""
WITH u1 AS (
  SELECT user_id, min(ts) FILTER (WHERE event_type = 'signup') AS t1
  FROM events GROUP BY 1
),
u2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN u1 ON e.user_id = u1.user_id
  WHERE e.event_type = 'view' AND e.ts > u1.t1
  GROUP BY 1
),
u3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN u2 ON e.user_id = u2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > u2.t2
  GROUP BY 1
)
SELECT
  (SELECT count(*) FROM u1 WHERE t1 IS NOT NULL) AS signup_users,
  (SELECT count(*) FROM u2) AS then_view_users,
  (SELECT count(*) FROM u3) AS then_purchase_users
""",
    doc="Strictly-ordered three-stage funnel (signup -> later view -> later "
    "purchase), unlike the reference's engagement funnel "
    "(business-metrics.json:352) which counts stages independently of "
    "order. Each user's stage-2 anchor is the earliest view AFTER their "
    "earliest signup, and stage 3 the earliest purchase after that — "
    "computed with two stacked unbounded min-windows over ONE user_id "
    "partitioning (the conditional min over `ts > t1` nests the first "
    "window's result inside the second's aggregate), so the whole funnel "
    "is a single shuffle plus a global count. Scale: no self-joins — the "
    "oracle's join-per-stage formulation would re-shuffle the fact per "
    "stage; the window form clusters by user once and streams.",
)
def q_ordered_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    staged = (
        ev.select("user_id", "ts", "event_type")
        .withColumn("t1", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w))
        .withColumn(
            "t2",
            F.min(
                F.when((F.col("event_type") == "view") & (F.col("ts") > F.col("t1")), F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")), F.col("ts")
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return per_user.agg(
        F.count("t1").alias("signup_users"),
        F.count("t2").alias("then_view_users"),
        F.count("t3").alias("then_purchase_users"),
    )


@register(
    "peak_concurrency",
    oracle=_SESSIONS_ORACLE_CTE.format(gap_sec=1800)
    + """,
marks AS (
  SELECT session_start AS ts, 1 AS delta FROM sessions
  UNION ALL
  SELECT session_end AS ts, -1 AS delta FROM sessions
),
swept AS (
  SELECT ts,
    sum(delta) OVER (ORDER BY ts, delta DESC ROWS UNBOUNDED PRECEDING) AS concurrent
  FROM marks
)
SELECT cast(concurrent AS BIGINT) AS max_concurrent_sessions, ts AS first_at
FROM swept ORDER BY concurrent DESC, ts LIMIT 1
""",
    doc="Peak concurrency via sweep line: sessionize (gap 30 min), emit "
    "+1/-1 marks at session start/end, running sum ordered by (ts, starts "
    "before ends), take the max and the first instant it is reached — the "
    "interval-overlap maximum no windowed aggregate expresses directly. "
    "Start-before-end tie order makes zero-length (single-event) sessions "
    "count as momentarily active; the set of (ts, running) rows is "
    "tie-order stable, so the gate is exact. Scale: the global "
    "unpartitioned sweep window is the honest cost — marks are "
    "2x|sessions| (tiny vs the fact), and at 100 TB the sweep shards by "
    "day with per-shard offsets carried forward (prefix sums compose); "
    "the final top-1 is TakeOrdered, not a global sort.",
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    sess = sessionize(load_table(spark, sf_dir, "events"), gap_minutes=30)
    marks = sess.select(
        F.col("session_start").alias("ts"), F.lit(1).alias("delta")
    ).unionAll(sess.select(F.col("session_end").alias("ts"), F.lit(-1).alias("delta")))
    w = (
        Window.orderBy(F.col("ts"), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = marks.select("ts", F.sum("delta").over(w).alias("concurrent"))
    return (
        swept.orderBy(F.col("concurrent").desc(), "ts")
        .limit(1)
        .select(
            F.col("concurrent").alias("max_concurrent_sessions"),
            F.col("ts").alias("first_at"),
        )
    )


@register(
    "session_pattern_match",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
              OR cast(floor(epoch(ts)) AS BIGINT) - cast(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *, cast(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM flagged
),
seqs AS (
  SELECT user_id, session_no,
    array_to_string(list(event_type ORDER BY ts, event_id), '>') AS seq,
    count(*) AS n_events
  FROM numbered GROUP BY user_id, session_no
)
SELECT regexp_matches(seq, '(^|>)view>([a-z_]+>)*purchase(>|$)') AS matched,
  count(*) AS n_sessions,
  count(DISTINCT user_id) AS n_users,
  cast(sum(n_events) AS BIGINT) AS total_events,
  cast(sum(n_events) AS DOUBLE) / count(*) AS avg_events
FROM seqs GROUP BY 1
""",
    doc="Complex-event-processing pattern match (the MATCH_RECOGNIZE shape "
    "Spark SQL lacks): sessionize (30 min gap), serialize each session's "
    "event types in (ts, event_id) order into a '>'-joined sequence "
    "string, then regex-match the behavioral pattern 'a view later "
    "followed by a purchase within the session'. The deterministic "
    "ordered serialization (sort_array over (ts, event_id, type) structs) "
    "makes the regex a total function of the session — both engines "
    "search the same string with the same pattern. Spark plan: the "
    "session numbering window and the per-session collect share ONE "
    "user_id shuffle (the user_sessions chain); the pattern filter and "
    "rollup run on the sessions-sized frame. Scale: sequence strings are "
    "bounded by session length (per-key, not corpus); pathological "
    "never-idle keys need a session cap, same mitigation as "
    "sessionization itself; the regex runs codegen-side, no UDF.",
)
def q_session_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.floor(F.unix_timestamp("ts")).cast("long")
    prev_sec = F.lag(sec).over(w)
    is_new = F.when(prev_sec.isNull() | ((sec - prev_sec) > 1800), 1).otherwise(0)
    numbered = ev.withColumn(
        "session_no", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    seqs = numbered.groupBy("user_id", "session_no").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("seq"),
        F.count(F.lit(1)).alias("n_events"),
    )
    matched = F.col("seq").rlike("(^|>)view>([a-z_]+>)*purchase(>|$)")
    return seqs.groupBy(matched.alias("matched")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum("n_events").alias("total_events"),
        (F.sum("n_events").cast("double") / F.count(F.lit(1))).alias("avg_events"),
    )


@register(
    "session_type_cooccurrence",
    oracle=_SESSIONS_ORACLE_CTE.format(gap_sec=1800)
    + """,
stypes AS (
  SELECT DISTINCT user_id, session_no, event_type FROM numbered
),
n_sessions AS (SELECT cast(count(*) AS DOUBLE) AS ns FROM sessions),
singles AS (
  SELECT event_type, count(*) AS n FROM stypes GROUP BY 1
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_both
  FROM stypes a JOIN stypes b
    ON a.user_id = b.user_id AND a.session_no = b.session_no
   AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, cast(p.n_both AS BIGINT) AS n_both,
  cast(p.n_both AS DOUBLE) / t.ns AS support,
  (cast(p.n_both AS DOUBLE) / t.ns)
    / ((sa.n / t.ns) * (sb.n / t.ns)) AS lift
FROM pairs p
JOIN singles sa ON sa.event_type = p.type_a
JOIN singles sb ON sb.event_type = p.type_b
CROSS JOIN n_sessions t
""",
    doc="Within-session event-type co-occurrence with lift: which "
    "behaviors happen together in one sitting (support = share of "
    "sessions containing both types; lift vs independence) — the "
    "market-basket analysis of the session stream, reusing the "
    "sessionization CTE as its basket builder (sessions are the baskets, "
    "types the items). Plan: sessionize's one user_id shuffle, distinct "
    "(session, type) map-side, pair-gen per session bounded by |types|, "
    "then a types²-sized rollup with the session count broadcast.",
)
def q_session_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.sessions import sessionize_numbered

    numbered = sessionize_numbered(load_table(spark, sf_dir, "events"), gap_minutes=30)
    stypes = numbered.select("user_id", "session_no", "event_type").distinct()
    ns = stypes.select("user_id", "session_no").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("ns")
    )
    singles = stypes.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = stypes.alias("a")
    b = stypes.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_no") == F.col("b.session_no"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"), F.col("b.event_type").alias("type_b")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .join(F.broadcast(ns))
        .select(
            "type_a",
            "type_b",
            F.col("n_both").cast("long").alias("n_both"),
            (F.col("n_both").cast("double") / F.col("ns")).alias("support"),
            (
                (F.col("n_both").cast("double") / F.col("ns"))
                / ((F.col("na") / F.col("ns")) * (F.col("nb") / F.col("ns")))
            ).alias("lift"),
        )
    )
