"""Time-series and semi-structured queries over the driver ``events`` table.

Beyond-reference coverage (SURVEY.md §2.4 notes the reference has no JSON
functions past the initial parse, and no calendar densification): JSON
property extraction, dense-calendar gap filling with LOCF interpolation, and
CUBE grouping sets. All JVM-side — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.adapter import load_table
from .catalog import register


@register(
    "props_numeric_profile",
    oracle="""
SELECT event_type,
  count(*) AS n,
  count(cast(props->>'$.k' AS BIGINT)) AS n_with_k,
  cast(sum(cast(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
  max(cast(props->>'$.k' AS BIGINT)) AS max_k,
  cast(sum(cast(props->>'$.k' AS BIGINT)) AS DOUBLE) / count(cast(props->>'$.k' AS BIGINT)) AS avg_k
FROM events
GROUP BY event_type
""",
    doc="JSON property extraction: pull the numeric `k` out of the props JSON "
    "string per event (get_json_object — JVM-side Jackson path eval, no UDF) "
    "and profile it per event type. Integer sums are exact in both engines; "
    "the average divides identical operands. Scale: the JSON parse is "
    "per-row CPU inside whole-stage codegen; at 100 TB prefer parsing once "
    "at ingest into a typed column (from_json) rather than per query.",
)
def q_props_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(k).alias("n_with_k"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        (F.sum(k).cast("double") / F.count(k)).alias("avg_k"),
    )


@register(
    "hourly_gap_fill",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hr,
    count(*) AS n_events,
    cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
  FROM events GROUP BY 1
), bounds AS (SELECT min(hr) AS mn, max(hr) AS mx FROM hourly),
calendar AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr FROM bounds)
SELECT c.hr,
  coalesce(h.n_events, 0) AS n_events,
  coalesce(h.value_sum, 0.0) AS value_sum,
  last_value(h.value_sum IGNORE NULLS)
    OVER (ORDER BY c.hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value_sum
FROM calendar c LEFT JOIN hourly h ON c.hr = h.hr
""",
    doc="Dense-calendar gap fill + LOCF interpolation (energy-domain staple "
    "the reference's Grafana panels silently skip): hourly aggregate, "
    "sequence() explode of the min..max hour range as the spine, left join, "
    "zero-fill counts and carry the last observation forward for the "
    "continuous metric. Scale: the hourly aggregate is hours-sized "
    "(~9k rows/year) regardless of input scale, so the calendar join and the "
    "unpartitioned LOCF window are driver-trivial; only the first groupBy "
    "touches the fact.",
)
def q_hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
    )
    calendar = hourly.agg(F.min("hr").alias("mn"), F.max("hr").alias("mx")).select(
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias("hr")
    )
    w = Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, 0)
    return (
        calendar.join(hourly, "hr", "left")
        .select(
            "hr",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("value_sum", F.lit(0.0)).alias("value_sum"),
            F.last(F.col("value_sum"), ignorenulls=True).over(w).alias("locf_value_sum"),
        )
    )


@register(
    "event_type_hour_cube",
    oracle="""
SELECT event_type, hour(ts) AS hod,
  GROUPING(event_type, hour(ts)) AS gid,
  count(*) AS n,
  cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events
GROUP BY CUBE (event_type, hour(ts))
""",
    doc="CUBE grouping sets over event type x hour-of-day with an explicit "
    "grouping_id disambiguating subtotal rows from data NULLs (completes the "
    "grouping-sets family next to revenue_rollup's ROLLUP). Scale: Expand "
    "multiplies rows 4x before one partial-agg shuffle — acceptable because "
    "partial aggregation collapses each grouping set map-side.",
)
def q_event_type_hour_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type", F.hour("ts").alias("hod"), "value")
        .cube("event_type", "hod")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
    )


@register(
    "user_value_tiers",
    oracle="""
WITH per_user AS (
  SELECT user_id,
    count(*) AS n_events,
    cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM events GROUP BY user_id
)
SELECT user_id, n_events, total_value,
  ntile(4) OVER w AS value_quartile,
  cume_dist() OVER w AS value_cume_dist,
  dense_rank() OVER w AS value_dense_rank,
  first_value(user_id) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS top_user,
  last_value(user_id) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS bottom_user
FROM per_user
WINDOW w AS (ORDER BY total_value DESC, user_id)
""",
    doc="Window-function breadth over per-user totals: ntile quartiles, "
    "cume_dist, dense_rank, and first/last_value with an explicit full-frame "
    "(completing the window family next to LAG, PERCENT_RANK and the "
    "rolling frames of Q12-Q16). The unique (total, user_id) sort key makes "
    "every ranking deterministic. Scale: one unpartitioned window over a "
    "users-sized aggregate — at 100 TB tier within a partition key (e.g. "
    "region) or precompute quantile cutoffs and join, as for Q12.",
)
def q_user_value_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )
    w = Window.orderBy(F.col("total_value").desc(), F.col("user_id"))
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return per_user.select(
        "user_id",
        "n_events",
        "total_value",
        F.ntile(4).over(w).alias("value_quartile"),
        F.cume_dist().over(w).alias("value_cume_dist"),
        F.dense_rank().over(w).alias("value_dense_rank"),
        F.first("user_id").over(wf).alias("top_user"),
        F.last("user_id").over(wf).alias("bottom_user"),
    )


@register(
    "user_activity_islands",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, cast(ts AS DATE) AS d FROM events
), tagged AS (
  SELECT user_id, d,
    d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER) AS anchor
  FROM days
), streaks AS (
  SELECT user_id, anchor, count(*) AS streak_days
  FROM tagged GROUP BY user_id, anchor
)
SELECT user_id,
  count(*) AS n_streaks,
  max(streak_days) AS longest_streak,
  cast(sum(streak_days) AS BIGINT) AS active_days
FROM streaks GROUP BY user_id
""",
    doc="Gaps-and-islands: per-user streaks of consecutive active calendar "
    "days via the classic date-minus-row_number anchor trick, then streak "
    "stats per user. Every window and groupBy is partitioned by user_id, so "
    "the whole plan is one shuffle on the user key reused across all three "
    "stages (distinct, window, both groupBys collapse into the same hash "
    "partitioning) — no global window, scales linearly at 100 TB.",
)
def q_user_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import activity_islands

    return activity_islands(load_table(spark, sf_dir, "events"))


@register(
    "time_weighted_value",
    oracle="""
WITH deltas AS (
  SELECT user_id, value,
    (lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      - epoch_us(ts)) // 1000000 AS dt_s
  FROM events
)
SELECT user_id,
  cast(sum(cast(value AS DECIMAL(18,2)) * cast(dt_s AS DECIMAL(18,0))) AS DOUBLE)
    / cast(nullif(sum(dt_s), 0) AS DOUBLE) AS twa_value,
  cast(sum(dt_s) AS BIGINT) AS span_s,
  count(*) AS n_intervals
FROM deltas WHERE dt_s IS NOT NULL
GROUP BY user_id
""",
    doc="Time-weighted average (the physically-correct mean for irregularly "
    "sampled meter readings — a plain AVG over-weights bursts): each "
    "reading's value is weighted by its holding interval to the next reading "
    "of the same user. lead() is partitioned by user and tie-broken by the "
    "unique event_id; interval weights are whole seconds (floor-divided "
    "microsecond deltas — identical integer semantics in both engines, and "
    "small enough that the decimal-exact weighted sum converts to double "
    "without rounding past 2^53), with a single double division at the end "
    "and nullif guarding zero spans. Scale: one shuffle on user_id shared "
    "by the window and the groupBy.",
)
def q_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import time_weighted_value

    return time_weighted_value(load_table(spark, sf_dir, "events"))


@register(
    "top_value_days_per_user",
    oracle="""
WITH daily AS (
  SELECT user_id, cast(ts AS DATE) AS day,
    cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value,
    count(*) AS n_events
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY day_value DESC, day) AS rk
  FROM daily
)
SELECT user_id, day, day_value, n_events, rk FROM ranked WHERE rk <= 3
""",
    doc="Top-N per group: each user's three highest-value days. Daily "
    "pre-aggregation shrinks the fact before the per-user row_number ranks "
    "it (both stages hash on user_id — one logical shuffle chain, no global "
    "sort). day_value is derived from identical decimal sums in both "
    "engines, so the double ordering and tie-break on day are deterministic. "
    "Scale: the rank window sees at most days-per-user rows per partition; "
    "at 100 TB this is the standard pattern that avoids orderBy().limit() "
    "per group.",
)
def q_top_value_days_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("day_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    rk = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.col("day_value").desc(), "day")
    )
    return daily.select("*", rk.alias("rk")).where(F.col("rk") <= 3)


@register(
    "event_grouping_sets",
    oracle="""
SELECT event_type, dayofweek(ts) + 1 AS dow,
  GROUPING(event_type, dayofweek(ts) + 1) AS gid,
  count(*) AS n,
  cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events
GROUP BY GROUPING SETS ((event_type), (event_type, dayofweek(ts) + 1), ())
""",
    doc="Explicit asymmetric GROUPING SETS — per-type totals, per-(type, "
    "day-of-week) detail, and the grand total in one pass, with "
    "grouping_id disambiguating subtotal rows (completes the grouping "
    "family next to revenue_rollup's ROLLUP and event_type_hour_cube's "
    "CUBE). Dialect delta (SURVEY §7): DuckDB/Postgres dayofweek is "
    "0=Sunday, Spark's is 1=Sunday — the oracle carries the +1 offset. "
    "Scale: Expand emits 3 copies per row (vs CUBE's 4) before one "
    "partial-agg shuffle on tiny keys — the asymmetric form is exactly how "
    "you avoid paying for grouping sets nobody reads.",
)
def q_event_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return spark.sql(
        """
SELECT event_type, dayofweek(ts) AS dow,
  grouping_id(event_type, dayofweek(ts)) AS gid,
  count(*) AS n,
  cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM {ev}
GROUP BY GROUPING SETS ((event_type), (event_type, dayofweek(ts)), ())
""",
        ev=ev,
    )


@register(
    "retention_cohorts",
    oracle="""
WITH uw AS (SELECT DISTINCT user_id, cast(date_trunc('week', ts) AS TIMESTAMP) AS wk FROM events),
firsts AS (SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY 1)
SELECT f.cohort_week,
  cast(date_diff('day', f.cohort_week, u.wk) // 7 AS INT) AS week_offset,
  count(*) AS active_users
FROM uw u JOIN firsts f USING (user_id)
GROUP BY 1, 2
""",
    doc="Weekly retention-cohort matrix (classic product-analytics shape the "
    "reference's dashboards stop short of): cohort = each user's first "
    "active ISO week, cell = users from that cohort active at week offset "
    "k. Spark plan: dedup to (user, week) pairs, derive the cohort week "
    "with a partition-min window over the SAME user_id clustering, then a "
    "tiny (cohort, offset) count — the pairs dedup is the only fact-sized "
    "shuffle. Scale: (user, week) pairs are |users|x|weeks| at worst, "
    "orders of magnitude below the fact; per-user windows need no global "
    "sort; the final matrix is weeks^2-sized (driver-trivial).",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    w = Window.partitionBy("user_id")
    with_cohort = pairs.withColumn("cohort_week", F.min("wk").over(w))
    return with_cohort.groupBy(
        "cohort_week",
        (F.datediff(F.col("wk"), F.col("cohort_week")) / 7).cast("int").alias("week_offset"),
    ).agg(F.count(F.lit(1)).alias("active_users"))


@register(
    "rolling_7d_active_users",
    oracle="""
WITH du AS (SELECT DISTINCT cast(date_trunc('day', ts) AS TIMESTAMP) AS d, user_id FROM events),
days AS (SELECT DISTINCT d FROM du)
SELECT days.d, count(DISTINCT du.user_id) AS active_users_7d
FROM days JOIN du ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
GROUP BY 1
""",
    doc="Trailing-7-day distinct active users per day. COUNT(DISTINCT) over "
    "a sliding RANGE window is inexpressible as a Spark window function; "
    "the scalable rewrite is contribution-explode: dedup to (day, user) "
    "pairs, explode each pair into the 7 calendar days it contributes to "
    "(sequence() — narrow), then one count_distinct per day, semi-joined "
    "back to observed days. Scale: the x7 row multiplier applies to the "
    "deduped day-user pairs, not the fact; the alternative day x fact "
    "range join the oracle uses would be O(days * |fact|). Partial "
    "aggregation absorbs the distinct before the final day-keyed shuffle.",
)
def q_rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        F.date_trunc("day", F.col("ts")).alias("d"), "user_id"
    ).distinct()
    spine = pairs.select("d").distinct()
    contrib = pairs.select(
        F.explode(
            F.expr("sequence(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY)")
        ).alias("d"),
        "user_id",
    )
    counted = contrib.groupBy("d").agg(
        F.count_distinct("user_id").alias("active_users_7d")
    )
    return counted.join(F.broadcast(spine), "d", "left_semi")


@register(
    "trailing_window_burst",
    oracle="""
WITH e AS (
  SELECT user_id, cast(floor(epoch(cast(ts AS TIMESTAMP))) AS BIGINT) AS sec
  FROM events
),
w AS (
  SELECT user_id,
    count(*) OVER (PARTITION BY user_id ORDER BY sec
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS trailing_1h
  FROM e
)
SELECT user_id,
  count(*) AS n_events,
  max(trailing_1h) AS max_trailing_1h,
  count(CASE WHEN trailing_1h >= 5 THEN 1 END) AS burst_events
FROM w GROUP BY user_id
""",
    doc="Trailing-interval window burst detection: at EVERY event, the count "
    "of that user's events in the preceding hour via a RANGE frame over "
    "epoch seconds (the value-based frame family — ROWS frames elsewhere "
    "in the catalog count physical rows; RANGE counts by time distance, "
    "which is what rate limiting / bot detection actually asks). Rows in "
    "the same second are frame peers, included together in both engines, "
    "so ordering ties are semantics-free. Per-user rollup: peak trailing "
    "rate and how many events sat inside a burst (>=5 in the hour). "
    "Spark plan: ONE shuffle on user_id shared by the window sort and the "
    "groupBy (same key chain as user_sessions). Scale: RANGE frames "
    "stream per partition with a sliding pointer — no per-row rescan; "
    "skewed hot users bound the partition, mitigate by splitting the "
    "window per (user, day) when a single user exceeds a partition.",
)
def q_trailing_window_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("user_id", F.floor(F.unix_timestamp("ts")).cast("long").alias("sec"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    flagged = e.select("user_id", F.count(F.lit(1)).over(w).alias("trailing_1h"))
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("trailing_1h").alias("max_trailing_1h"),
        F.count(F.when(F.col("trailing_1h") >= 5, 1)).alias("burst_events"),
    )


@register(
    "changelog_compaction",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
kept AS (
  SELECT user_id, ts, event_id, event_type
  FROM ordered
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id,
  count(*) AS n_kept,
  (SELECT count(*) FROM events e WHERE e.user_id = kept.user_id) AS n_raw,
  count(DISTINCT event_type) AS n_states
FROM kept GROUP BY user_id
""",
    doc="Changelog compaction (CDC consecutive-dedup): per key, keep only "
    "rows whose state CHANGED from the previous row in (ts, event_id) "
    "order — the compaction every upsert/changelog consumer runs so "
    "downstream state stores process transitions, not heartbeats. The "
    "per-user audit reports kept vs raw row counts and distinct states. "
    "Spark plan: one lag window and the rollup on the same user_id "
    "shuffle; the correlated raw count in the oracle is a grouped count "
    "joined back in Spark (same values, join-free correlation is a "
    "DuckDB-side convenience). Scale: compaction is embarrassingly "
    "parallel per key — window state is one row; output shrinks to the "
    "transition count, which is what makes downstream MERGE traffic "
    "tractable at 100 TB.",
)
def q_changelog_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.withColumn("prev_type", F.lag("event_type").over(w))
    kept = ordered.where(
        F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    )
    per_user = kept.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.count_distinct("event_type").alias("n_states"),
    )
    raw = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_raw"))
    return per_user.join(raw, "user_id").select(
        "user_id", "n_kept", "n_raw", "n_states"
    )


@register(
    "inter_event_gap_profile",
    oracle="""
WITH seq AS (
  SELECT event_type,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
),
gaps AS (SELECT event_type, cast(gap_us AS DOUBLE) / 1e6 AS gap_s FROM seq WHERE gap_us IS NOT NULL)
SELECT event_type, count(*) AS n_gaps,
  quantile_cont(gap_s, 0.5) AS p50_gap_s,
  quantile_cont(gap_s, 0.95) AS p95_gap_s,
  max(gap_s) AS max_gap_s
FROM gaps GROUP BY event_type
""",
    doc="Inter-arrival gap profile per event type: the per-user gap "
    "preceding each event (lag over the user timeline), summarized as "
    "exact p50/p95/max — the capacity-planning and session-timeout-"
    "calibration numbers (a sessionization gap threshold should sit "
    "beyond p95 of within-session gaps). Integer-microsecond gaps make "
    "the interpolated percentiles value-exact cross-engine. Plan: one "
    "user_id shuffle for the lag, then a types-sized percentile agg "
    "(exact sort per small group; approx_percentile is the documented "
    "100 TB swap).",
)
def q_inter_event_gap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        (F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)).alias(
            "gap_us"
        ),
    )
    gaps = seq.where(F.col("gap_us").isNotNull()).select(
        "event_type", (F.col("gap_us").cast("double") / 1e6).alias("gap_s")
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.expr("percentile(gap_s, 0.5)").alias("p50_gap_s"),
        F.expr("percentile(gap_s, 0.95)").alias("p95_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )


@register(
    "hour_of_week_seasonality",
    oracle="""
WITH slots AS (
  SELECT (cast(strftime(ts, '%w') AS INTEGER) * 24
          + cast(strftime(ts, '%H') AS INTEGER)) AS how,
    count(*) AS n
  FROM events GROUP BY 1
),
tot AS (SELECT cast(sum(n) AS DOUBLE) AS t FROM slots)
SELECT how AS hour_of_week, cast(n AS BIGINT) AS n,
  cast(n AS DOUBLE) / t AS share,
  cast(n AS DOUBLE) / (t / 168.0) AS load_factor
FROM slots, tot
""",
    doc="Hour-of-week seasonality heatmap (0 = Sunday 00:00 .. 167 = "
    "Saturday 23:00): event share per weekly slot and load factor vs the "
    "uniform 1/168 baseline — the weekly rhythm capacity planning and "
    "anomaly baselining start from (hourly_anomaly_zscore's per-type "
    "z-scores assume this profile is stationary; this query IS that "
    "profile). Integer counts, deterministic day-of-week arithmetic "
    "(Spark dayofweek is 1-based Sunday; %w is 0-based — offset "
    "reconciled). Plan: one 168-key map-side-combinable agg; the total "
    "is a broadcast scalar.",
)
def q_hour_of_week_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    slots = ev.groupBy(
        ((F.dayofweek(F.col("ts")) - 1) * 24 + F.hour(F.col("ts"))).alias("hour_of_week")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = slots.agg(F.sum("n").cast("double").alias("t"))
    return slots.join(F.broadcast(tot)).select(
        "hour_of_week",
        F.col("n").cast("long").alias("n"),
        (F.col("n").cast("double") / F.col("t")).alias("share"),
        (F.col("n").cast("double") / (F.col("t") / 168.0)).alias("load_factor"),
    )


@register(
    "burstiness_index",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
  FROM events GROUP BY 1, 2
),
mom AS (
  SELECT event_type, count(*) AS h, sum(n) AS sn, sum(n * n) AS snn
  FROM hourly GROUP BY 1
)
SELECT event_type, cast(h AS BIGINT) AS n_hours,
  cast(sn AS DOUBLE) / h AS mean_per_hour,
  (cast(snn AS DOUBLE) - cast(sn AS DOUBLE) * sn / h) / (h - 1)
    / (cast(sn AS DOUBLE) / h) AS fano_factor
FROM mom WHERE h > 1
""",
    doc="Burstiness (Fano factor) per event type: variance-to-mean ratio "
    "of hourly counts — 1.0 for Poisson arrivals, >1 bursty, <1 "
    "regular/throttled. The single number that says whether a stream's "
    "load is schedulable or spiky (and whether the reservoir/sampling "
    "rates can assume Poisson). Derived entirely from integer "
    "(count, sum, sum-of-squares) moments per type — identical IEEE "
    "expressions cross-engine, no float accumulation. Plan: (type, hour) "
    "partial agg then a types-sized moment agg, same shape as "
    "hourly_anomaly_zscore.",
)
def q_burstiness_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    mom = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("h"),
        F.sum("n").alias("sn"),
        F.sum(F.col("n") * F.col("n")).alias("snn"),
    ).where(F.col("h") > 1)
    mean = F.col("sn").cast("double") / F.col("h")
    var = (
        F.col("snn").cast("double") - F.col("sn").cast("double") * F.col("sn") / F.col("h")
    ) / (F.col("h") - 1)
    return mom.select(
        "event_type",
        F.col("h").cast("long").alias("n_hours"),
        mean.alias("mean_per_hour"),
        (var / mean).alias("fano_factor"),
    )


@register(
    "seasonal_anomaly_zscore",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
    (cast(strftime(ts, '%w') AS INTEGER) * 24
     + cast(strftime(ts, '%H') AS INTEGER)) AS how,
    count(*) AS n
  FROM events GROUP BY 1, 2, 3
),
slot_stats AS (
  SELECT event_type, how, count(*) AS k, sum(n) AS sn, sum(n * n) AS snn
  FROM hourly GROUP BY 1, 2
),
scored AS (
  SELECT h.event_type, h.hour, h.n,
    cast(s.sn AS DOUBLE) / s.k AS slot_mean,
    (h.n - cast(s.sn AS DOUBLE) / s.k)
      / sqrt((s.snn - cast(s.sn AS DOUBLE) * s.sn / s.k) / (s.k - 1)) AS z
  FROM hourly h JOIN slot_stats s USING (event_type, how)
  WHERE s.k > 1 AND s.snn * s.k > s.sn * s.sn
)
SELECT event_type, hour, n, slot_mean, z
FROM scored WHERE abs(z) > 1.4
""",
    doc="Seasonally-adjusted anomaly screen: each (type, hour) count is "
    "z-scored against ITS OWN hour-of-week slot's mean/stddev across "
    "weeks — a Monday-09:00 spike is judged against Monday-09:00s, not "
    "the flat per-type baseline of hourly_anomaly_zscore (which flags "
    "every rush hour). This is the residual-after-seasonality detector "
    "real ops alerting needs once hour_of_week_seasonality shows the "
    "profile is non-uniform. Exact integer (k, sum, sum-of-squares) "
    "moments per slot; constant-count slots (zero variance) are excluded "
    "exactly in both engines. Plan: one (type, hour) partial agg (how "
    "derives from hour — no second fact pass), slot moments over the "
    "tiny frame, broadcast join back.",
)
def q_seasonal_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        ((F.dayofweek(F.col("ts")) - 1) * 24 + F.hour(F.col("ts"))).alias("how"),
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hourly.groupBy("event_type", "how").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("sn"),
        F.sum(F.col("n") * F.col("n")).alias("snn"),
    )
    mean = F.col("sn").cast("double") / F.col("k")
    var = (
        F.col("snn") - F.col("sn").cast("double") * F.col("sn") / F.col("k")
    ) / (F.col("k") - 1)
    scored = (
        hourly.join(
            F.broadcast(
                stats.where(
                    (F.col("k") > 1)
                    & (F.col("snn") * F.col("k") > F.col("sn") * F.col("sn"))
                )
            ),
            ["event_type", "how"],
        )
        .withColumn("slot_mean", mean)
        .withColumn("z", (F.col("n") - mean) / F.sqrt(var))
    )
    return scored.where(F.abs(F.col("z")) > 1.4).select(
        "event_type", "hour", "n", "slot_mean", "z"
    )


WAU_GROWTH_ORACLE = """
WITH wk AS (
  SELECT cast(date_trunc('week', ts) AS TIMESTAMP) AS week,
    count(DISTINCT user_id) AS wau,
    count(*) AS events
  FROM events GROUP BY 1
)
SELECT week, cast(wau AS BIGINT) AS wau, cast(events AS BIGINT) AS events,
  cast(lag(wau) OVER (ORDER BY week) AS BIGINT) AS prev_wau,
  CASE WHEN lag(wau) OVER (ORDER BY week) > 0
       THEN (wau - lag(wau) OVER (ORDER BY week))
              / cast(lag(wau) OVER (ORDER BY week) AS DOUBLE) * 100.0 END
    AS wau_growth_pct
FROM wk
"""


@register(
    "weekly_active_users_growth",
    oracle=WAU_GROWTH_ORACLE,
    doc="Weekly active users with week-over-week growth: the top-line "
    "engagement KPI next to rolling_7d_active_users' daily trailing "
    "window — calendar-week exact distincts plus a lag growth rate over "
    "the weeks-sized frame. Plan: one (week, user) exact-distinct agg "
    "(Expand x1 on the fact), then the lag window over ~tens of rows; "
    "approx_count_distinct is the 100 TB swap with the same shape.",
)
def q_weekly_active_users_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wk = ev.groupBy(F.date_trunc("week", F.col("ts")).alias("week")).agg(
        F.count_distinct("user_id").alias("wau"),
        F.count(F.lit(1)).alias("events"),
    )
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
