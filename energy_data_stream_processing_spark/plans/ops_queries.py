"""Ops-dashboard twins of the reference's PromQL panels.

The reference ships a Prometheus/Grafana ops dashboard
(monitoring/grafana/dashboards/dashboard.json) whose panels are PromQL over
the producer/consumer metrics: ``rate(events_processed_total[...])`` for
throughput and ``histogram_quantile(0.95, rate(batch_duration_seconds_bucket
[...]))`` for processing latency. The engine exports the same series
(functions/observe.py: ProgressCapture + prometheus_exposition); these
catalog entries derive the panels' MATH as queries so the ops surface is
oracle-gated like every data query.

Listener-captured progress isn't reproducible across runs, so the metric
frame here is modeled deterministically from the events table: one
micro-batch per event-time minute, ``numInputRows`` = its row count, and a
modeled latency of ``(5 + rows) ms`` (fixed trigger overhead + linear
per-row cost — the shape of the reference's histogram envelope,
consumer/consumer.py:31). The PromQL math on top is the real thing:
counter-delta over wall-clock delta for rate, and Prometheus's
linear-interpolation-within-bucket algorithm for histogram_quantile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.observe import LATENCY_BUCKETS_S
from ..sources.adapter import load_table
from .catalog import register

# Shared micro-batch model (one batch per event-time minute).
_BATCHES_SQL = """
batches AS (
  SELECT date_trunc('minute', ts) AS batch_ts,
         count(*) AS n_rows,
         (5 + count(*)) / 1000.0 AS dur_s
  FROM events
  GROUP BY date_trunc('minute', ts)
)
"""


def _batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("minute", F.col("ts")).alias("batch_ts")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        ((F.lit(5) + F.count(F.lit(1))) / F.lit(1000.0)).alias("dur_s"),
    )


@register(
    "ops_events_rate",
    oracle=f"""WITH {_BATCHES_SQL}
SELECT batch_ts, n_rows,
       cast(n_rows AS DOUBLE) * 1000000.0
         / (epoch_us(batch_ts)
            - epoch_us(lag(batch_ts) OVER (ORDER BY batch_ts))) AS rate_per_s
FROM batches
QUALIFY lag(batch_ts) OVER (ORDER BY batch_ts) IS NOT NULL
ORDER BY batch_ts
""",
    doc="PromQL rate() twin (dashboard.json events-rate panel): per scrape "
    "instant, counter increase over wall-clock delta to the previous "
    "instant — events/sec exactly as Prometheus computes it over the "
    "events_input_rows_total counter the engine exports. Scale: ONE "
    "groupBy(minute) over the pruned scan, then a window over the "
    "minutes-sized frame (bounded: 1440 rows/day regardless of event "
    "volume) — the global orderBy window never touches raw events.",
)
def q_ops_events_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _batches(spark, sf_dir)
    w = Window.orderBy("batch_ts")
    prev = F.lag("batch_ts").over(w)
    return (
        b.select(
            "batch_ts",
            "n_rows",
            (
                F.col("n_rows").cast("double")
                * F.lit(1000000.0)
                / (F.unix_micros(F.col("batch_ts")) - F.unix_micros(prev))
            ).alias("rate_per_s"),
            prev.alias("_prev"),
        )
        .where(F.col("_prev").isNotNull())
        .drop("_prev")
        .orderBy("batch_ts")
    )


def _p95_oracle() -> str:
    bucket_rows = ", ".join(
        f"({i + 1}, {le!r})" for i, le in enumerate(LATENCY_BUCKETS_S)
    )
    n_b = len(LATENCY_BUCKETS_S)
    return f"""WITH {_BATCHES_SQL},
tot AS (SELECT count(*) AS n FROM batches),
hist AS (
  SELECT b.idx, b.le, count(*) FILTER (WHERE bt.dur_s <= b.le) AS cum
  FROM (VALUES {bucket_rows}) b(idx, le) CROSS JOIN batches bt
  GROUP BY b.idx, b.le
),
sel AS (
  SELECT min(idx) AS idx FROM hist, tot WHERE cum >= 0.95 * cast(n AS DOUBLE)
)
SELECT cast(n AS BIGINT) AS n_batches,
       CASE
         WHEN sel.idx IS NULL THEN {LATENCY_BUCKETS_S[-1]!r}
         ELSE coalesce(lo.le, 0.0)
              + (hi.le - coalesce(lo.le, 0.0))
                * (0.95 * cast(n AS DOUBLE) - coalesce(lo.cum, 0))
                / (hi.cum - coalesce(lo.cum, 0))
       END AS p95_latency_s
FROM tot, sel
LEFT JOIN hist hi ON hi.idx = sel.idx
LEFT JOIN hist lo ON lo.idx = sel.idx - 1
-- sel.idx NULL means the quantile falls in the +Inf bucket; Prometheus
-- returns the highest finite bucket bound ({n_b} buckets, le {LATENCY_BUCKETS_S[-1]!r})
"""


def histogram_p95(batches_df: DataFrame) -> DataFrame:
    """Prometheus ``histogram_quantile(0.95, ...)`` over a ``dur_s`` column:
    bucket CDF as conditional counts in ONE aggregate, then bucketQuantile's
    linear interpolation inside the target bucket, with the +Inf overflow
    clamped to the highest finite bound. Split out of the catalog entry so
    the algorithm is unit-testable on synthetic distributions (overflow and
    first-bucket edges included) against an independent reference."""
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.count(F.when(F.col("dur_s") <= le, 1)).alias(f"c{i}")
        for i, le in enumerate(LATENCY_BUCKETS_S)
    ]
    wide = batches_df.agg(*aggs)
    les = F.array(*[F.lit(float(le)) for le in LATENCY_BUCKETS_S])
    cums = F.array(*[F.col(f"c{i}") for i in range(len(LATENCY_BUCKETS_S))])
    target = F.lit(0.95) * F.col("n").cast("double")
    # 0-based index of the first bucket whose cum >= target == the number
    # of buckets strictly below the target rank
    idx = F.size(F.filter(cums, lambda c: c.cast("double") < target))
    lo_le = F.when(idx == 0, F.lit(0.0)).otherwise(F.element_at(les, idx))
    lo_cum = F.when(idx == 0, F.lit(0)).otherwise(F.element_at(cums, idx))
    hi_le = F.element_at(les, idx + 1)
    hi_cum = F.element_at(cums, idx + 1)
    n_buckets = len(LATENCY_BUCKETS_S)
    p95 = F.when(idx >= n_buckets, F.lit(float(LATENCY_BUCKETS_S[-1]))).otherwise(
        lo_le + (hi_le - lo_le) * (target - lo_cum) / (hi_cum - lo_cum)
    )
    return wide.select(
        F.col("n").cast("long").alias("n_batches"),
        p95.alias("p95_latency_s"),
    )


@register(
    "ops_latency_p95",
    oracle=_p95_oracle(),
    doc="PromQL histogram_quantile(0.95, batch_duration_seconds_bucket) "
    "twin (dashboard.json latency panel): cumulative bucket counts over "
    "the reference's 1ms-5s histogram envelope (consumer/consumer.py:31), "
    "then Prometheus's linear interpolation inside the target bucket — "
    "lower + (upper-lower) * (rank-cumBelow)/(cumIn-cumBelow), with the "
    "+Inf overflow clamped to the highest finite bound, exactly as "
    "promql's bucketQuantile does. UDF-free: the bucket CDF is 8 "
    "conditional counts in ONE aggregate over the minutes-sized batch "
    "frame; the interpolation is array/higher-order expressions on a "
    "1-row frame. Scale: input is bounded by minutes, not events. The "
    "interpolation stage (histogram_p95) is additionally unit-gated "
    "against an independent promql bucketQuantile port on synthetic "
    "distributions covering overflow and first-bucket edges.",
)
def q_ops_latency_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    return histogram_p95(_batches(spark, sf_dir))
