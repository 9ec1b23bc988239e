"""Per-user time-series operators: time-weighted average, activity islands.

Factored out of the catalog queries so the property tests (randomized
differential vs pure-Python folds, tests/test_properties.py) exercise the
exact code the catalog runs. Both operators keep every window and groupBy
partitioned by ``user_id`` — one shuffle key reused down the chain (plan
shapes gated in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_weighted_value(ev: DataFrame) -> DataFrame:
    """Per-user time-weighted average of ``value`` over ``ts``.

    Each reading is weighted by the whole-seconds interval to the user's
    next reading (floor-divided microsecond delta — exact integer
    semantics); the weighted sum is decimal-exact with one double division
    at the end; ``nullif`` guards all-zero spans. Ties on ``ts`` are broken
    by the unique ``event_id``.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    deltas = (
        ev.select("user_id", "value", (F.lead(us).over(w) - us).alias("dt_us"))
        .where(F.col("dt_us").isNotNull())
        .select("user_id", "value", F.expr("dt_us div 1000000").alias("dt_s"))
    )
    weighted = F.col("value").cast("decimal(18,2)") * F.col("dt_s").cast("decimal(18,0)")
    return deltas.groupBy("user_id").agg(
        (
            F.sum(weighted).cast("double")
            / F.nullif(F.sum("dt_s"), F.lit(0)).cast("double")
        ).alias("twa_value"),
        F.sum("dt_s").alias("span_s"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


def activity_islands(ev: DataFrame) -> DataFrame:
    """Per-user streaks of consecutive active calendar days (gaps-and-islands).

    date-minus-row_number anchors group consecutive days; output is one row
    per user with streak count, longest streak, and total active days.
    """
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
    tagged = days.select("user_id", "d", F.date_sub("d", rn.cast("int")).alias("anchor"))
    streaks = tagged.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("streak_days"))
    return streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("streak_days").alias("longest_streak"),
        F.sum("streak_days").alias("active_days"),
    )
