"""As-of (point-in-time) join — a composition of built-in operators.

Spark has no native ASOF JOIN (DuckDB does — which makes it a genuinely
independent oracle). The classic scalable formulation avoids a join
entirely:

1. tag both sides and UNION them into one (key, ts)-ordered stream;
2. one window pass per key carries the latest right-side values forward
   (``last_value(..., ignoreNulls)`` over rows UNBOUNDED PRECEDING..CURRENT);
3. keep only left rows.

Cost: ONE shuffle on the key (the union is free), versus the naive
per-left-row correlated subquery (quadratic) or a range join (planner-
dependent). Right-side rows sort BEFORE left rows at equal ts (tag order),
so ties resolve as "a switch at time T applies to a reading at time T" —
matching ASOF JOIN's ``ts >= r.ts`` semantics.

At 100 TB: partition-by-key parallelism is total; per-key state is one row
(the carried values); skewed keys fall back to the salting/day-splitting
mitigations in skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For every left row, attach the most recent right-side ``value_cols``
    (right.ts <= left.ts) within the same ``key``; NULL when no prior right
    row exists. Output = left columns + value_cols."""
    lt = left.select(
        F.lit(1).alias("_is_left"),
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.struct(*left.columns).alias("_row"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    rt = right.select(
        F.lit(0).alias("_is_left"),
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(None).cast(lt.schema["_row"].dataType).alias("_row"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    # right rows (tag 0) sort before left rows (tag 1) at equal _ts.
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = lt.unionByName(rt).select(
        "_is_left",
        "_row",
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in value_cols
        ],
    )
    out = carried.where(F.col("_is_left") == 1).select(
        F.col("_row.*"), *[F.col(f"_c_{c}").alias(c) for c in value_cols]
    )
    return out
