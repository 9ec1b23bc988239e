"""Banded range join — interval⋈point equi-join composition.

A naive ``l.ts BETWEEN r.start AND r.end`` join has no equi-key, so Spark
plans BroadcastNestedLoopJoin (quadratic work, broadcast-size bound). The
scalable composition buckets time into fixed bands and turns the range
predicate into an equi-join:

1. each interval explodes to one row per band it overlaps
   (``sequence(floor(start/band), floor(end/band))``);
2. each point maps to its single band;
3. equi-join on (key, band) + residual ``BETWEEN`` filter.

Cost: shuffle on (key, band) with interval replication factor =
interval_length/band (choose band ≈ median interval length). Per-band
populations bound the worst-case pair count — this is exactly how
Spark-ecosystem range-join optimizations (e.g. the binned range join in
Databricks' runtime, or interval libraries for genomics) express it with
public operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    band_seconds: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row of the same ``key`` whose
    ``[start, end]`` contains ``ts`` (inclusive both ends).

    Returns points columns + interval columns (minus its key column).
    ``how='left'`` keeps points with no containing interval.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"banded_range_join supports inner/left, got {how!r}")
    band = F.lit(band_seconds)
    ivals = intervals.withColumn(
        "_band",
        F.explode_outer(
            F.sequence(
                (F.col(start).cast("long") / band).cast("long"),
                (F.col(end).cast("long") / band).cast("long"),
            )
        ),
    ).where(F.col("_band").isNotNull())
    pts = points.withColumn("_band", (F.col(ts).cast("long") / band).cast("long"))

    cond = (
        (pts[key] == ivals[key])
        & (pts["_band"] == ivals["_band"])
        & (pts[ts] >= ivals[start])
        & (pts[ts] <= ivals[end])
    )
    joined = pts.join(ivals, cond, how)
    drop_cols = [ivals[key], pts["_band"], ivals["_band"]]
    out = joined
    for c in drop_cols:
        out = out.drop(c)
    return out
