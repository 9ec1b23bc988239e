"""Recompute the measured-margin table in plans/audit_constants.py with one
command (round-15 verdict item 7).

The audit FLOORS (`ANN_*_RECALL_FLOOR`, the HLL band) are pinned constants;
their justification is the measured margin on the gate corpora, recorded in
audit_constants.py's table. The re-measure rule used to be prose ("when a
retriever/sketch changes, re-measure and update BOTH columns"); this script
makes it executable: it reuses the SAME frames the driver audits run —
`cosine_topk` as the exact baseline, `lsh_topk`/`ivf_topk` with the audit's
query panel (num_queries=20, k=5), and the hourly aggregate's
exact-vs-HLL++ distincts — and prints the refreshed table rows next to the
current floors, flagging any margin that no longer clears its floor.

Usage: python scripts/audit_margins.py [sf_dir ...]
  default: /root/testdata/sf0.001 sf0.01 sf0.1 (the gate corpora)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from energy_data_stream_processing_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_topk,
)
from energy_data_stream_processing_spark.plans.audit_constants import (
    ANN_IVF_RECALL_FLOOR,
    ANN_LSH_RECALL_FLOOR,
    HLL_ABS_FLOOR,
    HLL_REL_BAND,
)
from energy_data_stream_processing_spark.plans.training_queries import _emb
from energy_data_stream_processing_spark.session import get_spark


def recall_at_k(spark, sf_dir: str, fn) -> float:
    """recall@5 of `fn` vs exact brute-force on the audit's query panel —
    the same frames `_ann_audit` gates, with the raw number surfaced
    instead of the >= floor boolean."""
    emb = _emb(spark, sf_dir)
    exact = cosine_topk(emb, num_queries=20, k=5)
    approx = fn(emb, num_queries=20, k=5)
    row = (
        exact.join(
            approx.select(
                "query_id", "neighbor_id", F.lit(1).alias("hit")
            ),
            ["query_id", "neighbor_id"],
            "left",
        )
        .agg(
            (F.sum(F.coalesce("hit", F.lit(0))) / F.count(F.lit(1))).alias(
                "recall"
            )
        )
        .first()
    )
    return float(row["recall"])


def hll_worst(spark, sf_dir: str) -> tuple[int, int, float]:
    """Worst |approx - exact| for HLL++ (Spark default rsd 0.05) on the
    hourly distinct-customer/session counts — the estimator and columns
    `streaming_hourly_native_audit`'s band gates. Returns
    (worst_abs, exact_at_worst, rel_at_worst)."""
    from energy_data_stream_processing_spark.sources.adapter import (
        energy_events,
    )

    ev = energy_events(spark, sf_dir)
    per_hour = ev.groupBy(
        F.date_trunc("hour", "event_time").alias("hour")
    ).agg(
        F.countDistinct("customer_id").alias("exact_c"),
        F.approx_count_distinct("customer_id").alias("approx_c"),
        F.countDistinct("session_id").alias("exact_s"),
        F.approx_count_distinct("session_id").alias("approx_s"),
    )
    errs = per_hour.select(
        F.abs(F.col("approx_c") - F.col("exact_c")).alias("abs_err"),
        F.col("exact_c").alias("exact"),
    ).union(
        per_hour.select(
            F.abs(F.col("approx_s") - F.col("exact_s")).alias("abs_err"),
            F.col("exact_s").alias("exact"),
        )
    )
    worst = errs.orderBy(F.desc("abs_err")).first()
    ex = int(worst["exact"])
    return int(worst["abs_err"]), ex, (worst["abs_err"] / ex if ex else 0.0)


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("audit-margins", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    ok = True
    for sf in sf_dirs:
        lsh = recall_at_k(spark, sf, lsh_topk)
        ivf = recall_at_k(spark, sf, ivf_topk)
        abs_err, exact, rel = hll_worst(spark, sf)
        band = max(HLL_ABS_FLOOR, HLL_REL_BAND * exact)
        rows.append((sf, lsh, ivf, abs_err, exact, rel, band))
        ok &= (
            lsh >= ANN_LSH_RECALL_FLOOR
            and ivf >= ANN_IVF_RECALL_FLOOR
            and abs_err <= band
        )
    print(
        f"floors: LSH recall >= {ANN_LSH_RECALL_FLOOR}, "
        f"IVF recall >= {ANN_IVF_RECALL_FLOOR}, "
        f"HLL |err| <= max({HLL_ABS_FLOOR}, {HLL_REL_BAND}*exact)"
    )
    print("| sf_dir | lsh_recall@5 | ivf_recall@5 | hll_worst_abs (exact, rel) |")
    print("|---|---|---|---|")
    for sf, lsh, ivf, abs_err, exact, rel, band in rows:
        print(
            f"| {os.path.basename(sf)} | {lsh:.3f} | {ivf:.3f} "
            f"| {abs_err} (at {exact}, rel {rel:.3f}; band {band:.1f}) |"
        )
    print(
        "margins "
        + (
            "CLEAR every floor — paste the refreshed numbers into "
            "plans/audit_constants.py's table"
            if ok
            else "VIOLATED — a floor no longer holds; fix the "
            "retriever/sketch or re-justify the floor BEFORE updating "
            "the table"
        )
    )
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
