"""Z-order vs lexicographic write probe: measured parquet pruning fractions.

``zorder_layout_audit`` computes bucket-span locality analytically; this
probe writes the events table to parquet under BOTH layouts and then does
what a scan planner does: for a grid of predicates, check each ROW GROUP's
footer [min, max] stats and count the fraction of row groups that must be
read (a row group is skipped iff the predicate misses its span — the same
math Spark's parquet filter pushdown, Iceberg, and Delta data-skipping
apply). The layouts:

- **lex**: repartitionByRange + sort by (user_id, ts) — the "obvious" sort.
- **zorder**: repartitionByRange + sort by the Morton key from
  operators/zorder.py (8 bits per dimension).

Expected: single-dim predicates on the LEADING lex dim prune well under
both; predicates on the TRAILING dim (ts) prune ~nothing under lex and
substantially under z-order; conjunctive two-dim predicates favor z-order.

Usage: python scripts/zorder_write_probe.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from energy_data_stream_processing_spark.operators.zorder import (
    interleave_bits,
    scale_to_bucket,
)
from energy_data_stream_processing_spark.session import get_spark
from energy_data_stream_processing_spark.sources.adapter import load_table

N_FILES = 8
BLOCK_BYTES = 64 * 1024  # small row groups -> fine-grained skipping stats


def _write(df, key, path):
    (
        df.repartitionByRange(N_FILES, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .option("parquet.block.size", str(BLOCK_BYTES))
        .parquet(path)
    )


def _row_groups(path):
    out = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(f"{path}/{f}").metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            su = rg.column(idx["user_id"]).statistics
            st = rg.column(idx["us"]).statistics
            out.append(((su.min, su.max), (st.min, st.max)))
    return out


def _read_fraction(groups, u_pred, t_pred):
    hit = 0
    for (ulo, uhi), (tlo, thi) in groups:
        u_ok = u_pred is None or (u_pred[0] <= uhi and ulo <= u_pred[1])
        t_ok = t_pred is None or (t_pred[0] <= thi and tlo <= t_pred[1])
        if u_ok and t_ok:
            hit += 1
    return hit / len(groups)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("zorder-probe")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("us"), "event_type", "value"
    )
    lims = ev.agg(
        F.min("user_id").alias("lo_u"), F.max("user_id").alias("hi_u"),
        F.min("us").alias("lo_t"), F.max("us").alias("hi_t"),
    )
    row = lims.collect()[0]
    bk = ev.join(F.broadcast(lims)).select(
        "user_id", "us", "event_type", "value",
        scale_to_bucket(F.col("user_id"), F.col("lo_u"), F.col("hi_u"), 8).alias("ub"),
        scale_to_bucket(F.col("us"), F.col("lo_t"), F.col("hi_t"), 8).alias("tb"),
    )
    z = bk.withColumn("zkey", interleave_bits(F.col("ub"), F.col("tb"), 8))
    lex = bk.withColumn("lkey", F.col("ub") * 256 + F.col("tb"))

    root = tempfile.mkdtemp(prefix="zorder-probe-")
    _write(z.drop("ub", "tb"), "zkey", f"{root}/z")
    _write(lex.drop("ub", "tb"), "lkey", f"{root}/lex")

    gz = _row_groups(f"{root}/z")
    gl = _row_groups(f"{root}/lex")
    print(f"row groups: zorder {len(gz)}, lex {len(gl)}")

    span_u = row["hi_u"] - row["lo_u"]
    span_t = row["hi_t"] - row["lo_t"]
    # predicate grid: 1/16-wide ranges at 8 offsets per dimension
    preds_u = [
        (row["lo_u"] + i * span_u // 8, row["lo_u"] + i * span_u // 8 + span_u // 16)
        for i in range(8)
    ]
    preds_t = [
        (row["lo_t"] + i * span_t // 8, row["lo_t"] + i * span_t // 8 + span_t // 16)
        for i in range(8)
    ]
    for label, groups in (("zorder", gz), ("lex", gl)):
        fu = sum(_read_fraction(groups, p, None) for p in preds_u) / len(preds_u)
        ft = sum(_read_fraction(groups, None, p) for p in preds_t) / len(preds_t)
        fb = sum(
            _read_fraction(groups, pu, pt) for pu in preds_u for pt in preds_t
        ) / (len(preds_u) * len(preds_t))
        print(
            f"{label:6s} avg read fraction: user-range {fu:.3f} | "
            f"time-range {ft:.3f} | both {fb:.3f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
