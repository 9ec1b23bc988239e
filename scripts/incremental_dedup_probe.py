"""Incremental-vs-rescan dedup cost probe (SCALE.md — incremental dedup row).

The claim behind ``dedup_increment``: folding a new document increment into
the PERSISTED MinHash-LSH index prices each ingest at O(increment), while
the batch ``minhash_lsh_pairs`` rescan prices it at O(corpus). This probe
measures both on a growing corpus: the corpus is the 10x-variants build
from docs_scale_probe (duplicate-heavy, the worst case), split into a large
base (90%) plus a small increment (10%); we time

  (a) dedup_increment on the increment against the pre-built base index, vs
  (b) the full-batch rescan of base+increment,

and verify (a) == (b) restricted to increment-touching pairs.

Usage: python scripts/incremental_dedup_probe.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from energy_data_stream_processing_spark.operators.dedup import (
    build_dedup_index,
    dedup_increment,
    minhash_lsh_pairs,
)
from energy_data_stream_processing_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("incremental-dedup-probe")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    big_dir = tempfile.mkdtemp(prefix="docs10x-") + "/documents.parquet"
    n = docs.count()
    variants = docs.select(
        "doc_id", "text", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("v")
    ).select(
        (F.col("doc_id") + F.col("v") * n).alias("doc_id"),
        F.when(F.col("v") == 0, F.col("text"))
        .otherwise(
            F.concat(
                F.lit("variant"),
                F.col("v").cast("string"),
                F.lit(" "),
                F.expr("substring(text, 8)"),
            )
        )
        .alias("text"),
    )
    variants.write.mode("overwrite").parquet(big_dir)
    big = spark.read.parquet(big_dir)
    n_big = big.count()

    # 90/10 split by doc_id hash (deterministic)
    inc = big.where(F.col("doc_id") % 10 == 0)
    base = big.where(F.col("doc_id") % 10 != 0)
    n_inc = inc.count()
    print(f"corpus: {n_big} docs; increment: {n_inc} ({100 * n_inc / n_big:.0f}%)")

    idx = tempfile.mkdtemp(prefix="dedup-idx-probe-")
    t0 = time.time()
    build_dedup_index(spark, idx, base, increment_id="base")
    t_build = time.time() - t0

    t0 = time.time()
    inc_pairs = dedup_increment(spark, idx, inc, increment_id="i1", threshold=0.015)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in inc_pairs.collect()}
    t_inc = time.time() - t0

    t0 = time.time()
    all_pairs = {(r.doc_a, r.doc_b): r.jaccard for r in minhash_lsh_pairs(big, 0.015).collect()}
    t_batch = time.time() - t0

    inc_ids = {r.doc_id for r in inc.select("doc_id").collect()}
    want = {k: v for k, v in all_pairs.items() if k[0] in inc_ids or k[1] in inc_ids}
    print(f"equivalence law holds: {got == want} ({len(got)} increment-touching pairs)")
    print(
        f"one-time base index build: {t_build:.2f}s | "
        f"incremental ingest: {t_inc:.2f}s | full-batch rescan: {t_batch:.2f}s | "
        f"per-ingest speedup {t_batch / t_inc:.1f}x"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
