"""10x-documents scaling probe for the dedup/ANN family (SCALE.md §6).

Builds a corpus 10x the sf0.1 documents table where each source doc gains
9 near-identical variants (one word substituted per variant) — so the TRUE
duplicate-pair count grows ~45x, the worst case for pair-generating
operators — then times the dedup/ANN operators on base vs 10x. This is the
committed, re-runnable form of the round-3 one-off probe, used to validate
that candidate generation stays bucket-local after operator rewrites.

Usage: python scripts/docs_scale_probe.py [sf_dir] [scale]
(defaults sf0.1, scale 10; at scale > 10 the exact n-gram verifier is
skipped — its cost is quadratic in duplicate multiplicity and it is
priced as a verify stage BEHIND the banded candidate generator, so the
scale path probes the operators that actually run first at 100 TB)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from energy_data_stream_processing_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from energy_data_stream_processing_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("docs-scale-probe")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # scale x: each doc + (scale-1) variants, one deterministic word
    # substitution each — true duplicate pairs grow ~scale^2/2 per cluster
    big_dir = tempfile.mkdtemp(prefix=f"docs{scale}x-") + "/documents.parquet"
    n = docs.count()
    variants = docs.select(
        "doc_id", "text",
        F.explode(F.sequence(F.lit(0), F.lit(scale - 1))).alias("v"),
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
    print(f"base docs: {n}, {scale}x docs: {big.count()}")

    ops = {
        "dedup_exact": lambda d: exact_dedup(d).count(),
        "dedup_minhash_lsh": lambda d: minhash_lsh_pairs(d, 0.015).count(),
        "dedup_ngram_jaccard": lambda d: ngram_jaccard_pairs(d, 0.015).count(),
    }
    if scale > 10:
        ops.pop("dedup_ngram_jaccard")
        print("dedup_ngram_jaccard: SKIPPED at this scale (quadratic in "
              "duplicate multiplicity; verify-stage-only behind LSH)")
    for name, fn in ops.items():
        t0 = time.time()
        r_base = fn(docs)
        t_base = time.time() - t0
        t0 = time.time()
        r_big = fn(big)
        t_big = time.time() - t0
        print(
            f"{name}: base {t_base:.2f}s ({r_base} rows) -> "
            f"{scale}x {t_big:.2f}s ({r_big} rows), factor {t_big / t_base:.1f}x"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
