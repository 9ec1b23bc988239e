"""Similarity search over embedding columns (``embeddings`` table,
``embedding: array<float>[64]``).

- **Brute-force cosine top-k**: the correctness baseline. Dot products and
  norms are explicit left-fold ``aggregate`` expressions over doubles so the
  DuckDB oracle (written with the same left-fold ``list_reduce``) produces
  bit-identical IEEE results — no tolerance needed in the differential gate.
- **Random-hyperplane LSH top-k**: the scale path. Rademacher hyperplanes
  derived from xxhash64 (deterministic, no driver-side randomness), sign
  bits -> bucket codes, candidates = same bucket in any table, verified by
  exact cosine. At 100 TB: probe cost ~ bucket size x tables instead of the
  full corpus per query.

Scale note: brute force is a broadcast-join of the (tiny) query set against
the corpus — a narrow map-side pass, no shuffle on the corpus; top-k per
query uses a window over (query, cosine) which shuffles only (queries x
corpus-candidates) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Left-fold dot product over double arrays; mirrored by list_reduce in the
# DuckDB oracle so both engines sum in the same order.
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 AS DOUBLE), (acc, x) -> acc + x)"
_NORM = "sqrt(aggregate(transform({a}, x -> x * x), cast(0 AS DOUBLE), (acc, x) -> acc + x))"


def _as_double(col: str) -> F.Column:
    return F.expr(f"transform({col}, x -> cast(x AS DOUBLE))")


def cosine_topk(
    embeddings: DataFrame, num_queries: int = 20, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each of the first ``num_queries``
    vectors (self-matches excluded)."""
    base = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    queries = base.where(F.col("vec_id") < num_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    joined = base.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    cos = F.expr(
        _DOT.format(a="q", b="v") + " / (" + _NORM.format(a="q") + " * " + _NORM.format(a="v") + ")"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        joined.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )


def similar_pairs(embeddings: DataFrame, threshold: float = 0.35, max_id: int = 300) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine >= t)
    over a bounded id range — the all-pairs verification form."""
    base = embeddings.where(F.col("vec_id") < max_id).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    a = base.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = base.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    cos = F.expr(
        _DOT.format(a="va", b="vb")
        + " / ("
        + _NORM.format(a="va")
        + " * "
        + _NORM.format(a="vb")
        + ")"
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def _bucket_expr(vec_col: str, table: int, bits: int, dim: int) -> str:
    """Bucket code: sign bits of dot(v, plane_j) for ``bits`` Rademacher
    hyperplanes; plane component i of plane j in table t is +1 when
    xxhash64('t:j:i') is even else -1."""
    bit = (
        f"CASE WHEN aggregate(zip_with({vec_col}, sequence(0, {dim - 1}), "
        f"(x, i) -> x * CASE WHEN (xxhash64(concat('{table}', ':', cast(j AS STRING), ':', cast(i AS STRING))) % 2 + 2) % 2 = 0 THEN 1.0 ELSE -1.0 END), "
        f"cast(0 AS DOUBLE), (acc, x) -> acc + x) > 0 THEN shiftleft(1, j) ELSE 0 END"
    )
    return f"aggregate(sequence(0, {bits - 1}), 0, (acc, j) -> acc + {bit})"


def lsh_topk(
    embeddings: DataFrame,
    num_queries: int = 20,
    k: int = 5,
    tables: int = 8,
    bits: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH, exact-cosine verified.

    Output schema matches ``cosine_topk``; recall < 1 by design (measured
    against the exact baseline in tests). Bucket collision probability per
    table is (1 - theta/pi)^bits for angle theta.
    """
    base = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    buckets = base.select(
        "vec_id",
        "v",
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"struct({t} AS tbl, ({_bucket_expr('v', t, bits, dim)}) AS bucket)"
                    for t in range(tables)
                )
                + ")"
            )
        ).alias("tb"),
    ).select("vec_id", "v", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))

    qb = buckets.where(F.col("vec_id") < num_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q"), "tbl", "bucket"
    )
    candidates = (
        buckets.join(F.broadcast(qb), ["tbl", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "q", "vec_id", "v")
        .distinct()
    )
    cos = F.expr(
        _DOT.format(a="q", b="v") + " / (" + _NORM.format(a="q") + " * " + _NORM.format(a="v") + ")"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        candidates.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
    )
