"""Round-14 operators: driver-checkable audit twins for the engine-internal
(no-SQL-oracle) sketches — MinHash-LSH / SimHash dedup and the LSH / IVF
ANN retrievers (round-13 verdict item 3).

Each audit runs the REAL sketch pipeline in-band against an exact,
SQL-expressible side and emits law-valued columns the DuckDB oracle pins;
the sensitivity tests here prove the laws actually flip when the sketch
side is broken (a law that can't fail is not evidence).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from energy_data_stream_processing_spark.plans.catalog import all_queries
from energy_data_stream_processing_spark.plans.training_queries import _ann_audit


def _q(name):
    return all_queries()[name]


# --------------------------------------------------------------------------
# dedup_minhash_lsh_audit
# --------------------------------------------------------------------------
def test_minhash_lsh_audit_all_pairs_in_both_sides(spark, sf_dir):
    rows = _q("dedup_minhash_lsh_audit").builder(spark, sf_dir).collect()
    assert len(rows) > 0, "audit must be non-vacuous on the gate corpus"
    for r in rows:
        assert r["in_lsh"] and r["in_exact"], (
            f"pair ({r['doc_a']},{r['doc_b']}) missing from one side"
        )
        assert r["jaccard"] >= 0.5


def test_minhash_lsh_audit_flags_a_missed_pair(spark, sf_dir):
    """Sensitivity: removing one LSH pair by hand produces an
    in_lsh=false row — the audit is not vacuously green."""
    from energy_data_stream_processing_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from energy_data_stream_processing_spark.sources.adapter import load_table

    docs = load_table(spark, sf_dir, "documents")
    exact = ngram_jaccard_pairs(docs, threshold=0.5)
    first = exact.orderBy("doc_a", "doc_b").limit(1).collect()[0]
    crippled = minhash_lsh_pairs(docs, threshold=0.5).where(
        ~((F.col("doc_a") == first["doc_a"]) & (F.col("doc_b") == first["doc_b"]))
    )
    joined = exact.join(
        crippled.select("doc_a", "doc_b", F.lit(1).alias("l")),
        ["doc_a", "doc_b"],
        "left",
    )
    missed = joined.where(F.col("l").isNull()).collect()
    assert len(missed) == 1
    assert (missed[0]["doc_a"], missed[0]["doc_b"]) == (
        first["doc_a"], first["doc_b"],
    )


# --------------------------------------------------------------------------
# dedup_simhash_audit
# --------------------------------------------------------------------------
def test_simhash_audit_planted_dups_found_at_hamming_zero(spark, sf_dir):
    rows = _q("dedup_simhash_audit").builder(spark, sf_dir).collect()
    assert len(rows) == 40
    for r in rows:
        assert r["found"], f"planted dup ({r['doc_a']},{r['doc_b']}) not found"
        assert r["hamming"] == 0


def test_simhash_audit_plants_do_not_leak_into_base_entry(spark, sf_dir):
    """The audit's planted corpus is in-band only: the plain dedup_simhash
    entry over the raw table must contain no offset-id rows."""
    from energy_data_stream_processing_spark.plans.training_queries import (
        _SIMHASH_PLANT_OFFSET,
    )

    base = _q("dedup_simhash").builder(spark, sf_dir)
    leaked = base.where(
        (F.col("doc_a") >= _SIMHASH_PLANT_OFFSET)
        | (F.col("doc_b") >= _SIMHASH_PLANT_OFFSET)
    ).count()
    assert leaked == 0


# --------------------------------------------------------------------------
# ann_lsh_recall_audit / ann_ivf_recall_audit
# --------------------------------------------------------------------------
@pytest.mark.parametrize("name", ["ann_lsh_recall_audit", "ann_ivf_recall_audit"])
def test_ann_audit_laws_hold(spark, sf_dir, name):
    rows = _q(name).builder(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_queries"] == 20 and r["k"] == 5 and r["n_exact"] == 100
    assert r["recall_ge_floor"] and r["cosine_verified"] and r["ranks_valid"]


def test_ann_audit_catches_corrupted_cosine(spark, sf_dir):
    """Sensitivity: a retriever that perturbs its reported cosines must
    flip cosine_verified (and a rank shuffle must flip ranks_valid)."""
    from energy_data_stream_processing_spark.operators.similarity import lsh_topk

    def bad_cosine(emb, num_queries, k):
        return lsh_topk(emb, num_queries=num_queries, k=k).withColumn(
            "cosine", F.col("cosine") + 1e-6
        )

    r = _ann_audit(spark, sf_dir, "lsh", bad_cosine, floor=0.5).collect()[0]
    assert not r["cosine_verified"]
    assert r["recall_ge_floor"]  # pair membership untouched

    def bad_ranks(emb, num_queries, k):
        return lsh_topk(emb, num_queries=num_queries, k=k).withColumn(
            "rank", F.col("rank") + 1
        )

    r2 = _ann_audit(spark, sf_dir, "lsh", bad_ranks, floor=0.5).collect()[0]
    assert not r2["ranks_valid"]


def test_ann_audit_catches_recall_collapse(spark, sf_dir):
    """Sensitivity: a retriever returning rank-reversed garbage neighbors
    (worst candidates instead of best) must flip recall_ge_floor."""
    from energy_data_stream_processing_spark.operators.similarity import (
        _as_double,
        cosine_topk,
    )
    from energy_data_stream_processing_spark.sources.adapter import load_table

    emb = load_table(spark, sf_dir, "embeddings")

    def worst_k(e, num_queries, k):
        # exact cosine but picking the BOTTOM-k: valid rank contract and
        # exact cosines, recall vs top-k ~0 — isolates the recall law.
        from pyspark.sql import Window
        from energy_data_stream_processing_spark.operators.similarity import (
            _DOT, _NORM,
        )

        base = e.select("vec_id", _as_double("embedding").alias("v"))
        q = base.where(F.col("vec_id") < num_queries).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("q")
        )
        cos = F.expr(
            _DOT.format(a="q", b="v")
            + " / (" + _NORM.format(a="q") + " * " + _NORM.format(a="v") + ")"
        )
        w = Window.partitionBy("query_id").orderBy(F.col("cosine").asc(), "vec_id")
        return (
            base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id", cos.alias("cosine"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank")
        )

    r = _ann_audit(spark, sf_dir, "lsh", worst_k, floor=0.5).collect()[0]
    assert not r["recall_ge_floor"]
    assert r["cosine_verified"]
    # bottom-k ranks ascend by cosine, so the non-increasing law flips too
    assert not r["ranks_valid"]
