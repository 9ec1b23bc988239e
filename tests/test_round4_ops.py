"""Unit/property tests for the round-4 operators: containment dedup,
as-of-with-tolerance, k-anonymity, PSI vintage drift, approx-percentile
audit, k-fold assignment. (Each oracle-twinned entry is ALSO covered by the
catalog-wide differential in test_oracle_differential.py; these tests pin
the semantics with planted fixtures the synthetic tables can't guarantee.)
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from energy_data_stream_processing_spark.operators.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)
from energy_data_stream_processing_spark.plans.catalog import all_queries


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc fully quoted inside a long one: containment 1.0 even
    though Jaccard is far below any useful near-dup threshold."""
    quote = " ".join(f"tok{i}" for i in range(10))
    page = " ".join(f"w{i}" for i in range(200)) + " " + quote
    other = " ".join(f"z{i}" for i in range(50))
    docs = spark.createDataFrame(
        [(1, page), (2, quote), (3, other)], ["doc_id", "text"]
    )
    cont = {
        (r.doc_a, r.doc_b): r
        for r in ngram_containment_pairs(docs, threshold=0.5).collect()
    }
    assert (1, 2) in cont
    r = cont[(1, 2)]
    assert r.containment == 1.0
    assert r.contained_doc == 2  # the quote is the contained side
    # Jaccard on the same pair is tiny: 8 common shingles / (206 + 8 - 8)
    jac = {
        (x.doc_a, x.doc_b): x.jaccard
        for x in ngram_jaccard_pairs(docs, threshold=0.0001).collect()
    }
    assert jac[(1, 2)] < 0.05


def test_containment_symmetric_pair_identity(spark):
    """Identical docs: containment 1.0, contained side is the smaller id."""
    t = " ".join(f"a{i}" for i in range(20))
    docs = spark.createDataFrame([(7, t), (9, t)], ["doc_id", "text"])
    rows = ngram_containment_pairs(docs, threshold=0.9).collect()
    assert len(rows) == 1
    assert (rows[0].doc_a, rows[0].doc_b) == (7, 9)
    assert rows[0].containment == 1.0
    assert rows[0].contained_doc == 7  # tie on size -> doc_a


def test_asof_tolerance_nulls_stale_matches(spark, sf_dir):
    """Planted via the catalog query at sf0.001: every non-null match is
    within 24 h, every null either has no prior switch or a stale one."""
    q = all_queries()["asof_tolerance_tariff"]
    base = all_queries()["asof_active_tariff"]
    out = {r.event_id: r for r in q.builder(spark, sf_dir).collect()}
    raw = {r.event_id: r for r in base.builder(spark, sf_dir).collect()}
    assert set(out) == set(raw)
    saw_stale_nulled = False
    for eid, r in out.items():
        if r.active_tariff is not None:
            assert 0.0 <= r.switch_age_s <= 86400.0
            assert raw[eid].active_tariff == r.active_tariff
        else:
            assert r.switch_age_s is None
            if raw[eid].active_tariff is not None:
                saw_stale_nulled = True  # tolerance actually pruned something
    assert saw_stale_nulled


def test_k_anonymity_flags_small_groups(spark, sf_dir):
    q = all_queries()["k_anonymity_audit"]
    rows = q.builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_at_risk_groups <= r.n_qi_groups
        assert r.n_at_risk_docs <= r.n_docs
        # a group below k exists iff the min group size is below k
        assert (r.n_at_risk_groups > 0) == (r.min_group_size < 5)


def test_vintage_drift_psi_shares_sum_to_one(spark, sf_dir):
    q = all_queries()["vintage_drift_psi"]
    rows = q.builder(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.share_a for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.share_b for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert r.psi_term >= 0.0  # (p-q)ln(p/q) is non-negative


def test_vintage_drift_psi_detects_planted_shift(spark, tmp_path):
    """Type 'x' only in the first half, 'y' only in the second: both PSI
    terms are large; a balanced type 'z' contributes ~0."""
    rows = []
    t0 = _ts("2026-01-01T00:00:00")
    for i in range(100):
        rows.append((i, t0 + datetime.timedelta(minutes=i), 1, "x", 1.0, None))
        rows.append(
            (1000 + i, t0 + datetime.timedelta(days=2, minutes=i), 1, "y", 1.0, None)
        )
    for i in range(50):
        rows.append((2000 + i, t0 + datetime.timedelta(minutes=i), 1, "z", 1.0, None))
        rows.append(
            (3000 + i, t0 + datetime.timedelta(days=2, minutes=i), 1, "z", 1.0, None)
        )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "drift")
    df.write.parquet(d + "/events.parquet")
    q = all_queries()["vintage_drift_psi"]
    out = {r.event_type: r for r in q.builder(spark, d).collect()}
    assert out["x"].psi_term > 1.0 and out["y"].psi_term > 1.0
    assert out["z"].psi_term < 0.01
    assert out["x"].n_b == 0 and out["y"].n_a == 0


def test_approx_percentile_error_bound_and_determinism(spark, sf_dir):
    from energy_data_stream_processing_spark.sources.adapter import load_table

    q = all_queries()["approx_percentile_audit"]
    r1 = sorted(map(tuple, q.builder(spark, sf_dir).collect()))
    r2 = sorted(map(tuple, q.builder(spark, sf_dir).collect()))
    assert r1 == r2  # sketch at fixed accuracy is deterministic per input
    rows = q.builder(spark, sf_dir).collect()
    assert rows and all(r.p50_in_band and r.p95_in_band for r in rows)
    # numeric |approx - exact| audit (the entry reports it as the boolean
    # band check; the magnitudes stay pinned here)
    ev = load_table(spark, sf_dir, "events")
    num = (
        ev.where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.expr("percentile(value, 0.5)").alias("exact_p50"),
            F.expr("percentile(value, 0.95)").alias("exact_p95"),
            F.expr("approx_percentile(value, 0.5, 10000)").alias("approx_p50"),
            F.expr("approx_percentile(value, 0.95, 10000)").alias("approx_p95"),
        )
        .collect()
    )
    for row in num:
        # accuracy=10000 => rank error <= n/10000; translate loosely to a
        # value bound via the exact spread of the distribution
        spread = abs(row.exact_p95 - row.exact_p50) + 1e-9
        assert abs(row.exact_p50 - row.approx_p50) <= max(0.05 * spread, 1e-6) or row.n_values < 100
        assert abs(row.exact_p95 - row.approx_p95) <= max(0.10 * spread, 1e-6) or row.n_values < 100


def test_kfold_partitions_corpus(spark, sf_dir):
    from energy_data_stream_processing_spark.sources.adapter import load_table

    q = all_queries()["kfold_assignment"]
    rows = q.builder(spark, sf_dir).collect()
    assert {r.fold for r in rows} <= {0, 1, 2, 3, 4}
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_eval for r in rows) == total
    for r in rows:
        assert r.n_train == total - r.n_eval


def test_incremental_dedup_equals_batch_restricted(spark, sf_dir, tmp_path):
    """The equivalence law behind dedup_incremental_minhash: folding an
    increment into the persisted index finds EXACTLY the batch LSH pairs
    that touch the increment, with identical jaccard values."""
    from energy_data_stream_processing_spark.operators.dedup import (
        build_dedup_index,
        dedup_increment,
        minhash_lsh_pairs,
    )
    from energy_data_stream_processing_spark.sources.adapter import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % 5 != 0)
    inc = docs.where(F.col("doc_id") % 5 == 0)
    idx = str(tmp_path / "idx")
    build_dedup_index(spark, idx, base, increment_id="base")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_increment(spark, idx, inc, increment_id="i1").collect()
    }
    inc_ids = {r.doc_id for r in inc.select("doc_id").collect()}
    want = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(docs).collect()
        if r.doc_a in inc_ids or r.doc_b in inc_ids
    }
    assert got == want and len(got) > 0


def test_incremental_dedup_replay_idempotent(spark, sf_dir, tmp_path):
    """Re-applying the same increment id must not change the store or the
    result (at-least-once delivery safety)."""
    from energy_data_stream_processing_spark.operators.dedup import (
        build_dedup_index,
        dedup_increment,
    )
    from energy_data_stream_processing_spark.sources.adapter import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % 5 != 0)
    inc = docs.where(F.col("doc_id") % 5 == 0)
    idx = str(tmp_path / "idx")
    build_dedup_index(spark, idx, base, increment_id="base")
    r1 = sorted(map(tuple, dedup_increment(spark, idx, inc, increment_id="i1").collect()))
    n_bands_1 = spark.read.parquet(f"{idx}/bands").count()
    r2 = sorted(map(tuple, dedup_increment(spark, idx, inc, increment_id="i1").collect()))
    n_bands_2 = spark.read.parquet(f"{idx}/bands").count()
    assert r1 == r2
    assert n_bands_1 == n_bands_2


def test_streaming_incremental_dedup_equals_batch(spark, sf_dir):
    """The stream≡batch law: the union of per-micro-batch incremental dedup
    results over ordered document chunks equals one-shot batch LSH pairs
    over the full corpus, jaccard values included."""
    from energy_data_stream_processing_spark.operators.dedup import minhash_lsh_pairs
    from energy_data_stream_processing_spark.sources.adapter import load_table

    q = all_queries()["streaming_incremental_dedup"]
    got = {(r.doc_a, r.doc_b): r.jaccard for r in q.builder(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    # the catalog entry operates at the 0.5 near-dup threshold
    want = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert got == want and len(got) > 0


def test_phash_identical_and_near_identical_payloads(spark):
    """Identical binaries collide at Hamming 0; a single-byte edit stays
    within a small Hamming distance (found by the banded search); unrelated
    payloads are not paired."""
    from energy_data_stream_processing_spark.operators.multimodal import (
        phash_media,
        phash_near_dup_pairs,
    )

    base = bytes(range(256)) * 8
    edited = bytearray(base)
    edited[100] ^= 0xFF
    other = bytes(reversed(base)) * 2
    media = spark.createDataFrame(
        [(1, base), (2, bytes(edited)), (3, other), (4, base)],
        "doc_id long, content binary",
    )
    sigs = {r.doc_id: r.phash for r in phash_media(media).collect()}
    assert sigs[1] == sigs[4]  # identical payloads -> identical signature
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in phash_near_dup_pairs(media, max_hamming=8).collect()
    }
    assert pairs[(1, 4)] == 0
    assert (1, 2) in pairs and pairs[(1, 2)] <= 8  # one-byte edit is near
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_phash_deterministic_across_runs(spark, sf_dir):
    q = all_queries()["multimodal_phash_dedup"]
    a = sorted(map(tuple, q.builder(spark, sf_dir).collect()))
    b = sorted(map(tuple, q.builder(spark, sf_dir).collect()))
    assert a == b


def test_ann_recall_eval_floor(spark, sf_dir):
    """The queryable recall metric must agree with an independently-computed
    overlap of the two top-k frames (the catalog entry scores the
    deterministic dimension-truncated retriever), and the SAME harness
    applied to the engine's LSH retriever must clear the repo's recall
    floor at this corpus size (sf0.001 is 100 vectors — LSH buckets are
    sparse, so the existing ANN gate asserts >= 0.2; measured ~0.7)."""
    from energy_data_stream_processing_spark.operators.similarity import (
        cosine_topk,
        lsh_topk,
    )
    from energy_data_stream_processing_spark.sources.adapter import load_table

    q = all_queries()["ann_recall_eval"]
    rows = q.builder(spark, sf_dir).collect()
    assert len(rows) == 20
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {}
    for r in cosine_topk(emb, num_queries=20, k=5).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    truncated = emb.withColumn("embedding", F.slice("embedding", 1, 16))
    approx = {}
    # dim=16 pins the unrolled scoring width to the truncated retriever
    # (round 16; matches the catalog entry's own call)
    for r in cosine_topk(truncated, num_queries=20, k=5, dim=16).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in rows:
        want = len(exact[r.query_id] & approx.get(r.query_id, set())) / 5
        assert r.k == 5 and abs(r.recall_at_5 - want) < 1e-12
    lsh = {}
    for r in lsh_topk(emb, num_queries=20, k=5).collect():
        lsh.setdefault(r.query_id, set()).add(r.neighbor_id)
    lsh_mean = sum(
        len(exact[qid] & lsh.get(qid, set())) / 5 for qid in exact
    ) / len(exact)
    assert lsh_mean >= 0.4, f"mean LSH recall {lsh_mean}"


def test_scd2_multi_increment_equals_batch(spark, sf_dir, tmp_path):
    """Three successive late-data increments (event_id mod 3 splits, applied
    out of time order) must leave the maintained store equal to the batch
    SCD2 build over all switches."""
    from energy_data_stream_processing_spark.operators.scd2 import (
        scd2_apply_increment,
        scd2_build,
        scd2_init_store,
    )
    from energy_data_stream_processing_spark.sources.adapter import energy_events

    ev = energy_events(spark, sf_dir)
    sw = ev.where(F.col("event_type") == "tariff_switch").select(
        "customer_id", "tariff_type", "event_time", "event_id"
    )
    store = str(tmp_path / "dim")
    # hash-based thirds: raw event_ids are not uniform mod small integers
    m = F.pmod(F.xxhash64(F.col("event_id")), F.lit(3))
    for part in (1, 2, 0):
        assert sw.where(m == part).count() > 0
    scd2_init_store(spark, store, sw.where(m == 1))
    scd2_apply_increment(spark, store, sw.where(m == 2))
    scd2_apply_increment(spark, store, sw.where(m == 0))
    cols = ["customer_id", "tariff_type", "valid_from", "valid_to", "version", "is_current"]
    got = sorted(map(tuple, spark.read.parquet(store).select(*cols).collect()))
    want = sorted(map(tuple, scd2_build(sw).select(*cols).collect()))
    assert got == want and len(got) > 0


def test_scd2_apply_touches_only_affected_buckets(spark, sf_dir, tmp_path):
    """An increment for ONE customer must rewrite only that customer's
    bucket partition; all other bucket directories keep their files."""
    import os

    from energy_data_stream_processing_spark.operators.scd2 import (
        scd2_apply_increment,
        scd2_init_store,
    )
    from energy_data_stream_processing_spark.sources.adapter import energy_events

    ev = energy_events(spark, sf_dir)
    sw = ev.where(F.col("event_type") == "tariff_switch").select(
        "customer_id", "tariff_type", "event_time", "event_id"
    )
    one = sw.orderBy("event_id").limit(1)
    store = str(tmp_path / "dim")
    scd2_init_store(spark, store, sw)
    before = {
        d: sorted(os.listdir(f"{store}/{d}"))
        for d in os.listdir(store)
        if d.startswith("_cbucket=")
    }
    target = one.collect()[0]
    inc = sw.where(F.col("customer_id") == target["customer_id"]).limit(1)
    scd2_apply_increment(spark, store, inc)
    after = {
        d: sorted(os.listdir(f"{store}/{d}"))
        for d in os.listdir(store)
        if d.startswith("_cbucket=")
    }
    changed = [d for d in before if before[d] != after.get(d)]
    assert len(changed) == 1, f"expected 1 rewritten bucket, got {changed}"


def test_markov_stationary_is_distribution(spark, sf_dir):
    """Stationary vector: non-negative, sums to 1 (within the 1e-9 round),
    and is actually stationary — one more application of P moves it < 1e-6."""
    q = all_queries()["markov_stationary_distribution"]
    rows = {r.event_type: r.stationary_prob for r in q.builder(spark, sf_dir).collect()}
    assert all(v >= 0 for v in rows.values())
    assert abs(sum(rows.values()) - 1.0) < 1e-6
    tr = all_queries()["event_transitions"]
    P = {(r.prev_type, r.next_type): r.p for r in tr.builder(spark, sf_dir).collect()}
    moved = {
        j: sum(rows.get(i, 0.0) * P.get((i, j), 0.0) for i in rows)
        for j in rows
    }
    assert max(abs(moved[j] - rows[j]) for j in rows) < 1e-6
