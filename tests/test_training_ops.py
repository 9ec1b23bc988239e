"""Checks for the non-SQL-expressible training ops (no DuckDB oracle):
MinHash-LSH and SimHash dedup, hyperplane-LSH ANN, and the multimodal
mapInPandas pipeline. Approximate ops are validated against their exact
counterparts (no false positives + recall), which the driver's rows-only
check cannot see."""

from __future__ import annotations

from energy_data_stream_processing_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from energy_data_stream_processing_spark.operators.multimodal import (
    decode_media,
    media_table,
)
from energy_data_stream_processing_spark.operators.similarity import cosine_topk, ivf_topk, lsh_topk
from energy_data_stream_processing_spark.sources.adapter import load_table


def test_minhash_lsh_no_false_positives(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.015).collect()
    }
    approx = {
        (r["doc_a"], r["doc_b"]): r["jaccard"] for r in minhash_lsh_pairs(docs, 0.015).collect()
    }
    # Verified candidates => subset of the exact pairs with identical jaccard.
    for pair, jac in approx.items():
        assert pair in exact and abs(exact[pair] - jac) == 0.0


def test_minhash_lsh_recall_on_true_neardups(spark):
    # The driver corpus has no real near-dups (max jaccard ~0.03), so recall
    # is measured on a synthetic corpus with genuine ones: each base doc gets
    # a copy with a few words changed (jaccard >> 0.5).
    base_words = [f"w{i}" for i in range(60)]
    rows = []
    for d in range(30):
        words = [base_words[(d * 7 + i) % 60] for i in range(50)]
        rows.append((2 * d, " ".join(words)))
        mutated = list(words)
        mutated[5] = "xx"
        mutated[25] = "yy"
        rows.append((2 * d + 1, " ".join(mutated)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    approx = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    true_pairs = {(2 * d, 2 * d + 1) for d in range(30)}
    assert true_pairs <= exact  # sanity: the mutated copies really are near-dups
    recall = len(approx & true_pairs) / len(true_pairs)
    assert recall >= 0.9, f"MinHash-LSH missed true near-dups: recall={recall}"


def test_simhash_pairs_shape(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = simhash_pairs(docs, max_hamming=16).collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"] and 0 <= r["hamming"] <= 16
    # deterministic across runs
    rows2 = simhash_pairs(docs, max_hamming=16).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_ann_lsh_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, num_queries=10, k=5).collect()
    approx = lsh_topk(emb, num_queries=10, k=5).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert len(approx_set) > 0
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.2, f"ANN-LSH recall too low: {recall}"
    # every returned neighbor's cosine must equal the exact computation
    exact_cos = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert r["cosine"] == exact_cos[key]


def test_multimodal_decode_pipeline(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = media_table(docs)
    decoded = decode_media(media)
    assert [f.name for f in decoded.schema.fields] == [
        "doc_id",
        "byte_len",
        "format",
        "width",
        "height",
        "features",
    ]
    rows = decoded.collect()
    assert len(rows) == docs.count()
    byte_lens = {r["doc_id"]: r["byte_len"] for r in rows}
    # byte_len must equal the metadata-side octet length (pipeline coherence)
    for r in media.select("doc_id", "meta.n_chars").collect():
        assert byte_lens[r["doc_id"]] > 0
    for r in rows[:10]:
        assert r["format"].startswith("fake/")
        assert len(r["features"]) == 4 and all(0.0 <= f <= 1.0 for f in r["features"])
    # deterministic fake decode
    again = {r["doc_id"]: (r["width"], r["height"]) for r in decode_media(media).collect()}
    assert all(again[r["doc_id"]] == (r["width"], r["height"]) for r in rows)


def test_ann_ivf_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, num_queries=10, k=5).collect()
    approx = ivf_topk(emb, num_queries=10, k=5).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert len(approx_set) > 0
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3, f"IVF recall too low: {recall}"
    exact_cos = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert r["cosine"] == exact_cos[key]
    # deterministic across invocations (no RNG anywhere in training)
    approx2 = {(r["query_id"], r["neighbor_id"]) for r in ivf_topk(emb, num_queries=10, k=5).collect()}
    assert approx_set == approx2


def test_multimodal_resize_and_frames(spark, sf_dir):
    from energy_data_stream_processing_spark.operators.multimodal import (
        media_table,
        resize_media,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_table(docs)
    n_docs = media.count()

    resized = resize_media(media, width=8, height=8).collect()
    assert len(resized) == n_docs
    assert all(len(r["content"]) == 64 and r["width"] == 8 for r in resized)

    frames = sample_frames(media, n_frames=4)
    rows = frames.collect()
    assert len(rows) == n_docs * 4
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_no"])
        assert 0.0 <= r["frame_feature"] <= 1.0
    assert all(sorted(v) == [0, 1, 2, 3] for v in per_doc.values())
    # deterministic
    assert sorted(map(tuple, rows)) == sorted(map(tuple, frames.collect()))


def test_approx_sketches_within_tolerance(spark, sf_dir):
    """approx_count_distinct (HLL++, rsd=0.02) and approx_percentile must
    land within 5% relative error of the exact answers — the accuracy
    contract that justifies swapping them in at 100 TB."""
    from pyspark.sql import functions as F

    from energy_data_stream_processing_spark.plans.catalog import all_queries

    profile = {
        r["event_type"]: r
        for r in all_queries()["approx_distinct_profile"].builder(spark, sf_dir).collect()
    }
    assert profile and all(
        r["users_in_band"] and r["p50_in_band"] and r["p99_in_band"]
        for r in profile.values()
    )
    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.expr("percentile(value, array(0.45D, 0.55D, 0.97D))").alias("q"),
            F.expr("approx_percentile(value, 0.5, 10000)").alias("approx_p50"),
            F.expr("approx_percentile(value, 0.99, 10000)").alias("approx_p99"),
            F.max("value").alias("vmax"),
        )
        .collect()
    )
    assert set(profile) == {r["event_type"] for r in rows}
    for ex in rows:
        # HLL++ rsd=0.02: allow 5% (2.5 sigma) relative error on distincts.
        assert abs(ex["approx_users"] - ex["users"]) <= max(0.05 * ex["users"], 2)
        # Quantile sketches guarantee RANK error, not value error: the
        # estimate must sit between nearby exact quantiles.
        assert ex["q"][0] <= ex["approx_p50"] <= ex["q"][1]
        assert ex["q"][2] <= ex["approx_p99"] <= ex["vmax"]


def test_pii_redaction_planted_recall(spark):
    """redact_pii on planted PII: every planted email/IP/phone is scrubbed,
    counts match plants, and clean text passes through byte-identical. The
    catalog's pii_redaction_audit proves cross-engine regex equivalence; this
    test proves the patterns actually CATCH the things they claim to."""
    from energy_data_stream_processing_spark.operators.text import redact_pii

    rows = [
        (1, "contact bob.smith+spam@ex-ample.co.uk for details", "s1"),
        (2, "server at 192.168.001.1 answered", "s1"),
        (3, "call +49 (30) 1234-5678 or 0800 111 2222 now", "s2"),
        (4, "mixed: a@b.io then 10.0.0.1 then +1 555-867-5309", "s2"),
        (5, "clean text with no identifiers at all", "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}

    assert out[1]["n_email"] == 1 and "[EMAIL]" in out[1]["text_redacted"]
    assert "@" not in out[1]["text_redacted"]
    assert out[2]["n_ip"] == 1 and "[IP]" in out[2]["text_redacted"]
    assert out[3]["n_phone"] == 2 and out[3]["text_redacted"].count("[PHONE]") == 2
    assert out[4]["n_email"] == 1 and out[4]["n_ip"] == 1 and out[4]["n_phone"] == 1
    for tok in ("a@b.io", "10.0.0.1", "555-867-5309"):
        assert tok not in out[4]["text_redacted"]
    assert out[5]["text_redacted"] == rows[4][1]  # clean rows untouched
    assert out[5]["n_email"] == out[5]["n_ip"] == out[5]["n_phone"] == 0


def test_mixture_sample_invariants(spark, sf_dir):
    """Semantic invariants of temperature mixing (the oracle proves
    cross-engine equality; this proves the POLICY): rates in (0,1],
    target shares sum to 1, temperature flattens the distribution
    (small sources get a larger share than their raw proportion, large
    sources a smaller one)."""
    from energy_data_stream_processing_spark.plans.catalog import all_queries

    rows = all_queries()["mixture_temperature_sample"].builder(spark, sf_dir).collect()
    n_tot = sum(r["n_total"] for r in rows)
    assert abs(sum(r["target_share"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert 0.0 < r["keep_rate"] <= 1.0
        raw_share = r["n_total"] / n_tot
        if raw_share < 1.0 / len(rows):
            assert r["target_share"] >= raw_share  # boosted
        elif raw_share > 1.0 / len(rows):
            assert r["target_share"] <= raw_share  # damped


def test_ngram_jaccard_max_df_bounds_hot_shingles(spark):
    """Pathological stopword-run corpus: every doc opens with the same
    10-word run (hot shingles with df == n_docs, the O(df^2) pair-gen
    bomb). With max_df set, (1) hot shingles are dropped from the index so
    every bucket is provably bounded, (2) pairs whose ONLY overlap is the
    stopword run disappear, (3) genuinely-similar pairs (rare-shingle
    overlap) survive with their jaccard a lower bound of the exact value."""
    from pyspark.sql import functions as F

    from energy_data_stream_processing_spark.operators.dedup import with_shingles

    stop_run = "the quick brown fox jumps over the lazy sleeping dog"
    n_docs = 40
    rows = []
    for d in range(n_docs):
        body = " ".join(f"w{d}_{i}" for i in range(30))
        rows.append((2 * d, f"{stop_run} {body}"))
        # near-dup twin: same body, two words changed
        twin = body.split()
        twin[3], twin[17] = "xx", "yy"
        rows.append((2 * d + 1, f"{stop_run} {' '.join(twin)}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    max_df = 8
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0, max_df=max_df).collect()
    }

    true_pairs = {(2 * d, 2 * d + 1) for d in range(n_docs)}
    # uncapped: stopword run links EVERY doc pair (the explosion)
    assert len(exact) == (2 * n_docs) * (2 * n_docs - 1) // 2
    # capped: only genuine near-dup twins survive; the all-pairs noise is gone
    assert set(capped) == true_pairs
    # capped jaccard is a lower bound of exact (common under-counted only)
    for p in true_pairs:
        assert capped[p] <= exact[p] + 1e-12
        assert capped[p] > 0.4  # rare-shingle overlap keeps them clearly similar

    # the index really is bounded: no surviving shingle has df > max_df
    sh = with_shingles(docs).select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    dfreq = sh.groupBy("shingle").count()
    hot = {r["shingle"] for r in dfreq.where(F.col("count") > max_df).collect()}
    assert hot, "fixture must actually contain hot shingles"


def test_greedy_packing_invariants(spark, sf_dir):
    """FFD packing invariants: no bin exceeds the 256-token window; tokens
    are conserved (sum of bin fills == sum of clipped doc token counts);
    per shard at most ONE bin is less than half full (the classic FFD
    guarantee: two half-empty bins would have been merged); and bin count
    meets the ceiling lower bound."""
    import math

    from pyspark.sql import functions as F

    from energy_data_stream_processing_spark.operators.text import bpe_tokens
    from energy_data_stream_processing_spark.plans.catalog import all_queries

    window = 256
    out = all_queries()["greedy_sequence_packing"].builder(spark, sf_dir).collect()
    assert out, "packer produced no bins"
    assert all(r["bin_tokens"] <= window for r in out)
    assert all(0.0 < r["utilization"] <= 1.0 for r in out)

    docs = load_table(spark, sf_dir, "documents")
    clipped = docs.select(
        F.least(F.size(bpe_tokens(F.col("text"))).cast("long"), F.lit(window)).alias("t"),
        (F.col("doc_id") % 8).alias("shard"),
    )
    per_shard = {
        r["shard"]: (r["total"], r["n"])
        for r in clipped.groupBy("shard")
        .agg(F.sum("t").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    tot_docs = sum(r["n_docs"] for r in out)
    assert tot_docs == sum(n for _, n in per_shard.values())
    for shard, (total, _) in per_shard.items():
        bins = [r for r in out if r["shard"] == shard]
        assert sum(r["bin_tokens"] for r in bins) == total  # conservation
        assert len(bins) >= math.ceil(total / window)  # lower bound
        under_half = [r for r in bins if r["bin_tokens"] < window / 2]
        assert len(under_half) <= 1, f"shard {shard}: FFD half-full guarantee broken"


def test_ivf_incremental_index_equivalence_replay_pruning(spark, sf_dir, tmp_path):
    """Persisted incremental IVF index: (1) an index built as base + two
    increments answers queries IDENTICALLY to one built with a single
    increment carrying the same vectors (frozen centroids make assignment
    pointwise, so composition order cannot matter); (2) replaying an
    increment leaves the index unchanged (dynamic partition overwrite keyed
    by increment id); (3) the query-side corpus scan prunes to probed cell
    partitions (PartitionFilters in the physical plan)."""
    from pyspark.sql import functions as F

    from energy_data_stream_processing_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_topk,
        refresh_ivf_incremental,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 4 == 0)
    inc1 = emb.where(F.col("vec_id") % 4 == 1)
    inc2 = emb.where(F.col("vec_id") % 4 >= 2)
    queries = emb.where(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    split_path = str(tmp_path / "idx_split")
    build_ivf_index(spark, base, split_path)
    refresh_ivf_incremental(spark, split_path, inc1, "inc1")
    refresh_ivf_incremental(spark, split_path, inc2, "inc2")

    single_path = str(tmp_path / "idx_single")
    build_ivf_index(spark, base, single_path)
    refresh_ivf_incremental(
        spark, single_path, emb.where(F.col("vec_id") % 4 != 0), "all"
    )

    got_split = sorted(map(tuple, ivf_index_topk(spark, split_path, queries).collect()))
    got_single = sorted(map(tuple, ivf_index_topk(spark, single_path, queries).collect()))
    assert got_split == got_single and got_split

    # replay: re-applying inc1 must change nothing
    refresh_ivf_incremental(spark, split_path, inc1, "inc1")
    replayed = sorted(map(tuple, ivf_index_topk(spark, split_path, queries).collect()))
    assert replayed == got_split
    cells = spark.read.parquet(f"{split_path}/cells")
    assert cells.count() == emb.count()  # no duplicated vectors after replay

    # pruning: the pruned corpus scan carries non-empty cell PartitionFilters
    probed_scan = (
        spark.read.parquet(f"{split_path}/cells")
        .where(F.col("cell").isin([0, 1, 2]))
    )
    plan = probed_scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "cell" in seg, f"cell not in partition filters: {seg}"


def test_weighted_reservoir_matches_independent_fold(spark, sf_dir):
    """A-ES weighted reservoir vs a pure-Python third implementation: same
    md5-prefix uniform, same ln(u)/w keys, same per-lang top-5 — plus the
    dominance property (a doc given overwhelming weight must win its
    group) on a constructed frame."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from energy_data_stream_processing_spark.operators.text import bpe_tokens
    from energy_data_stream_processing_spark.plans.catalog import all_queries

    got = [
        (r["lang"], r["rank"], r["doc_id"], r["n_tokens"])
        for r in all_queries()["weighted_reservoir_sample"].builder(spark, sf_dir).collect()
    ]

    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select(
        "doc_id", "lang", F.size(bpe_tokens(F.col("text"))).cast("long").alias("w")
    ).collect()

    def key(doc_id: int, w: int) -> float:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        return math.log((h + 1) / 4294967296.0) / float(w)

    by_lang: dict = {}
    for r in rows:
        if r["w"] >= 1:
            by_lang.setdefault(r["lang"], []).append(
                (key(r["doc_id"], r["w"]), r["doc_id"], r["w"])
            )
    want = []
    for lang in sorted(by_lang):
        ordered = sorted(by_lang[lang], key=lambda t: (-t[0], t[1]))[:5]
        want += [(lang, i + 1, d, w) for i, (_, d, w) in enumerate(ordered)]
    assert got == want

    # dominance: overwhelming weight wins its group
    synth = spark.createDataFrame(
        [(i, "xx", "w " * 5) for i in range(50)] + [(99, "xx", "w " * 4000)],
        "doc_id long, lang string, text string",
    )
    from energy_data_stream_processing_spark.plans.sampling_queries import (
        hash_bucket,
    )

    n_tokens = F.size(bpe_tokens(F.col("text"))).cast("long")
    u = (hash_bucket(F.col("doc_id")) + F.lit(1)) / F.lit(4294967296.0)
    from pyspark.sql.window import Window

    keyed = synth.select("doc_id", "lang", n_tokens.alias("n_tokens")).withColumn(
        "k", F.log(u) / F.col("n_tokens").cast("double")
    )
    top = (
        keyed.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.col("k").desc(), "doc_id")
            ),
        )
        .where(F.col("rank") == 1)
        .collect()
    )
    assert top[0]["doc_id"] == 99, "4000x-weight doc must rank first"
