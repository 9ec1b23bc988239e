"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's query catalog
(``energy_data_stream_processing_spark.plans.catalog``): every implemented
operator from SURVEY.md §2 is a named entry with a Spark builder and (where
SQL-expressible) a DuckDB oracle twin.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from energy_data_stream_processing_spark.plans.catalog import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the hourly business-metrics
    aggregation (the reference consumer's core, SURVEY.md §2.3)."""
    q = all_queries()["hourly_business_metrics"]
    return q.builder(spark, "/root/testdata/sf0.001")


# Round-14 gate ordering: this round's changed/new entries first (the 6
# new entries: 5 sketch audit twins + split_leakage_audit), then the
# stalest-evidence cohort (r10, then r11 by name),
# truncated to the driver's ~50-entry sampled prefix. GENERATED — do not
# hand-edit; regenerate with
#   python scripts/gen_gate_prefix.py --max-round <horizon> --changed <...>
# and verified by `gen_gate_prefix.py --check` from _GATE_CHANGED +
# CORRECTNESS_r*.json evidence age up to _GATE_EVIDENCE_MAX_ROUND (the
# pinned horizon: later driver artifacts are ignored so mid-round artifact
# drops can't redden the check). Oracle-less entries sort LAST in
# _ordered_names so the sampled prefix stays 100% hash-checkable.

_GATE_EVIDENCE_MAX_ROUND = 13

_GATE_CHANGED: list[str] = [
    "dedup_minhash_lsh_audit",
    "dedup_simhash_audit",
    "ann_lsh_recall_audit",
    "ann_ivf_recall_audit",
    "streaming_hourly_native_audit",
    "split_leakage_audit",
]

_GATE_PREFIX = [
    "dedup_minhash_lsh_audit",
    "dedup_simhash_audit",
    "ann_lsh_recall_audit",
    "ann_ivf_recall_audit",
    "streaming_hourly_native_audit",
    "split_leakage_audit",
    "customer_order_distribution",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "doc_chunk_audit",
    "doc_fingerprints",
    "dominant_part_suppliers",
    "embedding_gram_matrix",
    "embedding_quantization_audit",
    "embedding_similar_pairs",
    "event_grouping_sets",
    "forecast_revenue_change",
    "greedy_sequence_packing",
    "hard_negative_mining",
    "hourly_event_pivot",
    "important_parts_value_share",
    "key_skew_profile",
    "label_centroids",
    "lang_id",
    "lapsed_buyers_except",
    "large_volume_customers",
    "linestatus_priority_counts",
    "local_supplier_volume",
    "market_share",
    "multimodal_phash_dedup",
    "nation_product_profit",
    "nation_revenue_share",
    "ngram_decontamination",
    "order_priority_check",
    "parts_never_ordered",
    "pii_redaction_audit",
    "price_bucket_histogram",
    "pricing_summary",
    "promo_revenue",
    "regional_cheapest_supplier",
    "repetition_profile",
    "retained_buyers_intersect",
    "streaming_timeout_sessions",
    "zipf_vocab_fit",
    "zorder_layout_audit",
    "ab_test_segments",
    "ann_ivf_incremental",
    "approx_distinct_profile",
    "boilerplate_windows",
    "bpe_merge_induction",
]


def _ordered_names() -> list[str]:
    names = all_queries()
    head = [n for n in _GATE_PREFIX if n in names]
    seen = set(head)
    # already-sampled oracle-backed entries next, engine-internal
    # (no-oracle) entries last — the checked prefix stays fully
    # hash-comparable.
    mid = sorted(
        n for n in names
        if n not in seen and names[n].oracle is not None
    )
    tail = sorted(
        n for n in names
        if n not in seen and names[n].oracle is None
    )
    return head + mid + tail


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = all_queries()
    return {name: qs[name].builder for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    qs = all_queries()
    return {
        name: qs[name].oracle
        for name in _ordered_names()
        if qs[name].oracle is not None
    }
