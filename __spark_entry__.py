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


# Round-10 gate ordering. The driver checks a ~50-entry prefix of
# queries(). Head = the four entries whose CODE changed this round
# (customer_view now density-dispatches between its three oracle-identical
# plans; the two exact stateful hourly streams share the vectorized
# _stateful_update_fn + the DST-safe timeout localization; the timeout
# sessionization's gap-split is vectorized too), then every
# other oracle-backed entry by stalest-evidence-first — the two r4-era
# entries (zipf_vocab_fit, zorder_layout_audit) lead the rotation tail,
# backfilled with r5-era names to EXACTLY 50 (the driver samples a
# ~50-entry prefix, so anything past 50 silently gets no evidence).
#
# GENERATED — do not hand-edit: regenerate with
#   python scripts/gen_gate_prefix.py --max-round <horizon> \
#       --changed <entries changed this round>
# and verified by `gen_gate_prefix.py --check`, which recomputes the list
# from _GATE_CHANGED + CORRECTNESS_r*.json evidence age UP TO the
# committed _GATE_EVIDENCE_MAX_ROUND horizon and diffs it
# (tests/test_round8_ops.py, tests/test_round10_ops.py). Entries without
# an oracle (engine-internal sketches, by design) sort LAST in
# _ordered_names so the sampled prefix is 100% hash-checkable.

#: Evidence horizon this rotation was generated from (round-9 verdict
#: item 1): CORRECTNESS_r*.json artifacts from LATER rounds are ignored by
#: the regeneration check, so the driver dropping this round's artifact
#: after our last commit cannot redden the suite. The round workflow bumps
#: this together with the regenerated prefix.
_GATE_EVIDENCE_MAX_ROUND = 9

# The round's changed/new entries — the declared input to the generator,
# kept small by policy (a bloated changed set would crowd out rotation).
_GATE_CHANGED = [
    "customer_view",
    "streaming_hourly_metrics",
    "streaming_hourly_bounded",
    "streaming_timeout_sessions",
]

_GATE_PREFIX = [
    "customer_view",
    "streaming_hourly_metrics",
    "streaming_hourly_bounded",
    "streaming_timeout_sessions",
    "zipf_vocab_fit",
    "zorder_layout_audit",
    "approx_percentile_audit",
    "bm25_search",
    "brand_quantity_revenue",
    "changelog_compaction",
    "collocation_pmi",
    "copurchase_pairs",
    "cross_source_contamination",
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
    "ann_recall_eval",
]

# Round-tagged alias (kept for older tests); all code reads _GATE_PREFIX
# (the stable name the generator checks).
_FRESH_R8 = _GATE_PREFIX
_FRESH_R9 = _GATE_PREFIX
_FRESH_R10 = _GATE_PREFIX


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
