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


# Round-15 gate ordering: this round's changed entries first (the native-
# collapse rework's audit, the running-totals update-fn extraction, and the
# two ANN audits rewired to plans/audit_constants.py), then the
# stalest-evidence cohort (r11 by name),
# truncated to the driver's ~50-entry sampled prefix. GENERATED — do not
# hand-edit; regenerate with
#   python scripts/gen_gate_prefix.py --max-round <horizon> --changed <...>
# and verified by `gen_gate_prefix.py --check` from _GATE_CHANGED +
# CORRECTNESS_r*.json evidence age up to _GATE_EVIDENCE_MAX_ROUND (the
# pinned horizon: later driver artifacts are ignored so mid-round artifact
# drops can't redden the check). Oracle-less entries sort LAST in
# _ordered_names so the sampled prefix stays 100% hash-checkable.

_GATE_EVIDENCE_MAX_ROUND = 14

_GATE_CHANGED: list[str] = [
    "streaming_hourly_native_audit",
    "streaming_running_totals",
    "ann_lsh_recall_audit",
    "ann_ivf_recall_audit",
]

_GATE_PREFIX = [
    "streaming_hourly_native_audit",
    "streaming_running_totals",
    "ann_lsh_recall_audit",
    "ann_ivf_recall_audit",
    "business_kpis_growth",
    "channel_performance",
    "channel_tariff_contingency",
    "churned_customers",
    "customer_view",
    "dedup_cluster_keep_best",
    "dedup_components",
    "dedup_impact_report",
    "dedup_substring_windows",
    "embedding_cosine_topk",
    "epoch_shuffle_assignment",
    "knn_label_consistency",
    "retention_cohorts",
    "retrieval_rbo_eval",
    "returned_items",
    "revenue_rollup",
    "rolling_7d_active_users",
    "semantic_dedup_keep",
    "semantic_dedup_lsh",
    "shipping_priority",
    "small_quantity_revenue",
    "sole_blame_suppliers",
    "streaming_corpus_curation",
    "streaming_dedup_replay",
    "streaming_hourly_type_topk",
    "streaming_scd2_maintenance",
    "streaming_sliding_event_rate",
    "streaming_view_purchase_attribution",
    "streaming_weighted_reservoir",
    "strict_service_orders",
    "supplier_part_variety",
    "text_quality",
    "tfidf_top_terms",
    "token_stats_by_lang",
    "top_customer_revenue",
    "top_customer_revenue_salted",
    "top_supplier",
    "top_value_days_per_user",
    "trailing_window_burst",
    "value_percentiles_by_type",
    "volume_shipping",
    "wealthy_inactive_customers",
    "asof_active_tariff",
    "asof_forward_next_switch",
    "asof_tolerance_tariff",
    "burstiness_index",
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
