"""Physical-plan regression gates.

Correctness is oracle-gated; these pin the PLAN properties the 100 TB design
depends on, so a refactor can't silently regress them:

- reference-parity queries stay UDF-free (whole-stage codegen JVM execution);
- column pruning reaches the parquet scan for key queries;
- small dimensions broadcast; the sessionization plan keeps ONE shuffle.
"""

from __future__ import annotations

import re

import pytest

from energy_data_stream_processing_spark.plans.catalog import all_queries

# Reference-parity + relational queries: zero Python on the hot path.
UDF_FREE = [
    "hourly_business_metrics",
    "rolling_24h_metrics",
    "customer_view",
    "business_kpis_growth",
    "pricing_insights",
    "user_sessions",
    "pricing_summary",
    "top_customer_revenue",
    "shipping_priority",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "embedding_cosine_topk",
    "local_supplier_volume",
    "volume_shipping",
    "market_share",
    "returned_items",
    "promo_revenue",
    "top_supplier",
    "small_quantity_revenue",
    "large_volume_customers",
    "wealthy_inactive_customers",
    "props_numeric_profile",
    "hourly_gap_fill",
    "event_type_hour_cube",
    "user_value_tiers",
    "label_centroids",
]

# Dense-math operators where an Arrow-vectorized UDF is the DESIGN (numpy
# batch kernels); still must never fall back to row-at-a-time Python.
VECTORIZED = ["dedup_minhash_lsh", "ann_lsh_topk", "ann_ivf_topk"]


def _plan(spark, sf_dir, name: str) -> str:
    df = all_queries()[name].builder(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", UDF_FREE)
def test_no_python_udf_in_hot_path(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "BatchEvalPython" not in plan, f"{name} fell back to row-at-a-time Python"
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan, (
        f"{name} unexpectedly uses a Pandas UDF — reference-parity queries "
        "must stay JVM-side"
    )


@pytest.mark.parametrize("name", VECTORIZED)
def test_vectorized_never_row_at_a_time(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "BatchEvalPython" not in plan, f"{name} fell back to row-at-a-time Python"
    assert "ArrowEvalPython" in plan, f"{name} lost its vectorized kernel"


def test_pruning_and_pushdown_reach_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    # plan strings truncate long FileScan lines with '...': drop the final
    # (possibly partial) token before asserting.
    schemas = re.findall(r"ReadSchema: struct<([^\n]*)", plan)
    assert schemas, "no parquet scan found"
    cols = {c.split(":")[0] for s in schemas for c in s.split(",")[:-1] if c}
    allowed = {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_shipdate",
    }
    assert cols <= allowed, f"pricing_summary scan reads extra columns: {cols - allowed}"
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, (
        "shipdate range filter did not push down to the parquet scan"
    )


def test_dimension_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "top_customer_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sessionization_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "user_sessions")
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, (
        "sessionize must reuse the user_id partitioning for window + groupBy"
    )


def test_six_table_join_single_smj(spark, sf_dir):
    # Q5 shape: every dimension broadcasts; the only shuffle join is the
    # orders<->lineitem fact-fact leg. A regression that drops a broadcast
    # hint (or breaks its small-side placement) shows up as a second SMJ.
    plan = _plan(spark, sf_dir, "local_supplier_volume")
    assert len(re.findall(r"SortMergeJoin", plan)) <= 1, (
        "local_supplier_volume grew a second shuffled join — a dimension "
        "lost its broadcast"
    )
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 4


def test_having_cohort_broadcast_semi(spark, sf_dir):
    # Q18 shape: the HAVING-filtered cohort is tiny and must semi-join by
    # broadcast so the lineitem fact is not shuffled for the filter.
    plan = _plan(spark, sf_dir, "large_volume_customers")
    assert re.search(r"BroadcastHashJoin .*LeftSemi", plan), (
        "large-volume cohort is no longer a broadcast semi-join"
    )


def test_anti_join_date_filter_pushdown(spark, sf_dir):
    # Q22 shape: the anti-join's date restriction must reach the orders scan
    # (not evaluate post-join).
    plan = _plan(spark, sf_dir, "wealthy_inactive_customers")
    assert "GreaterThanOrEqual(o_orderdate" in plan, (
        "orders date filter did not push down to the parquet scan"
    )
