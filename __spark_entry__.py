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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
