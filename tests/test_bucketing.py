"""Bucketed co-located join: both sides bucketed on the join key -> the join
plans with ZERO Exchange nodes (shuffle paid once at write time)."""

from __future__ import annotations

import re

from energy_data_stream_processing_spark.sources.adapter import load_table
from energy_data_stream_processing_spark.sources.sinks import write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{tmp_path}/bdb'")
    try:
        orders = load_table(spark, sf_dir, "orders")
        customer = load_table(spark, sf_dir, "customer")
        write_bucketed(orders.select("o_custkey", "o_totalprice"), "bdb.orders_b", "o_custkey")
        write_bucketed(
            customer.withColumnRenamed("c_custkey", "o_custkey").select("o_custkey", "c_mktsegment"),
            "bdb.customer_b",
            "o_custkey",
        )
        ob, cb = spark.table("bdb.orders_b"), spark.table("bdb.customer_b")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = ob.join(cb, "o_custkey")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert len(re.findall(r"Exchange", plan)) == 0, f"bucketed join shuffled:\n{plan[:600]}"
            # and it actually computes the right thing
            o2, c2 = load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
            expected = o2.join(c2, o2.o_custkey == c2.c_custkey).count()
            assert joined.count() == expected
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")
