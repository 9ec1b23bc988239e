"""JDBC round-trip smoke against embedded Derby (reference S6/S7:
consumer/consumer.py:186-237, 321-367).

Derby ships inside the Spark distribution, so unlike Kafka this edge is
fully testable here: raw-event append via ``write_events_jdbc`` read back
through ``spark.read.jdbc``, and the engine-generated MERGE upsert executed
TWICE against a real database to prove idempotence (the property the
reference's additive ``+ EXCLUDED`` merge lacks).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from energy_data_stream_processing_spark.operators.hourly import hourly_business_metrics
from energy_data_stream_processing_spark.sources.adapter import energy_events
from energy_data_stream_processing_spark.sources.sinks import (
    jdbc_upsert_statement,
    write_events_jdbc,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_url(tmp_path, name: str) -> str:
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DRIVER)
        return True
    except Exception:  # noqa: BLE001
        return False


def test_jdbc_raw_event_roundtrip(spark, sf_dir, tmp_path):
    if not _derby_available(spark):
        pytest.skip("embedded Derby driver not on the Spark classpath")
    url = _derby_url(tmp_path, "rawdb")
    ev = energy_events(spark, sf_dir).where(F.col("event_id") < 500)
    write_events_jdbc(ev, url, "raw_events")

    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "raw_events")
        .option("driver", DRIVER)
        .load()
    )
    assert back.count() == ev.count()
    # value-exact on a stable projection (Derby CLOB round-trips strings)
    cols = ["event_id", "event_type", "event_time", "customer_id"]
    a = sorted(map(tuple, ev.select(*cols).collect()))
    b = sorted(map(tuple, back.select(*cols).collect()))
    assert a == b

    # append again -> rows double: the sink really is append-mode (S6)
    write_events_jdbc(ev, url, "raw_events")
    assert back.count() == 2 * ev.count()


def test_jdbc_merge_upsert_idempotent(spark, sf_dir, tmp_path):
    if not _derby_available(spark):
        pytest.skip("embedded Derby driver not on the Spark classpath")
    url = _derby_url(tmp_path, "metricsdb")
    hm = hourly_business_metrics(energy_events(spark, sf_dir))
    seed = hm.orderBy("hour").limit(2)
    (
        seed.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "hourly_business_metrics")
        .option("driver", DRIVER)
        .mode("append")
        .save()
    )

    # the re-flush: one changed hour staged via the same JDBC writer (the
    # per-micro-batch shape — foreachBatch appends to staging, MERGE folds)
    row = seed.collect()[0].asDict()
    doctored = seed.where(F.col("hour") == row["hour"]).withColumn(
        "total_logins", F.col("total_logins") + 100
    )
    (
        doctored.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "staging")
        .option("driver", DRIVER)
        .mode("append")
        .save()
    )
    row["total_logins"] = int(row["total_logins"]) + 100

    sql = jdbc_upsert_statement(
        "hourly_business_metrics", dialect="merge", source_table="staging"
    )
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        for _ in range(2):  # twice-applied must be a no-op the second time
            st = conn.createStatement()
            assert st.executeUpdate(sql) == 1
            st.close()
    finally:
        conn.close()

    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "hourly_business_metrics")
        .option("driver", DRIVER)
        .load()
    )
    assert back.count() == 2  # updated in place, never duplicated
    got = back.where(F.col("hour") == row["hour"]).collect()[0]
    assert got["total_logins"] == row["total_logins"]
    # untouched row unaffected (full-row replacement only hits its key)
    other = seed.collect()[1]
    kept = back.where(F.col("hour") == other["hour"]).collect()[0]
    assert kept["total_logins"] == other["total_logins"]
