"""Execute the engine's Postgres-dialect upsert against a real engine.

The reference's metrics flush is ``INSERT ... ON CONFLICT (hour) DO UPDATE``
(consumer/consumer.py:321-367). No Postgres server ships in this
environment, but DuckDB implements the same ``ON CONFLICT`` clause with
``EXCLUDED`` semantics, so the generated statement can be validated beyond
string equality: parsed, planned, and executed with real conflicts. Only the
paramstyle is transport-specific (psycopg2 ``%s`` vs DBAPI ``?``) — that
substitution touches no SQL semantics.

These tests are Spark-free and run in milliseconds.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from energy_data_stream_processing_spark.operators.hourly import METRIC_COLUMNS
from energy_data_stream_processing_spark.sources.sinks import jdbc_upsert_statement

COUNTERS = {
    "tariff_switches", "incentive_claims", "green_tariff_switches",
    "active_customers", "new_sessions", "total_logins", "payment_events",
}


@pytest.fixture
def con():
    c = duckdb.connect()
    cols = ", ".join(
        f"{m} {'BIGINT' if m in COUNTERS else 'DOUBLE'}" for m in METRIC_COLUMNS
    )
    # ON CONFLICT (hour) requires a uniqueness constraint on hour — same as
    # the reference's PRIMARY KEY (database/schema.sql:30-59)
    c.execute(f"CREATE TABLE hourly_business_metrics (hour TIMESTAMP PRIMARY KEY, {cols})")
    yield c
    c.close()


def _row(hour: datetime.datetime, seed: int) -> list:
    vals = [hour]
    for i, m in enumerate(METRIC_COLUMNS):
        vals.append(seed + i if m in COUNTERS else float(seed) + i / 100.0)
    return vals


def _stmt() -> str:
    sql = jdbc_upsert_statement("hourly_business_metrics", dialect="postgres")
    assert "ON CONFLICT (hour) DO UPDATE SET" in sql
    assert f"{METRIC_COLUMNS[0]} = EXCLUDED.{METRIC_COLUMNS[0]}" in sql
    return sql.replace("%s", "?")


def test_on_conflict_insert_then_replace(con):
    sql = _stmt()
    h1 = datetime.datetime(2025, 6, 1, 12)
    h2 = datetime.datetime(2025, 6, 1, 13)
    con.execute(sql, _row(h1, 10))
    con.execute(sql, _row(h2, 20))
    assert con.execute("SELECT count(*) FROM hourly_business_metrics").fetchone()[0] == 2

    # conflicting flush for h1: full-row REPLACEMENT, not addition — the
    # engine ships complete per-hour aggregates, so = EXCLUDED is correct
    # where the reference's + EXCLUDED double-counted distincts
    con.execute(sql, _row(h1, 50))
    got = con.execute(
        "SELECT * FROM hourly_business_metrics WHERE hour = ? ", [h1]
    ).fetchone()
    assert list(got) == _row(h1, 50)
    # the other hour is untouched
    other = con.execute(
        "SELECT * FROM hourly_business_metrics WHERE hour = ?", [h2]
    ).fetchone()
    assert list(other) == _row(h2, 20)


def test_on_conflict_idempotent_replay(con):
    sql = _stmt()
    h = datetime.datetime(2025, 6, 2, 7)
    for _ in range(3):  # at-least-once delivery: replays must be no-ops
        con.execute(sql, _row(h, 7))
    assert con.execute("SELECT count(*) FROM hourly_business_metrics").fetchone()[0] == 1
    got = con.execute("SELECT * FROM hourly_business_metrics").fetchone()
    assert list(got) == _row(h, 7)
