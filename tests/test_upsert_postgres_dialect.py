"""Execute the engine's Postgres-dialect upsert against a real engine.

The reference's metrics flush is ``INSERT ... ON CONFLICT (hour) DO UPDATE``
(consumer/consumer.py:321-367). DuckDB implements the same ``ON CONFLICT``
clause with ``EXCLUDED`` semantics, so the generated statement can be
validated beyond string equality: parsed, planned, and executed with real
conflicts — in milliseconds and with no server lifecycle, which keeps these
law tests cheap enough to run everywhere. Only the paramstyle is
transport-specific (psycopg2 ``%s`` vs DBAPI ``?``) — that substitution
touches no SQL semantics. Since round 8 the SAME statements also execute
against a real PostgreSQL 15 cluster in tests/test_postgres_live.py
(server-side PREPARE, reference-shaped DDL, end-to-end Spark flushes);
this module remains the fast twin.

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


# --- reference-exact additive merge (consumer/consumer.py:321-367) --------

_ADD = {  # a partial flush: per-hour DELTA state, reference field order
    "tariff_switches": 3, "total_switch_revenue": 90.0,
    "incentive_claims": 2, "total_incentive_payouts": 25.0,
    "green_tariff_switches": 1, "active_customers": 4, "new_sessions": 2,
    "total_logins": 7, "total_energy_consumed": 120.0,
    "peak_hour_usage": 55.0, "total_payments": 200.0, "payment_events": 5,
}


def _partial_flush_params(hour, s):
    """The reference's cursor.execute parameter tuple for one partial-state
    flush: raw sums/counts plus the flush-local ratios it computes in
    Python (consumer.py:310-318)."""
    avg_switch = s["total_switch_revenue"] / s["tariff_switches"] if s["tariff_switches"] else 0
    avg_cons = s["total_energy_consumed"] / s["active_customers"] if s["active_customers"] else 0
    avg_pay = s["total_payments"] / s["payment_events"] if s["payment_events"] else 0
    return (
        hour, s["tariff_switches"], s["total_switch_revenue"], avg_switch,
        s["incentive_claims"], s["total_incentive_payouts"], s["green_tariff_switches"],
        s["active_customers"], s["new_sessions"], s["total_logins"],
        s["total_energy_consumed"], avg_cons, s["peak_hour_usage"],
        s["total_payments"], s["payment_events"], avg_pay,
    )


@pytest.fixture
def add_con():
    c = duckdb.connect()
    cols = ", ".join(
        f"{m} {'BIGINT' if m in COUNTERS else 'DOUBLE'}" for m in METRIC_COLUMNS
    )
    c.execute(
        "CREATE TABLE hourly_business_metrics ("
        f"hour TIMESTAMP PRIMARY KEY, {cols}, updated_at TIMESTAMP)"
    )
    yield c
    c.close()


def test_additive_merge_two_partial_flushes_value_exact(add_con):
    """Execute the reference's FULL 16-column additive ON CONFLICT statement
    (consumer/consumer.py:321-367) on a real engine across TWO partial
    flushes of the same hour and assert every merged column value-exactly:
    counters are the sum of the two deltas; the three ratio columns D1-D3
    (avg_switch_value, avg_consumption_per_customer, avg_payment_amount)
    re-derive from the SUMMED numerator/denominator — NOT an average of the
    per-flush averages; peak_hour_usage is last-write-wins (the reference's
    documented merge bug, reproduced faithfully); updated_at is stamped."""
    from energy_data_stream_processing_spark.sources.sinks import jdbc_upsert_statement

    sql = jdbc_upsert_statement(
        "hourly_business_metrics", dialect="postgres_additive"
    ).replace("%s", "?")
    h = datetime.datetime(2025, 6, 3, 9)
    s1 = dict(_ADD)
    s2 = {  # second partial flush, different deltas (incl. a zero denom)
        "tariff_switches": 2, "total_switch_revenue": 50.0,
        "incentive_claims": 0, "total_incentive_payouts": 0.0,
        "green_tariff_switches": 2, "active_customers": 6, "new_sessions": 1,
        "total_logins": 4, "total_energy_consumed": 60.0,
        "peak_hour_usage": 48.0, "total_payments": 0.0, "payment_events": 0,
    }
    add_con.execute(sql, _partial_flush_params(h, s1))
    add_con.execute(sql, _partial_flush_params(h, s2))

    row = add_con.execute(
        "SELECT " + ", ".join(["hour", *METRIC_COLUMNS, "updated_at"])
        + " FROM hourly_business_metrics WHERE hour = ?", [h],
    ).fetchone()
    got = dict(zip(["hour", *METRIC_COLUMNS, "updated_at"], row))

    # additive counters/sums
    for c in [
        "tariff_switches", "total_switch_revenue", "incentive_claims",
        "total_incentive_payouts", "green_tariff_switches", "active_customers",
        "new_sessions", "total_logins", "total_energy_consumed",
        "total_payments", "payment_events",
    ]:
        assert got[c] == s1[c] + s2[c], c
    # D1-D3: ratios of the MERGED sums, bit-exact re-derivation
    assert got["avg_switch_value"] == (
        (s1["total_switch_revenue"] + s2["total_switch_revenue"])
        / (s1["tariff_switches"] + s2["tariff_switches"])
    )
    assert got["avg_consumption_per_customer"] == (
        (s1["total_energy_consumed"] + s2["total_energy_consumed"])
        / (s1["active_customers"] + s2["active_customers"])
    )
    assert got["avg_payment_amount"] == (
        (s1["total_payments"] + s2["total_payments"])
        / (s1["payment_events"] + s2["payment_events"])
    )
    # reference semantics reproduced exactly: peak is last-write-wins,
    # NOT max — flush 2's lower peak overwrites flush 1's higher one
    assert got["peak_hour_usage"] == s2["peak_hour_usage"] == 48.0
    assert got["updated_at"] is not None


def test_additive_merge_zero_denominator_guard(add_con):
    """A merged hour whose summed denominator is zero must take the CASE
    guard's 0, not divide by zero."""
    from energy_data_stream_processing_spark.sources.sinks import jdbc_upsert_statement

    sql = jdbc_upsert_statement(
        "hourly_business_metrics", dialect="postgres_additive"
    ).replace("%s", "?")
    h = datetime.datetime(2025, 6, 3, 10)
    s0 = {k: 0 if isinstance(v, int) else 0.0 for k, v in _ADD.items()}
    add_con.execute(sql, _partial_flush_params(h, s0))
    add_con.execute(sql, _partial_flush_params(h, s0))
    row = add_con.execute(
        "SELECT avg_switch_value, avg_consumption_per_customer, "
        "avg_payment_amount FROM hourly_business_metrics WHERE hour = ?", [h],
    ).fetchone()
    assert list(row) == [0.0, 0.0, 0.0]


# --- round-7 edge cases: identifier quoting/case, NULL-vs-0 ---------------

def test_additive_merge_schema_qualified_table(add_con):
    """A schema-qualified insert target must still execute: in DO UPDATE
    SET the stored row has to be referenced by the table's BASE name
    (schema-qualified column refs are invalid there in Postgres), so the
    generator derives the update-side reference from the last path
    segment."""
    from energy_data_stream_processing_spark.sources.sinks import jdbc_upsert_statement

    add_con.execute("CREATE SCHEMA analytics")
    cols = ", ".join(
        f"{m} {'BIGINT' if m in COUNTERS else 'DOUBLE'}" for m in METRIC_COLUMNS
    )
    add_con.execute(
        "CREATE TABLE analytics.hourly_business_metrics ("
        f"hour TIMESTAMP PRIMARY KEY, {cols}, updated_at TIMESTAMP)"
    )
    sql = jdbc_upsert_statement(
        "analytics.hourly_business_metrics", dialect="postgres_additive"
    ).replace("%s", "?")
    assert "analytics.hourly_business_metrics.tariff_switches" not in sql
    h = datetime.datetime(2025, 6, 4, 8)
    add_con.execute(sql, _partial_flush_params(h, _ADD))
    add_con.execute(sql, _partial_flush_params(h, _ADD))
    got = add_con.execute(
        "SELECT tariff_switches, total_switch_revenue, avg_switch_value "
        "FROM analytics.hourly_business_metrics WHERE hour = ?", [h],
    ).fetchone()
    assert got[0] == 2 * _ADD["tariff_switches"]
    assert got[1] == 2 * _ADD["total_switch_revenue"]
    assert got[2] == (2 * _ADD["total_switch_revenue"]) / (2 * _ADD["tariff_switches"])


def test_additive_merge_heals_stored_nulls(add_con):
    """NULL-vs-0: the reference schema declares every metric NOT NULL
    DEFAULT 0 (database/schema.sql:30-59) so stored NULLs cannot occur
    there — but a target table WITHOUT those constraints would make
    t.col + EXCLUDED.col NULL-poison counters forever. The generated SQL
    coalesces the STORED side, so a pre-existing NULL row heals to the
    delta instead of staying NULL."""
    from energy_data_stream_processing_spark.sources.sinks import jdbc_upsert_statement

    sql = jdbc_upsert_statement(
        "hourly_business_metrics", dialect="postgres_additive"
    ).replace("%s", "?")
    h = datetime.datetime(2025, 6, 4, 9)
    # seed a conflicting row whose metric columns are ALL NULL
    add_con.execute("INSERT INTO hourly_business_metrics (hour) VALUES (?)", [h])
    add_con.execute(sql, _partial_flush_params(h, _ADD))
    row = add_con.execute(
        "SELECT " + ", ".join(METRIC_COLUMNS)
        + " FROM hourly_business_metrics WHERE hour = ?", [h],
    ).fetchone()
    got = dict(zip(METRIC_COLUMNS, row))
    for c, v in _ADD.items():
        assert got[c] == v, f"{c}: stored NULL must heal to the delta, got {got[c]}"
    assert got["avg_switch_value"] == _ADD["total_switch_revenue"] / _ADD["tariff_switches"]
    assert got["avg_consumption_per_customer"] == (
        _ADD["total_energy_consumed"] / _ADD["active_customers"]
    )
    assert got["avg_payment_amount"] == _ADD["total_payments"] / _ADD["payment_events"]


def test_replacement_dialect_schema_qualified_and_case(con):
    """The full-row-replacement dialect (the engine's own flush) with a
    schema-qualified, case-folded table name: unquoted identifiers fold the
    same way on both engines, so the statement executes and replaces."""
    from energy_data_stream_processing_spark.sources.sinks import jdbc_upsert_statement

    sql = jdbc_upsert_statement(
        "MAIN.Hourly_Business_Metrics", dialect="postgres"
    ).replace("%s", "?")
    # unquoted -> folds to the existing lowercase table in the default schema
    h = datetime.datetime(2025, 6, 4, 10)
    con.execute(sql, _row(h, 3))
    con.execute(sql, _row(h, 9))
    got = con.execute(
        "SELECT * FROM hourly_business_metrics WHERE hour = ?", [h]
    ).fetchone()
    assert list(got) == _row(h, 9)


def test_merge_dialect_quotes_reserved_hour():
    """The MERGE dialect must double-quote "hour" everywhere it is used as
    an identifier — it is reserved in ANSI engines (Derby) — and never emit
    an unquoted standalone hour column reference."""
    import re

    from energy_data_stream_processing_spark.sources.sinks import jdbc_upsert_statement

    sql = jdbc_upsert_statement("m", dialect="merge")
    assert 't."hour" = s."hour"' in sql
    # no unquoted `hour` identifier anywhere (word-boundary, not inside a
    # quoted name)
    assert not re.search(r'(?<!")\bhour\b(?!")', sql), sql
