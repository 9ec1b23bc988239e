"""Grafana ``$__timeFilter`` parameterization (business-metrics.json:140,253).

Panel builders accept optional ``(t_lo, t_hi)`` bounds that post-filter the
view's output on its time column — exactly what Grafana's injected
``time BETWEEN lo AND hi`` predicate does against the Postgres views. The
oracle twin is the unchanged catalog oracle wrapped in the same predicate,
so window-based panels (cumulative, LAG, rolling) must keep full-history
semantics across the range boundary.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from energy_data_stream_processing_spark.plans.catalog import all_queries
from tests.test_oracle_differential import TABLES, _rows

# non-default range: an 8-day slab starting 3 days into the 30-day window
T_LO = None  # resolved per-sf_dir in _bounds
SPAN_DAYS = 8
OFFSET_DAYS = 3

PARAMETERIZED = [
    ("total_energy_trend", "time"),
    ("revenue_overview", "time"),
    ("green_adoption", "hour"),
    ("rolling_24h_metrics", "hour"),
    ("demand_elasticity", "time"),
    ("pricing_insights", "time"),
    ("ab_test_segments", "time"),
    ("peak_load_management", "time"),
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _bounds(con) -> tuple[datetime.datetime, datetime.datetime]:
    lo_ts = con.execute("SELECT min(ts) FROM events").fetchone()[0]
    lo = (lo_ts + datetime.timedelta(days=OFFSET_DAYS)).replace(
        minute=0, second=0, microsecond=0
    )
    return lo, lo + datetime.timedelta(days=SPAN_DAYS)


@pytest.mark.parametrize("name,time_col", PARAMETERIZED)
def test_time_filtered_panel_matches_filtered_oracle(spark, sf_dir, name, time_col):
    q = all_queries()[name]
    con = _duck(sf_dir)
    t_lo, t_hi = _bounds(con)

    sdf = q.builder(spark, sf_dir, t_lo=t_lo, t_hi=t_hi)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = _rows(sdf.collect(), s_cols)

    res = con.execute(
        f"SELECT * FROM ({q.oracle}) WHERE {time_col} >= ? AND {time_col} <= ?",
        [t_lo, t_hi],
    )
    d_cols = [d[0].lower() for d in res.description]
    d_rows = _rows(res.fetchall(), d_cols)
    con.close()

    assert sorted(s_cols) == sorted(d_cols)
    assert 0 < len(s_rows) < len(_rows(q.builder(spark, sf_dir).collect(), s_cols)), (
        "range must be a strict non-empty subset or the test proves nothing"
    )
    first_diff = next(
        ((a, b) for a, b in zip(s_rows, d_rows) if a != b),
        ("row-count mismatch", (len(s_rows), len(d_rows))),
    )
    assert s_rows == d_rows, f"{name}: first diff {first_diff}"


def test_default_bounds_keep_full_output(spark, sf_dir):
    q = all_queries()["total_energy_trend"]
    full = q.builder(spark, sf_dir).count()
    defaulted = q.builder(spark, sf_dir, t_lo=None, t_hi=None).count()
    assert full == defaulted
