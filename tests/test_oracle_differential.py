"""Differential gate: every catalog query vs its DuckDB oracle.

Mirrors the driver's CORRECTNESS check (row count + column names + exact
values, order-insensitive) at sf0.001 so regressions surface locally before
the per-round sf0.01 run.
"""

from __future__ import annotations

import datetime
import math

import os
import sys

import duckdb
import pytest

from energy_data_stream_processing_spark.plans.catalog import all_queries

# one-time path setup for the shared canonicalization gate (NOT inside the
# per-query helper — ~185 parametrized calls would stack duplicate sys.path
# entries and shadow same-named imports for the rest of the session)
_SCRIPTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
)
if _SCRIPTS not in sys.path:
    sys.path.append(_SCRIPTS)
from self_correctness import assert_driver_canonicalizable  # noqa: E402

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return repr(v)


def _rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLE_QUERIES = sorted(n for n, q in all_queries().items() if q.oracle is not None)


def _canonicalization_gate(name, schema, rows, cols):
    """Driver-canonicalization gate: the per-round driver pandas-sorts over
    all columns, so top-level array/struct/map output columns (or any
    unhashable cell) crash it — round 6's only red row. ONE definition,
    shared with the full self-check (scripts/self_correctness.py), so the
    two gates cannot drift."""
    try:
        assert_driver_canonicalizable(schema, rows, cols)
    except TypeError as e:
        pytest.fail(f"{name}: {e}")


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    q = all_queries()[name]
    sdf = q.builder(spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    raw = sdf.collect()
    _canonicalization_gate(name, sdf.schema, [tuple(r) for r in raw], spark_cols)
    spark_rows = _rows(raw, spark_cols)

    con = _duck(sf_dir)
    res = con.execute(q.oracle)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = _rows(res.fetchall(), duck_cols)
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(spark_rows, duck_rows)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatching rows; first 3: {mismatches[:3]}"
