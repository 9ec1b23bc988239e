"""Dtype-artifact guard: no oracle may produce a type Spark can't emit.

DuckDB promotes integer SUM/window-SUM to HUGEINT (int128); Spark yields
bigint. Values compare equal under repr-normalization (so the value
differential stays green) but the driver's dtype-sensitive hash compare
fails — 16 catalog rows read as red for two rounds on exactly this.
DESCRIBE-only (no execution, no Spark), so the whole catalog checks in
seconds.
"""

from __future__ import annotations

import duckdb
import pytest

from energy_data_stream_processing_spark.plans.catalog import all_queries
from tests.test_oracle_differential import TABLES

FORBIDDEN = ("HUGEINT", "UHUGEINT")

ORACLES = sorted(n for n, q in all_queries().items() if q.oracle is not None)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLES)
def test_oracle_emits_no_int128(con, name):
    desc = con.execute(f"DESCRIBE {all_queries()[name].oracle}").fetchall()
    bad = [(r[0], r[1]) for r in desc if any(f in r[1].upper() for f in FORBIDDEN)]
    assert not bad, (
        f"{name}: columns {bad} are int128-typed in DuckDB; wrap the SUM in "
        "CAST(... AS BIGINT) so the driver's dtype-sensitive hash matches Spark"
    )
