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

FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")

ORACLES = sorted(n for n, q in all_queries().items() if q.oracle is not None)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLES)
def test_oracle_emits_no_int128_or_decimal(con, name):
    desc = con.execute(f"DESCRIBE {all_queries()[name].oracle}").fetchall()
    bad = [(r[0], r[1]) for r in desc if any(f in r[1].upper() for f in FORBIDDEN)]
    assert not bad, (
        f"{name}: columns {bad} are int128- or decimal-typed in DuckDB; "
        "CAST(... AS BIGINT) for int128 sums, CAST(... AS DOUBLE) for "
        "decimals — the driver's hash renders Spark Decimal and a "
        "pandas-converted DuckDB decimal differently even when values match "
        "(asof_active_tariff was red 3 rounds on exactly this)"
    )


def test_spark_outputs_no_decimal(spark, sf_dir):
    """Every catalog entry's OUTPUT schema is DecimalType-free.

    Covers oracle-less (rows-only) entries too: the engine rule is that all
    money/energy columns cast to DOUBLE before output, so no compare — driver
    or self-check — can ever depend on decimal rendering.
    """
    bad = []
    for name, q in sorted(all_queries().items()):
        sdf = q.builder(spark, sf_dir)
        for f in sdf.schema.fields:
            if "decimal" in f.dataType.simpleString():
                bad.append(f"{name}.{f.name}")
    assert not bad, f"DecimalType output columns (cast to DOUBLE): {bad}"
