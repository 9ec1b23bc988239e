"""Detect oracle/Spark dtype divergences (e.g. DuckDB HUGEINT vs Spark bigint).

The driver's CORRECTNESS hash is dtype-sensitive: DuckDB promotes SUM over
integers to HUGEINT (int128) while Spark yields bigint, so value-identical
results hash differently.  This script DESCRIBEs every oracle in DuckDB and
flags any column whose type can't be produced by Spark (HUGEINT / UHUGEINT)
or that disagrees with the Spark builder's schema.

Usage: python scripts/check_oracle_types.py [--spark]
  default: DuckDB-only HUGEINT scan (fast)
  --spark: also build every Spark plan and diff the full schemas
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from energy_data_stream_processing_spark.plans.catalog import all_queries

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

DUCK_TO_SPARK = {
    "BIGINT": "bigint", "INTEGER": "int", "SMALLINT": "smallint",
    "TINYINT": "tinyint", "DOUBLE": "double", "FLOAT": "float",
    "VARCHAR": "string", "BOOLEAN": "boolean", "DATE": "date",
    "TIMESTAMP": "timestamp_ntz", "TIMESTAMP_NS": "timestamp_ntz",
}


def main() -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    with_spark = "--spark" in sys.argv
    spark = None
    if with_spark:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[4]")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.sql.session.timeZone", "UTC")
            .appName("oracle-type-check")
            .getOrCreate()
        )

    bad = 0
    for name, q in sorted(all_queries().items()):
        if q.oracle is None:
            # rows-only entries still feed the driver's schema record —
            # sweep their Spark output for DecimalType in --spark mode.
            if spark is not None:
                sdf = q.builder(spark, SF_DIR)
                for f in sdf.schema.fields:
                    if "decimal" in f.dataType.simpleString():
                        print(f"{name}.{f.name}: Spark DecimalType output "
                              "(cast to DOUBLE)")
                        bad += 1
            continue
        try:
            desc = con.execute(f"DESCRIBE {q.oracle}").fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: DESCRIBE failed: {e}")
            bad += 1
            continue
        duck_types = {r[0].lower(): r[1].upper() for r in desc}
        huge = [c for c, t in duck_types.items() if "HUGEINT" in t]
        if huge:
            print(f"{name}: HUGEINT columns {huge}")
            bad += 1
        # DECIMAL outputs are a driver-hash hazard even when both engines
        # agree on the type: the harness renders Spark Decimal and a
        # pandas-converted DuckDB decimal differently. Engine rule: cast
        # money/energy to DOUBLE before output, both sides.
        dec = [c for c, t in duck_types.items() if "DECIMAL" in t]
        if dec:
            print(f"{name}: DECIMAL output columns {dec} (cast to DOUBLE)")
            bad += 1
        if spark is not None:
            sdf = q.builder(spark, SF_DIR)
            for f in sdf.schema.fields:
                if "decimal" in f.dataType.simpleString():
                    print(f"{name}.{f.name}: Spark DecimalType output "
                          "(cast to DOUBLE)")
                    bad += 1
                st = f.dataType.simpleString()
                dt = duck_types.get(f.name.lower())
                if dt is None:
                    print(f"{name}: oracle missing column {f.name}")
                    bad += 1
                elif dt in DUCK_TO_SPARK and DUCK_TO_SPARK[dt] != st:
                    # timestamp/timestamp_ntz both acceptable
                    if {DUCK_TO_SPARK[dt], st} == {"timestamp_ntz", "timestamp"}:
                        continue
                    print(f"{name}.{f.name}: duck {dt} vs spark {st}")
                    bad += 1
    print(f"-- {bad} divergences")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
