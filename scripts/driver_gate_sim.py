"""Simulate the grading driver's correctness gate exactly: VANILLA
SparkSession (none of session.py's configs), the first N entries of
``__spark_entry__.queries()``, DuckDB oracle twins, dtype-sensitive
row-hash compare at sf0.01.

This differs from scripts/self_correctness.py in one load-bearing way: the
session is vanilla, so anything the engine needs (nanos-timestamp handling,
shuffle-partition assumptions, AQE interplay) must work without our session
factory — the exact condition the driver imposes.

Usage: python scripts/driver_gate_sim.py [n_prefix] (default 50)
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def _cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, int):
        return f"int:{v}"
    if isinstance(v, float):
        return "float:NaN" if math.isnan(v) else f"float:{v!r}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, datetime.date):
        return f"date:{v.isoformat()}"
    return f"{type(v).__name__}:{v!r}"


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(tuple(_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in canon:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    n_prefix = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    entry_rows = e.entry(spark).collect()
    print(f"entry(): {len(entry_rows)} rows")
    qs, osql = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    n_ok = n_fail = n_rows_only = 0
    for name in list(qs)[:n_prefix]:
        try:
            sdf = qs[name](spark, SF_DIR)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in osql:
                n_rows_only += 1
                print(f"rows-only {name} ({len(s_rows)})")
                continue
            res = con.execute(osql[name])
            d_cols = [d[0].lower() for d in res.description]
            d_rows = res.fetchall()
            ok = (
                len(s_rows) == len(d_rows)
                and sorted(s_cols) == sorted(d_cols)
                and _canon(s_rows, s_cols) == _canon(d_rows, d_cols)
            )
        except Exception as ex:  # noqa: BLE001
            ok = False
            print(f"ERR  {name}: {type(ex).__name__}: {ex}"[:200])
        if ok:
            n_ok += 1
        else:
            n_fail += 1
            print(f"FAIL {name}")
    print(f"-- driver-sim: {n_ok} PASS / {n_fail} FAIL / {n_rows_only} rows-only "
          f"of first {n_prefix} (vanilla session, {SF_DIR})")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
