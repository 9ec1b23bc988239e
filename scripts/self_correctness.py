"""Emit CORRECTNESS_SELF.json: the repo's own driver-style differential.

The per-round driver gate checks only ~50 of the catalog entries (184 as
of round 5); this script runs ALL of them (179 oracle twins + rows-only
for the 5 approximate-by-design sketches) with a
dtype-SENSITIVE compare (the repo's pytest differential normalizes via
``repr`` and so masks e.g. DuckDB HUGEINT vs Spark bigint — exactly the
artifact class that burned rounds 1-2), so regressions outside the driver's
set are tracked round-over-round.

Usage: python scripts/self_correctness.py [sf_dir] [query ...]
  default sf_dir: /root/testdata/sf0.01 (the driver's correctness SF)
  with query names: check only those, print results, don't write the file
"""

from __future__ import annotations

import datetime
import hashlib
import json
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from energy_data_stream_processing_spark.plans.catalog import all_queries
from energy_data_stream_processing_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _cell(v) -> str:
    """Dtype-sensitive canonical cell: int 5 != float 5.0 != Decimal 5."""
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


def _canon(rows, cols) -> tuple[list[tuple[str, ...]], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(tuple(_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in canon:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return canon, h.hexdigest()


def assert_driver_canonicalizable(schema, rows, cols) -> None:
    """Fail loudly on any output the per-round driver cannot canonicalize.

    The driver loads results into pandas and ``sort_values`` over ALL
    columns; array/struct/map cells become Python lists/dicts there and
    raise ``TypeError: unhashable type`` (exactly how round 6's
    ``multimodal_decode_stub`` went red while this script's repr-based
    ``_cell`` stayed green). Two gates, both driver-semantics:

    1. schema gate — no ArrayType/MapType/StructType in the top-level
       output schema (the repo convention is to flatten: ``array_join`` a
       string list, ``getItem`` scalar floats);
    2. behavior gate — a literal pandas ``sort_values`` over the collected
       rows, so anything else pandas chokes on fails here first.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    if complex_cols:
        raise TypeError(
            "driver-uncanonicalizable complex-type output columns: "
            f"{complex_cols} (flatten per the customer_view convention)"
        )
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=list(cols))
    if len(pdf):
        pdf.sort_values(list(pdf.columns))  # raises on unhashable cells


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.01"
    only = [a for a in argv if not os.path.isdir(a)]

    spark = get_spark("self-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    out: dict[str, dict] = {}
    names = only or sorted(all_queries())
    for name in names:
        q = all_queries()[name]
        rec: dict = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = q.builder(spark, sf_dir)
            s_cols = [c.lower() for c in sdf.columns]
            raw_rows = [tuple(r) for r in sdf.collect()]
            assert_driver_canonicalizable(sdf.schema, raw_rows, s_cols)
            s_rows, s_hash = _canon(raw_rows, s_cols)
            rec["spark_rows"] = len(s_rows)
            if q.oracle is None:
                # rows-only check, mirroring the driver's weaker gate
                rec.update(
                    rows_match=True, schema_match=True, hash_match=True,
                    oracle_rows=None, mode="rows_only",
                )
            else:
                res = con.execute(q.oracle)
                d_cols = [d[0].lower() for d in res.description]
                d_rows, d_hash = _canon(res.fetchall(), d_cols)
                rec["oracle_rows"] = len(d_rows)
                rec["rows_match"] = len(s_rows) == len(d_rows)
                rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
                rec["hash_match"] = s_hash == d_hash
                if not rec["hash_match"] and rec["rows_match"]:
                    diff = [
                        (a, b) for a, b in zip(s_rows, d_rows) if a != b
                    ][:2]
                    rec["first_diff"] = diff
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"[:400]
        out[name] = rec
        flag = "ok" if rec["hash_match"] else "FAIL"
        print(f"{flag:4} {name} ({rec['spark_rows']} rows)"
              + (f" err={rec['err']}" if rec["err"] else ""))

    n_ok = sum(1 for r in out.values() if r["hash_match"])
    print(f"-- {n_ok}/{len(out)} green at {sf_dir}")
    if not only:
        # the unsuffixed artifact is the driver-equivalent sf0.01 gate;
        # other scales get their own file so a sweep can't clobber it
        suffix = "" if sf_dir.rstrip("/").endswith("sf0.01") else (
            "_" + sf_dir.rstrip("/").rsplit("/", 1)[-1]
        )
        fname = f"CORRECTNESS_SELF{suffix}.json"
        with open(fname, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {fname}")
    spark.stop()
    return 0 if n_ok == len(out) else 1


if __name__ == "__main__":
    raise SystemExit(main())
