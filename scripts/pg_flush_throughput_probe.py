"""Live-PostgreSQL flush-throughput probe (SCALE.md §4).

The engine's streaming metrics flush is hours-sized by design (one row per
touched hour per trigger), so the claim "the JDBC sink is never the
bottleneck" rests on the upsert statement's sustained rate being orders of
magnitude above the flush volume. This probe MEASURES that ceiling on a
real PostgreSQL 15: `pgbench` drives the engine-generated statements
(reference consumer/consumer.py:321-367 shape) as custom scripts —
full-row-replacement and the reference's 16-column additive merge — each
against a single conflicted hot hour (worst case: every transaction takes
the DO UPDATE path on one row) and against spread hours.

Usage: python scripts/pg_flush_throughput_probe.py [seconds-per-run]

Reuses the LivePg throwaway-cluster harness from tests/test_postgres_live.py
(initdb + pg_ctl on a unix socket; setpriv to the postgres user when root).
Skips with a message when no usable PostgreSQL install exists.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from energy_data_stream_processing_spark.operators.hourly import METRIC_COLUMNS
from energy_data_stream_processing_spark.sources.sinks import jdbc_upsert_statement


def _pgbench_script(sql: str, hot: bool) -> str:
    """The generated %s-statement as a pgbench script: params become
    pgbench variables (server-side prepared with -M prepared)."""
    n = sql.count("%s")
    for i in range(n):
        sql = sql.replace("%s", f":p{i}", 1)
    lines = []
    if hot:
        lines.append("\\set hr 0")
    else:
        lines.append("\\set hr random(0, 719)")  # a month of distinct hours
    # hour parameter as a timestamp expression pgbench can substitute
    sql = sql.replace(":p0", "timestamp '2025-06-01 00:00' + :hr * interval '1 hour'", 1)
    for i in range(1, n):
        lines.append(f"\\set p{i} random(1, 1000)")
    lines.append(sql + ";")
    return "\n".join(lines) + "\n"


def main() -> int:
    from test_postgres_live import LivePg, _pg_available, _pg_bindir, _reference_ddl

    if not _pg_available():
        print("no usable PostgreSQL install — probe skipped")
        return 0
    if not os.path.exists(os.path.join(_pg_bindir(), "pgbench")):
        print("pgbench not installed alongside the server — probe skipped")
        return 0
    secs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    base = tempfile.mkdtemp(prefix="pg-bench-")
    pg = LivePg(_pg_bindir(), base)
    pg.start()
    try:
        results: dict[str, float] = {}
        for dialect in ("postgres", "postgres_additive"):
            for hot in (True, False):
                table = f"m_{dialect.split('_')[-1]}_{'hot' if hot else 'spread'}"
                pg.sql(_reference_ddl(table))
                script = _pgbench_script(
                    jdbc_upsert_statement(table, dialect=dialect), hot
                )
                spath = os.path.join(base, f"{table}.sql")
                with open(spath, "w") as f:
                    f.write(script)
                out = subprocess.run(
                    [os.path.join(pg.bindir, "pgbench"), "-h", pg.sock,
                     "-U", "postgres", "-d", "postgres", "-n", "-M", "prepared",
                     "-c", "4", "-j", "4", "-T", str(secs), "-f", spath],
                    capture_output=True, text=True,
                )
                if out.returncode != 0:
                    print(f"{table}: pgbench failed\n{out.stderr}")
                    return 1
                m = re.search(r"tps = ([0-9.]+)", out.stdout)
                if m is None:
                    print(f"{table}: could not parse tps from pgbench "
                          f"output:\n{out.stdout}")
                    return 1
                tps = float(m.group(1))
                results[table] = tps
                rows = pg.sql(f"SELECT count(*) FROM {table};")[0][0]
                print(f"{table}: {tps:,.0f} upserts/sec "
                      f"(4 clients, {secs}s, {rows} rows in table)")
        hourly = min(results.values())
        print(
            f"\nfloor across shapes: {hourly:,.0f}/sec — an hours-sized "
            f"flush (24-8760 rows) costs << 1s; the flush statement is "
            f">{hourly * 3600:,.0f} row-upserts per hour of wall clock"
        )
    finally:
        pg.stop()
        import shutil

        shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
