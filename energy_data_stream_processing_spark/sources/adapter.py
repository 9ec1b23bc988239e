"""Driver-testdata -> energy-domain adapter.

The driver generates a generic ``events`` table
(``event_id bigint, ts timestamp, user_id bigint, event_type string in
{click,purchase,error,signup,view}, value double, props string``;
see TESTDATA.md / FIXTURES.md §3). The reference engine's whole query surface
is defined over the energy-domain events table
(database/schema.sql:12-23: customer_id, event_type in 7 energy types,
event_time, energy_consumed, payment_amount, session_id, tariff_type,
channel).

``ENERGY_EVENTS_SQL`` maps one onto the other **deterministically** and is
written in a dialect-neutral SQL subset executed *verbatim* by both Spark SQL
and the DuckDB oracle, so both engines query the identical logical input.

The mapping extends FIXTURES.md §3's 5->5 suggestion to a 5->7 split
(purchase -> tariff_switch|bill_payment, click -> incentive_claim|
energy_consumed on deterministic event_id residues) so that *every*
per-event-type aggregate branch of the reference consumer
(consumer/consumer.py:240-293) is exercised by the correctness gate, not just
the five trivially-mapped ones.

Scale note: the adapter is a pure narrow projection — no shuffle, fully
codegen'd, predicate/column pruning pushes through it into the parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Dialect-neutral: runs unchanged on Spark SQL and DuckDB 1.0.
ENERGY_EVENTS_SQL = """
SELECT
  event_id,
  concat('CUST', lpad(cast(user_id AS STRING), 4, '0'))      AS customer_id,
  ts                                                          AS event_time,
  CASE
    WHEN event_type = 'signup'                        THEN 'user_login'
    WHEN event_type = 'error'                         THEN 'user_logout'
    WHEN event_type = 'view'                          THEN 'view_tariffs'
    WHEN event_type = 'purchase' AND event_id % 3 = 0 THEN 'tariff_switch'
    WHEN event_type = 'purchase'                      THEN 'bill_payment'
    WHEN event_type = 'click' AND event_id % 7 = 0    THEN 'incentive_claim'
    ELSE 'energy_consumed'
  END                                                         AS event_type,
  CASE WHEN event_type = 'purchase' OR (event_type = 'click' AND event_id % 7 = 0)
       THEN cast(value AS DECIMAL(10,2)) END                  AS payment_amount,
  CASE WHEN event_type = 'click' AND event_id % 7 <> 0
       THEN cast(value AS DECIMAL(10,3)) END                  AS energy_consumed,
  cast(event_id % 4000 + 1000 AS INT)                         AS session_id,
  CASE cast(event_id % 3 AS INT)
    WHEN 0 THEN 'web_portal'
    WHEN 1 THEN 'mobile_app'
    ELSE 'call_center'
  END                                                         AS channel,
  CASE WHEN event_type IN ('view', 'purchase', 'click')
            AND NOT (event_type = 'purchase' AND event_id % 3 <> 0)
            AND NOT (event_type = 'click' AND event_id % 7 <> 0)
       THEN CASE cast(user_id % 3 AS INT)
              WHEN 0 THEN 'basic'
              WHEN 1 THEN 'green'
              ELSE 'premium'
            END
       END                                                    AS tariff_type
FROM events
""".strip()


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to an instant-exact TIMESTAMP across testdata
    vintages, independent of the session timezone.

    The driver has shipped ``ts`` as parquet TIMESTAMP(NANOS) (read as
    nanos-since-epoch long under ``nanosAsLong`` — truncate to micros with
    integer ``div``; double division would lose precision at ~1.7e18) and as
    TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ whose WALL fields are the UTC
    wall). The NTZ branch used to be a plain ``cast('timestamp')`` — correct
    only under a UTC session zone: any other zone re-interpreted the UTC
    wall as local wall, shifting every instant by the zone offset (and a
    zone-aware re-render would still collapse DST fall-back ambiguity). The
    wall fields are therefore converted to epoch micros ARITHMETICALLY
    (days × 86.4e9 + in-day micros), which is exact for every wall
    including the ambiguous ones and never consults the session zone. Both
    branches land on the same micros-precision instants DuckDB sees, so
    oracle comparisons are vintage- and session-tz-independent.
    """
    ts_type = df.schema["ts"].dataType.simpleString()
    if ts_type == "bigint":
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if ts_type != "timestamp":
        return df.withColumn(
            "ts",
            F.expr(
                "timestamp_micros("
                "unix_date(cast(ts AS DATE)) * 86400000000L"
                " + hour(ts) * 3600000000L"
                " + minute(ts) * 60000000L"
                " + cast(extract(SECOND FROM ts) * 1000000 AS BIGINT))"
            ),
        )
    return df


#: Per-(session, dataset-snapshot) memo of LAZY table/adapter frames — plan
#: objects, never data or results: every action on a memoized frame still
#: scans the parquet inputs (round 16, guide §7.3). Re-resolving the same
#: parquet source per builder call (schema inference + DataSource
#: resolution + SQL re-parse for the adapter projection) measured
#: 250-500 ms of pure driver time per catalog builder — paid once per
#: query per bench pass — while a real deployment resolves a table
#: reference through the catalog once. Keyed by session identity
#: (applicationId AND the live SparkSession object id — local-mode
#: applicationIds are 'local-<millis>' and can collide across processes/
#: restarts) plus the dataset's file fingerprint (name, size, mtime_ns),
#: so a dataset rewritten in place re-resolves instead of serving a stale
#: schema — the same invalidation contract as the customer_view density
#: probe's _DENSITY_CACHE (round 10).
_FRAME_CACHE: dict[tuple, DataFrame] = {}


def clear_frame_cache() -> None:
    """Drop all memoized table frames (tests that need immediate
    re-resolution without relying on the mtime fingerprint)."""
    _FRAME_CACHE.clear()


def _table_fingerprint(sf_dir: str, name: str):
    """(file, size, mtime_ns) snapshot id of one parquet table — a
    driver-local listing, no Spark job (mirrors energy_queries.
    _events_fingerprint; on a cluster this is the table's snapshot id)."""
    p = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(p):
            return tuple(
                (f, s.st_size, s.st_mtime_ns)
                for f in sorted(os.listdir(p))
                if f.endswith(".parquet")
                for s in (os.stat(os.path.join(p, f)),)
            )
        s = os.stat(p)
        return (s.st_size, s.st_mtime_ns)
    except OSError:
        return None


def _session_key(spark: SparkSession) -> tuple:
    return (spark.sparkContext.applicationId, id(spark))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver parquet table and register it as a temp view.

    The lazy frame is memoized per (session, dataset snapshot); the temp
    view is (re-)registered on every call so view semantics — last load
    wins — are unchanged."""
    key = (*_session_key(spark), os.path.realpath(sf_dir), name,
           _table_fingerprint(sf_dir, name))
    df = _FRAME_CACHE.get(key)
    if df is None:
        if name == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = normalize_event_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
        else:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _FRAME_CACHE[key] = df
    df.createOrReplaceTempView(name)
    return df


def energy_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The energy-domain events DataFrame over the driver's testdata.

    The raw DataFrame is passed as a parameterized ``spark.sql`` argument
    (not resolved via the global temp view) so concurrently-built plans over
    different sf_dirs can never cross-contaminate. Also registered as temp
    view ``energy_events`` for ad-hoc SQL use. The adapter frame (a pure
    lazy projection) is memoized alongside the raw table (see
    ``_FRAME_CACHE``) — the ~100 ms ENERGY_EVENTS_SQL re-parse per builder
    call was pure driver overhead.
    """
    raw = load_table(spark, sf_dir, "events")
    key = (*_session_key(spark), os.path.realpath(sf_dir), "energy_events",
           _table_fingerprint(sf_dir, "events"))
    df = _FRAME_CACHE.get(key)
    if df is None:
        df = spark.sql(ENERGY_EVENTS_SQL.replace("FROM events", "FROM {events}"), events=raw)
        _FRAME_CACHE[key] = df
    df.createOrReplaceTempView("energy_events")
    return df


def oracle_with_energy_events(body: str, extra_ctes: str = "") -> str:
    """Wrap an oracle query body with the shared adapter CTE."""
    return f"WITH energy_events AS ({ENERGY_EVENTS_SQL}){extra_ctes}\n{body}"
