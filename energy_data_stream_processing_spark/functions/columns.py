"""Deterministic numeric column helpers.

The engine is differential-tested against a DuckDB oracle by exact value
hashing, so every aggregate must be *bitwise* reproducible across engines:

- Sums of money/energy go through exact DECIMAL arithmetic (order-independent)
  and are cast to double only at the end. A double-typed ``sum()`` would be
  summation-order-dependent and diverge between engines/partitionings.
- Rounding uses ``floor(x*100 + 0.5)/100`` on doubles. Both Spark and DuckDB
  evaluate this with identical IEEE-754 steps, unlike their native ``round``
  functions which disagree on values like 5.005 (Spark rounds the shortest
  decimal representation HALF_UP; DuckDB rounds the binary double).

Mirrors the ratio derivations of the reference consumer
(consumer/consumer.py:313-318: value/count if count else 0).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


#: See gateway_columns. Values are (gateway, built) — keeping the gateway
#: object in the value makes staleness an identity check, never an id() reuse.
_GATEWAY_MEMO: dict[str, tuple] = {}


def gateway_columns(key: str, build):
    """Build-once-per-JVM memo for constructed Column trees (round 16,
    guide §7.3 driver-side work).

    Column objects are immutable UNRESOLVED expression trees bound to the
    py4j gateway — not to a session, dataset or frame — so a wide
    aggregation's Column list (e.g. the hourly 15-metric tree: ~60 py4j
    round trips ≈ 0.2-0.4 s of driver latency) can be constructed once per
    JVM and reused by every caller and frame, exactly like a prepared
    statement's parsed expressions. ``build`` is a zero-arg callable run
    under the memo; a restarted JVM presents a different gateway object
    (identity-checked) and rebuilds, so stale JavaObjects are never served.

    Aliased Columns pin their exprId at CONSTRUCTION (round-16 advice), so
    every plan built from one memoized list shares those exprIds. Composing
    two such frames into ONE plan (join/union of two slices built from the
    same list) relies on Spark's relation deduplication to re-key one side;
    that composition is exercised — and must keep binding each side to its
    own input — in tests/test_round17_ops.py::
    test_gateway_columns_two_frames_one_plan.
    """
    from pyspark import SparkContext

    gw = SparkContext._gateway
    memo = _GATEWAY_MEMO.get(key)
    if memo is not None and memo[0] is gw:
        return memo[1]
    built = build()
    _GATEWAY_MEMO[key] = (gw, built)
    return built


def round_half_up(c: Column, scale: int = 2) -> Column:
    """Deterministic cross-engine round-half-up on non-negative doubles."""
    factor = F.lit(float(10**scale))
    return (F.floor(c.cast("double") * factor + F.lit(0.5)) / factor).cast("double")


def dsum(c: Column) -> Column:
    """Exact (decimal) sum surfaced as double; 0.0 when no rows matched.

    ``c`` must already be a DecimalType column so partial aggregation is
    exact and order-independent (map-side combine safe at any scale).
    """
    return F.coalesce(F.sum(c).cast("double"), F.lit(0.0))


def safe_div(num: Column, den: Column) -> Column:
    """num/den as double, 0.0 when the denominator is 0 or NULL.

    Reference semantics: consumer/consumer.py:313-318 derives averages as
    ``total / count if count else 0``.
    """
    return F.coalesce(num.cast("double") / F.nullif(den.cast("double"), F.lit(0.0)), F.lit(0.0))
