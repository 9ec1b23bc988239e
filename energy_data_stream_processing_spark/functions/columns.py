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
