"""Skew mitigation: salted equi-join.

AQE's skew-join splitting (on in `session.py`) handles most skew at runtime,
but it only kicks in for sort-merge joins and only per shuffle block; the
classic explicit mitigation — salt the skewed fact side, replicate the
dimension side — is sometimes still the right tool (e.g. one pathological
hot key dominating a partition at 100 TB). This implements it as a reusable
operator with result-identity to the plain join (oracle-gated through the
catalog's salted query variant).

Mechanics: fact rows get ``salt = pmod(xxhash64(entire row), n)`` —
deterministic, uniform, no RNG; the dimension side cross-joins a literal
``sequence(0, n-1)`` to exist once per salt value; the join key becomes
(key, salt), splitting each hot key across n reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[tuple[str, str]],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Join ``fact`` to ``dim`` on equi-key pairs ``[(fact_col, dim_col)...]``
    with the fact side salted ``salt`` ways and the dim side replicated.

    Result is row-identical to the unsalted join for inner/left joins (the
    only shapes where replicate-the-dim is semantically sound — a right or
    full join would multiply unmatched dim rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_fact = fact.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.struct(*fact.columns)), F.lit(salt)).cast("int")
    )
    replicated_dim = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    cond = F.col(f"__f.{SALT_COL}") == F.col(f"__d.{SALT_COL}")
    for fcol, dcol in on:
        cond = cond & (F.col(f"__f.{fcol}") == F.col(f"__d.{dcol}"))
    out = salted_fact.alias("__f").join(replicated_dim.alias("__d"), cond, how)
    return out.drop(SALT_COL)
