"""Named-query catalog.

Every analytical capability of the reference (its Postgres views and each
Grafana dashboard panel's raw SQL — SURVEY.md §2.4 Q1-Q24) plus the extended
training-data operators lives here as a named entry:

- ``builder(spark, sf_dir) -> DataFrame`` — the Spark-first implementation;
- ``oracle`` — an equivalent DuckDB SQL string over the same parquet tables
  (None only for ops not expressible in SQL, e.g. LSH candidate generation);
- ``headline`` — included in ``bench.py``'s timed set.

``__spark_entry__.py`` (the driver contract) is a thin re-export of this
registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    headline: bool = False
    doc: str = ""


_REGISTRY: dict[str, CatalogQuery] = {}


def register(
    name: str, oracle: str | None = None, headline: bool = False, doc: str = ""
) -> Callable:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        _REGISTRY[name] = CatalogQuery(name=name, builder=fn, oracle=oracle, headline=headline, doc=doc)
        return fn

    return deco


def stage_result(spark: SparkSession, df: DataFrame, name: str) -> DataFrame:
    """Materialize a builder's output to a per-name parquet staging path and
    return a scan of it. For builders whose result plan reads from a
    TEMPORARY store directory (incremental-index entries), the result must
    be made durable before the store is cleaned up — staging through parquet
    keeps that materialization distributed (executor writes), where a
    ``collect()``/``createDataFrame`` round-trip would funnel every row
    through the driver. The stage path is namespaced by the session's
    applicationId AND the driver pid — local-mode applicationId is just
    'local-<currentTimeMillis>', so two processes starting in the same
    millisecond would otherwise share a namespace and the first to exit
    would atexit-rmtree the other's live staging mid-read. Per-entry and
    overwritten each run within a session; removed at interpreter exit."""
    import atexit
    import os
    import shutil
    import tempfile

    app_dir = os.path.join(
        tempfile.gettempdir(),
        "edsp_stage",
        f"{spark.sparkContext.applicationId}-{os.getpid()}",
    )
    if app_dir not in _STAGE_CLEANUPS:
        _STAGE_CLEANUPS.add(app_dir)
        atexit.register(shutil.rmtree, app_dir, ignore_errors=True)
    stage = os.path.join(app_dir, name)
    df.write.mode("overwrite").parquet(stage)
    return spark.read.parquet(stage)


_STAGE_CLEANUPS: set[str] = set()


def all_queries() -> dict[str, CatalogQuery]:
    # Import side-effect modules lazily so a broken optional module can't
    # take down the whole catalog at import time.
    from . import energy_queries  # noqa: F401
    from . import ops_queries  # noqa: F401
    from . import profile_queries  # noqa: F401
    from . import sampling_queries  # noqa: F401
    from . import session_queries  # noqa: F401
    from . import timeseries_queries  # noqa: F401
    from . import tpch_queries  # noqa: F401
    from . import training_queries  # noqa: F401
    from .. import streaming  # noqa: F401

    return dict(_REGISTRY)
