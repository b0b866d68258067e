"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query on sf0.001 (smoke check).
- ``queries()``: every implemented operator from SURVEY.md §2 plus the
  training-data-pipeline extras, as (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``: DuckDB twins, same column names/values.

Implementation lives in graphdb_spark/workloads/*; this module is the
thin aggregation layer.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _configure(spark: SparkSession) -> SparkSession:
    """Apply engine settings to a driver-provided session (the driver
    builds its own SparkSession, so build_spark defaults don't apply)."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the default 200 shuffle partitions means 200-task stages on
        # kB-sized test shuffles — pure scheduler overhead at gate SFs
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        # let AQE coalesce small shuffles by SIZE, not parallelism —
        # otherwise every tiny shuffle still launches ~32 tasks
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            "false",
        )
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 << 20)
        )
    except Exception:
        pass  # immutable conf on some deployments; sources handle both
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the F6 one-hop pipe traversal (BUILDING customers →
    PLACED → order vertices) on sf0.001."""
    from graphdb_spark.workloads.graph import g_one_hop

    return g_one_hop(_configure(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from graphdb_spark import workloads

    out = {}
    for name, fn in workloads.all_queries().items():
        out[name] = _wrap(fn)
    return out


_WARMED: set = set()


def _warm(spark: SparkSession, sf_dir: str) -> None:
    """One-time per (session, sf_dir): materialize the memoized F6
    graph cache + register table views, so no individual gate/bench
    query pays the setup cost (VERDICT r2 item 8)."""
    key = (id(spark.sparkContext), sf_dir)
    if key in _WARMED:
        return
    _WARMED.add(key)
    from graphdb_spark.workloads.graph import graph_session

    g = graph_session(spark, sf_dir)
    g.vertex_count(), g.edge_count()


def _wrap(fn):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        _configure(spark)
        _warm(spark, sf_dir)
        return fn(spark, sf_dir)

    runner.__name__ = fn.__name__
    runner.__doc__ = fn.__doc__
    return runner


def oracle_sql() -> dict[str, str]:
    from graphdb_spark import workloads

    return workloads.all_oracles()
