"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 for the driver's DuckDB-oracle correctness loop at sf0.01.

The real implementation lives in ``firebase_realtime_database_backup_spark/``;
this module only aggregates the per-module registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from firebase_realtime_database_backup_spark.registry import Registry


def _registry() -> Registry:
    from firebase_realtime_database_backup_spark.operators import relational

    reg = Registry()
    reg.merge(relational.REG)
    for modname in (
        "firebase_realtime_database_backup_spark.operators.tpch",
        "firebase_realtime_database_backup_spark.operators.dedup",
        "firebase_realtime_database_backup_spark.operators.similarity",
        "firebase_realtime_database_backup_spark.operators.text",
        "firebase_realtime_database_backup_spark.operators.multimodal",
        "firebase_realtime_database_backup_spark.functions.scalar",
        "firebase_realtime_database_backup_spark.streaming.windows",
        "firebase_realtime_database_backup_spark.streaming.stateful",
        "firebase_realtime_database_backup_spark.sources.tree",
    ):
        try:
            mod = __import__(modname, fromlist=["REG"])
            reg.merge(mod.REG)
        except ImportError as exc:
            # Degrade to the queries that do import, but NEVER silently:
            # a missing module would otherwise just shrink the
            # correctness surface without a trace.
            print(f"WARNING: query module {modname} failed to import: {exc}",
                  file=sys.stderr)
    return reg


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from firebase_realtime_database_backup_spark.operators.relational import (
        flagship_revenue,
    )

    return flagship_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_registry().queries)


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for every SQL-expressible query in ``queries()``."""
    return dict(_registry().oracles)
