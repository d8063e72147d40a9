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

from firebase_realtime_database_backup_spark.registry import Registry, build_registry


def _registry() -> Registry:
    return build_registry(
        warn=lambda msg: print(f"WARNING: {msg}", file=sys.stderr)
    )


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
