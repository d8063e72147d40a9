"""Query/oracle registry.

Every operator the engine claims is registered here as a named query
``(spark, sf_dir) -> DataFrame`` together with (when SQL-expressible) a
DuckDB oracle string over the same parquet tables.  The driver's
correctness loop (CORRECTNESS_r{N}.json) and the local test suite both
iterate this registry — an operator without a registry entry does not
exist as far as the gates are concerned.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


class Registry:
    def __init__(self) -> None:
        self.queries: dict[str, QueryFn] = {}
        self.oracles: dict[str, str] = {}

    def query(self, name: str, oracle: str | None = None):
        """Decorator registering a query and, optionally, its DuckDB twin.

        Queries with no oracle get the driver's weaker rows-only check;
        keep those to genuinely non-SQL-expressible ops (ML LSH models,
        stateful streaming, pandas-UDF plumbing).
        """

        def deco(fn: QueryFn) -> QueryFn:
            if name in self.queries:
                raise ValueError(f"duplicate query name {name!r}")
            self.queries[name] = fn
            if oracle is not None:
                self.oracles[name] = " ".join(oracle.split())
            return fn

        return deco

    def merge(self, *others: "Registry") -> "Registry":
        for other in others:
            for name, fn in other.queries.items():
                if name in self.queries:
                    raise ValueError(f"duplicate query name {name!r}")
                self.queries[name] = fn
            self.oracles.update(other.oracles)
        return self


QUERY_MODULES = (
    "firebase_realtime_database_backup_spark.operators.relational",
    "firebase_realtime_database_backup_spark.operators.tpch",
    "firebase_realtime_database_backup_spark.operators.dedup",
    "firebase_realtime_database_backup_spark.operators.similarity",
    "firebase_realtime_database_backup_spark.operators.text",
    "firebase_realtime_database_backup_spark.operators.multimodal",
    "firebase_realtime_database_backup_spark.functions.scalar",
    "firebase_realtime_database_backup_spark.streaming.windows",
    "firebase_realtime_database_backup_spark.streaming.stateful",
    "firebase_realtime_database_backup_spark.sources.tree",
)


def build_registry(warn=None) -> "Registry":
    """Assemble the full engine registry from every query module.

    ``warn`` is called with a message per module that fails to import —
    degrade to the queries that do load, but NEVER silently: a missing
    module would otherwise just shrink the correctness surface without
    a trace."""
    reg = Registry()
    for modname in QUERY_MODULES:
        try:
            mod = __import__(modname, fromlist=["REG"])
            reg.merge(mod.REG)
        except ImportError as exc:
            if warn is not None:
                warn(f"query module {modname} failed to import: {exc}")
    return reg
