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
