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
        #: teaching-variant name -> the production twin to run at scale.
        #: Entries here are oracle-exact baselines KNOWN to have a scale
        #: cliff (single-partition window, fixed LSH planes, full-corpus
        #: regex); anything routing production traffic must use the twin.
        self.prod_twins: dict[str, str] = {}

    def query(self, name: str, oracle: str | None = None,
              prod_twin: str | None = None):
        """Decorator registering a query and, optionally, its DuckDB twin.

        Queries with no oracle get the driver's weaker rows-only check;
        keep those to genuinely non-SQL-expressible ops (ML LSH models,
        stateful streaming, pandas-UDF plumbing).

        ``prod_twin`` visibly marks a query as the oracle-exact TEACHING
        variant of a scale-safe production query — e.g. the
        single-partition NTILE form of RFM whose twin is the
        approx-percentile broadcast form.  `api.py query list` prints
        the marker so the non-scalable form can't be mistaken for the
        pattern to copy.
        """

        def deco(fn: QueryFn) -> QueryFn:
            if name in self.queries:
                raise ValueError(f"duplicate query name {name!r}")
            self.queries[name] = fn
            if oracle is not None:
                self.oracles[name] = " ".join(oracle.split())
            if prod_twin is not None:
                self.prod_twins[name] = prod_twin
            return fn

        return deco

    def merge(self, *others: "Registry") -> "Registry":
        for other in others:
            for name, fn in other.queries.items():
                if name in self.queries:
                    raise ValueError(f"duplicate query name {name!r}")
                self.queries[name] = fn
            self.oracles.update(other.oracles)
            self.prod_twins.update(other.prod_twins)
        return self


# Registration order is driver-visible: the correctness loop walks
# ``queries()`` in insertion order and may cap how many it attests per
# round (round 1 stopped at the first 50 of 153).  Modules are therefore
# listed most-valuable-unattested-first (tpch → dedup → text → ...), and
# ``build_registry`` additionally floats every oracle-backed query ahead
# of every rows-only one so a capped run never spends a slot on a
# weaker rows-only check while an oracle-checked query waits.
QUERY_MODULES = (
    "firebase_realtime_database_backup_spark.operators.tpch",
    "firebase_realtime_database_backup_spark.operators.dedup",
    "firebase_realtime_database_backup_spark.operators.text",
    "firebase_realtime_database_backup_spark.operators.similarity",
    "firebase_realtime_database_backup_spark.functions.scalar",
    "firebase_realtime_database_backup_spark.operators.multimodal",
    "firebase_realtime_database_backup_spark.sources.tree",
    "firebase_realtime_database_backup_spark.operators.relational",
    "firebase_realtime_database_backup_spark.streaming.windows",
    "firebase_realtime_database_backup_spark.streaming.stateful",
)


def build_registry(warn=None) -> "Registry":
    """Assemble the full engine registry from every query module.

    ``warn`` is called with a message per module that fails to import —
    degrade to the queries that do load, but NEVER silently: a missing
    module would otherwise just shrink the correctness surface without
    a trace."""
    merged = Registry()
    for modname in QUERY_MODULES:
        try:
            mod = __import__(modname, fromlist=["REG"])
            merged.merge(mod.REG)
        except ImportError as exc:
            if warn is not None:
                warn(f"query module {modname} failed to import: {exc}")
    # Stable re-order: oracle-backed first (module priority preserved),
    # rows-only last.
    reg = Registry()
    reg.prod_twins.update(merged.prod_twins)
    for name, fn in merged.queries.items():
        if name in merged.oracles:
            reg.queries[name] = fn
            reg.oracles[name] = merged.oracles[name]
    for name, fn in merged.queries.items():
        if name not in merged.oracles:
            reg.queries[name] = fn
    return reg
