"""Local replica of the driver's DuckDB-oracle correctness loop.

The driver runs each ``queries()[name]`` on Spark and ``oracle_sql()[name]``
on DuckDB over the same parquet (sf0.01) and compares row count + schema +
order-insensitive value hash.  This module does the same locally so every
operator is validated the moment it is written, at any SF.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from firebase_realtime_database_backup_spark.catalog import TABLES


def duckdb_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _norm_value(v):
    """Normalize a cell so Spark and DuckDB results compare equal."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact compare (collapse only -0.0/+0.0): queries are written so
        # both engines produce bit-identical doubles — per-row arithmetic
        # shares IEEE op order, aggregates are rounded Spark-style on
        # both sides (see operators/relational.py:oround)
        return v + 0.0
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_value(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v
    if isinstance(v, int):
        return int(v)
    return v


def _norm_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Driver semantics: sort columns by name, then order-insensitive rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    details: list[str] = field(default_factory=list)


def compare_query(
    spark: SparkSession, con, name: str, fn, sql: str, sf_dir: str
) -> CompareResult:
    sdf = fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    cur = con.execute(sql)
    o_cols = [d[0].lower() for d in cur.description]
    o_rows = cur.fetchall()

    details: list[str] = []
    if sorted(s_cols) != sorted(o_cols):
        details.append(f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    if len(s_rows) != len(o_rows):
        details.append(f"row count: spark={len(s_rows)} oracle={len(o_rows)}")
    if not details:
        a, b = _norm_rows(s_cols, s_rows), _norm_rows(o_cols, o_rows)
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            details.append(f"value mismatch, first diffs: {diffs}")
    return CompareResult(name, not details, len(s_rows), len(o_rows), details)


def run_all(
    spark: SparkSession,
    sf_dir: str,
    only: set[str] | None = None,
) -> list[CompareResult]:
    """Compare every registered query with an oracle; rows-only check for
    the rest (runs the query, asserts it executes and has a schema)."""
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb_connection(sf_dir)
    results = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name in oracles:
            results.append(compare_query(spark, con, name, fn, oracles[name], sf_dir))
        else:
            df = fn(spark, sf_dir)
            n = df.count()
            results.append(CompareResult(name, True, n, -1, ["rows-only"]))
    return results
