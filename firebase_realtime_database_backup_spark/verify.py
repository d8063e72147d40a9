"""Local replica of the driver's DuckDB-oracle correctness loop.

The driver runs each ``queries()[name]`` on Spark and ``oracle_sql()[name]``
on DuckDB over the same parquet (sf0.01) and compares row count + schema +
order-insensitive value hash.  This module does the same locally so every
operator is validated the moment it is written, at any SF.

DRIVER-FAITHFUL CANONICALIZATION (round-3 rewrite).  Rounds 1 and 2 each
shipped two correctness failures that the local loop missed because it
fetched the DuckDB side via ``fetchall()`` (HUGEINT -> Python int,
rows -> tuples) while the driver canonicalizes via pandas
(``fetchdf()``: HUGEINT -> float64; array cells -> Python lists that
crash ``sort_values``).  This module now goes through pandas on BOTH
sides, exactly like the driver:

* Spark side: ``df.toPandas()``.
* Oracle side: ``cur.fetchdf()``.
* Canon: lowercase + name-sort columns, ``sort_values`` over all columns
  (which raises ``TypeError: unhashable type`` on list cells — the
  driver's ERR class — so we surface it instead of masking it).
* Value compare is dtype-class sensitive: an int64 cell and a float64
  cell with the same numeric value DO NOT match (the HUGEINT class).

In addition, :func:`lint_oracle_output_types` and
:func:`lint_spark_output_types` make both failure classes structurally
impossible: no oracle may produce a HUGEINT/array/map/struct output
column and no oracle-backed Spark query may return array/map/struct
columns.  ``tests/test_oracle.py`` runs both lints over the full
registry.
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


# ---------------------------------------------------------------------------
# pandas canonicalization (mirrors the driver's _canon)
# ---------------------------------------------------------------------------


def _canon_pdf(pdf):
    """Lowercase + name-sort columns, then sort_values over all columns.

    ``sort_values`` is retained for driver fidelity: it raises
    ``TypeError: unhashable type: 'list'`` when a cell holds an
    array/map — the exact crash the driver records as ERR — so a query
    returning nested cells fails HERE, not in the driver's window."""
    pdf = pdf.copy()
    pdf.columns = [str(c).lower() for c in pdf.columns]
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf.columns) and len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns))
    return pdf.reset_index(drop=True)


def _token(v):
    """Dtype-class-sensitive cell token.

    Ints and floats deliberately do NOT unify: DuckDB HUGEINT reaches
    pandas as float64 while Spark bigint stays int64, and the driver's
    hash treats those as different — so must we.  Dates and midnight
    timestamps DO unify (DuckDB fetchdf renders DATE as datetime64[ns]
    midnight, Spark toPandas keeps datetime.date; the driver's record
    shows date-output queries passing, so its canon conflates them)."""
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, (np.floating, float)):
        f = float(v) + 0.0  # collapse -0.0/+0.0 (the pre-round-3 loop and
        if math.isnan(f):   # the driver's r1/r2 record both treated them equal)
            return "∅"
        return f"f:{f!r}"
    if isinstance(v, (np.bool_, bool)):
        return f"b:{bool(v)}"
    if isinstance(v, (np.integer, int)):
        return f"i:{int(v)}"
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return f"d:{v.date().isoformat()}"
        return f"d:{v.isoformat()}"
    if isinstance(v, _dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (np.timedelta64, pd.Timedelta)):
        return f"t:{pd.Timedelta(v).total_seconds()!r}"
    if isinstance(v, _dt.timedelta):
        return f"t:{v.total_seconds()!r}"
    if isinstance(v, (bytes, bytearray)):
        return "y:" + bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray, dict)):
        # unreachable when sort_values succeeded, but belt-and-braces
        raise TypeError(f"nested cell in canon: {type(v).__name__}")
    return f"s:{v}"


def _token_rows(pdf) -> list[tuple]:
    rows = [
        tuple(_token(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


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
    s_pdf = sdf.toPandas()
    o_pdf = con.execute(sql).fetchdf()

    details: list[str] = []
    s_cols = sorted(str(c).lower() for c in s_pdf.columns)
    o_cols = sorted(str(c).lower() for c in o_pdf.columns)
    if s_cols != o_cols:
        details.append(f"schema mismatch: spark={s_cols} oracle={o_cols}")
    if len(s_pdf) != len(o_pdf):
        details.append(f"row count: spark={len(s_pdf)} oracle={len(o_pdf)}")
    if not details:
        try:
            a = _token_rows(_canon_pdf(s_pdf))
            b = _token_rows(_canon_pdf(o_pdf))
        except (TypeError, ValueError) as exc:  # the driver's ERR class
            # TypeError: unhashable list cells; ValueError: np.ndarray
            # cells ("truth value of an array is ambiguous") — Spark
            # toPandas renders array columns as ndarray, which raises
            # ValueError (not TypeError) inside sort_values.
            details.append(f"canon error (driver would ERR): {exc}")
        else:
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                details.append(f"value mismatch, first diffs: {diffs}")
    return CompareResult(name, not details, len(s_pdf), len(o_pdf), details)


# ---------------------------------------------------------------------------
# structural lints — make both driver failure classes impossible
# ---------------------------------------------------------------------------

#: DuckDB output types the driver's pandas canon renders lossily
#: (HUGEINT -> float64) or crashes on (LIST/STRUCT/MAP -> unhashable).
_BANNED_DUCK_MARKERS = ("HUGEINT", "[]", "STRUCT(", "MAP(", "UNION(")


def lint_oracle_output_types(con, oracles: dict[str, str]) -> list[str]:
    """DESCRIBE every oracle; flag HUGEINT / nested output columns."""
    problems = []
    for name, sql in sorted(oracles.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as exc:  # noqa: BLE001 — lint must report, not die
            problems.append(f"{name}: DESCRIBE failed: {exc}")
            continue
        for col, typ, *_ in desc:
            t = str(typ).upper()
            if any(m in t for m in _BANNED_DUCK_MARKERS):
                problems.append(
                    f"{name}: oracle column {col!r} has driver-unsafe "
                    f"type {typ} (cast to BIGINT / array_join to string)"
                )
    return problems


def lint_spark_output_types(
    spark: SparkSession, queries, oracles, sf_dir: str
) -> list[str]:
    """Oracle-backed Spark queries must return scalar columns only."""
    from pyspark.sql import types as T

    problems = []
    for name, fn in sorted(queries.items()):
        if name not in oracles:
            continue  # rows-only queries may return nested shapes
        schema = fn(spark, sf_dir).schema
        for f in schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                problems.append(
                    f"{name}: column {f.name!r} is {f.dataType.simpleString()} "
                    "— driver canon crashes on nested cells; flatten it"
                )
    return problems


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
