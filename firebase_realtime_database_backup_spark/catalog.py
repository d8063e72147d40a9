"""Catalog for the driver's test tables and snapshot datasets.

The reference has no catalog at all — its only "table discovery" is the
``shallow=true`` child listing (src/BackupProcessor.php:82-89) and the
``metadata.json`` manifest (src/BackupProcessor.php:49-51).  Here, parquet
footers + directory layout are the catalog; this module is a thin typed
veneer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: The ten driver-generated tables (TESTDATA.md).  Star schema:
#: lineitem → orders → customer → nation → region; lineitem → part;
#: lineitem → supplier → nation.  `events` is stream-shaped;
#: `documents`/`embeddings` back the LLM-data operators.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables that stay broadcast-sized at ANY scale factor (their
#: cardinality is fixed or near-fixed in TPC-H-style scaling).  `customer`,
#: `part`, `supplier` scale with SF and must NOT be blanket-broadcast.
BROADCAST_SAFE = frozenset({"region", "nation"})


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_engine_conf(spark: SparkSession) -> None:
    """Set the runtime-settable confs the engine's semantics depend on,
    for sessions NOT built by session.get_spark (e.g. a harness passes
    its own).  Spark 4 rejects INT64 TIMESTAMP(NANOS) parquet unless
    nanosAsLong is on; UTC keeps timestamp rendering deterministic.
    """
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this deployment — session factory owns it


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan of one test table.

    Filters and projections applied downstream reach this scan via
    Catalyst pushdown (verify with .explain → PushedFilters/ReadSchema);
    never pre-collect or pre-filter here.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Always: events needs nanosAsLong, and every NTZ-date table
    # (orders/lineitem) needs the UTC session timezone so NTZ→LTZ casts
    # (unix_millis, date filters) are engine-independent on a bare
    # driver-built session.
    ensure_engine_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F

    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # events.ts written as parquet timestamp[ns], read as raw
        # nanos (spark.sql.legacy.parquet.nanosAsLong).  Normalize to
        # a micros TimestampType with exact integer division — the
        # same truncation DuckDB applies for TIMESTAMP_NS → TIMESTAMP.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Timestamp columns written without UTC adjustment read back as
    # TIMESTAMP_NTZ.  The engine standardizes on TimestampType — the
    # strict-typed time functions (unix_millis, F.window, watermarks)
    # demand it, and mixed NTZ/LTZ unions don't coerce.  With the UTC
    # session timezone the cast is wall-clock-identity, preserving
    # parity with DuckDB's naive TIMESTAMP views.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})
    return df


def spread(df: DataFrame, min_ratio: float = 0.5) -> DataFrame:
    """Repartition ONLY when the scan under `df` yields fewer partitions
    than the session's parallelism wants (small/single-file local inputs
    — one 0.6 MB parquet file is one task, serializing CPU-heavy
    downstream work onto one of 32 cores).  On a real cluster a 100 TB
    input already splits into >> cores partitions and this is a no-op,
    so the shuffle it introduces exists only where it pays for itself.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(target * min_ratio)):
        return df.repartition(target)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql() use."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
