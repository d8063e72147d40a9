"""Custom stateful streaming operator: per-user running totals via
``applyInPandasWithState`` — the escape hatch for stateful semantics the
built-in windowed aggregations can't express (per-key accumulators,
custom eviction, session enrichment, online feature stores).

Design:
- State per user_id: (n events, total value, last event-time ms) —
  a fixed-width accumulator, so state size is O(distinct keys), not
  O(events).  At 100 TB / unbounded streams this is the number that
  must stay bounded; pair with a watermark-driven timeout
  (GroupStateTimeout) to evict idle keys in production.
- Arrow-batched: each group's rows arrive as pandas DataFrames; the
  update is vectorized numpy arithmetic, never per-row Python.
- The SAME accumulator semantics are expressed in batch as a plain
  groupBy aggregation (`stream_stateful_user_totals`, DuckDB-oracle-
  checked); stream-vs-batch parity is pytest-asserted, the standard
  verification pattern for non-SQL-expressible stateful ops.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firebase_realtime_database_backup_spark.catalog import read_table
from firebase_realtime_database_backup_spark.operators.relational import oround
from firebase_realtime_database_backup_spark.registry import Registry

REG = Registry()

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_ts_ms bigint"
STATE_SCHEMA = "n bigint, total double, last_ms bigint"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    """GroupState update function: fold this micro-batch's rows for one
    user into the accumulator and emit the post-update snapshot."""
    n, total, last_ms = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_last = int(pdf["ts"].astype("int64").max() // 1_000_000)
        last_ms = max(last_ms, batch_last)
    state.update((n, total, last_ms))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts_ms": [last_ms],
        }
    )


def stateful_user_totals_stream(events: DataFrame) -> DataFrame:
    """Streaming form: arbitrary stateful processing over grouped
    Arrow batches.  Update-mode output: one snapshot row per (key,
    micro-batch that touched it)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _make_user_totals_processor():
    """Build the transformWithStateInPandas processor CLASS at module
    scope so its state-fold logic is drivable without the streaming
    runtime: `pyspark.sql.streaming.stateful_processor` imports clean
    without protobuf (only the live JVM state-server protocol needs
    it), which lets the parity test in this offline container execute
    handleInputRows against a faithful in-memory ValueState instead of
    skipping — the accumulator semantics (OUR code) run everywhere;
    only Spark's own wire protocol requires protobuf."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(
            self, key: tuple, rows: Iterator[pd.DataFrame], timer_values: Any
        ) -> Iterator[pd.DataFrame]:
            n, total, last_ms = (
                self._totals.get() if self._totals.exists() else (0, 0.0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                batch_last = int(pdf["ts"].astype("int64").max() // 1_000_000)
                last_ms = max(last_ms, batch_last)
            self._totals.update((n, total, last_ms))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "last_ts_ms": [last_ms],
                }
            )

        def close(self) -> None:
            pass

    return UserTotalsProcessor


def stateful_user_totals_tws(events: DataFrame) -> DataFrame:
    """Same accumulator on Spark 4's transformWithStateInPandas — the
    successor API to applyInPandasWithState: named state variables on a
    processor handle (ValueState here; ListState/MapState/timers
    available), native TTL support, and schema evolution of state.
    Runs only on the RocksDB state store provider (set
    spark.sql.streaming.stateStore.providerClass accordingly) and
    requires the `protobuf` package at RUNTIME (the processor talks to
    the JVM state server over a protobuf protocol).  Where protobuf is
    absent the parity test drives the processor class directly over
    the same micro-batch splits (_make_user_totals_processor), so the
    accumulator logic is tested everywhere; applyInPandasWithState
    (stateful_user_totals_stream) is the non-protobuf production
    path."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_user_totals_processor()(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


@REG.query(
    "stream_stateful_user_totals",
    oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           {oround("SUM(value)")} AS total_value,
           CAST(EPOCH_MS(MAX(ts)) AS BIGINT) AS last_ts_ms
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stateful accumulator: identical final state as
    running stateful_user_totals_stream over the same rows (parity
    pytest-checked in tests/test_stateful.py)."""
    events = read_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.unix_millis(F.max("ts")).alias("last_ts_ms"),
    )
