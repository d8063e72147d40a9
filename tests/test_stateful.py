"""Stateful-streaming parity: applyInPandasWithState's final per-key
state must equal the batch aggregation over the same rows, including
across multiple micro-batches (state carried between batches)."""

import pytest

from pyspark.sql import functions as F

from firebase_realtime_database_backup_spark.catalog import read_table
from firebase_realtime_database_backup_spark.streaming.stateful import (
    stateful_user_totals_stream,
)
from firebase_realtime_database_backup_spark.streaming.windows import stream_events


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """sf0.001 events split across 3 files so the file stream produces
    multiple micro-batches (maxFilesPerTrigger=1) — exercising state
    carry-over, not just single-batch folding."""
    d = str(tmp_path_factory.mktemp("stateful_events"))
    read_table(spark, "/root/testdata/sf0.001", "events").repartition(3).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_stateful_stream_matches_batch(spark, events_dir):
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.unix_millis(F.max("ts")).alias("last_ts_ms"),
        )
    )
    expected = {r.user_id: r for r in batch.collect()}

    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    ).option("maxFilesPerTrigger", 1).parquet(events_dir)
    q = (
        stateful_user_totals_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_totals")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # update mode emits one snapshot per (key, touching micro-batch);
    # the final state is the row with the highest n_events per key.
    final = {}
    for r in spark.table("stateful_totals").collect():
        cur = final.get(r.user_id)
        if cur is None or r.n_events > cur.n_events:
            final[r.user_id] = r

    assert set(final) == set(expected)
    for uid, exp in expected.items():
        got = final[uid]
        assert got.n_events == exp.n_events, uid
        assert got.total_value == pytest.approx(exp.total_value, rel=1e-12), uid
        assert got.last_ts_ms == exp.last_ts_ms, uid


def test_stateful_stream_is_incremental(spark, events_dir):
    """With maxFilesPerTrigger=1 and 3 input files, at least one user
    must be emitted in more than one micro-batch (i.e., state was
    loaded, updated, and re-emitted — not recomputed from scratch)."""
    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    ).option("maxFilesPerTrigger", 1).parquet(events_dir)
    q = (
        stateful_user_totals_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_incr")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    counts = (
        spark.table("stateful_incr")
        .groupBy("user_id")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert counts >= 2


def test_transform_with_state_matches_batch(spark, events_dir):
    """Spark 4 transformWithStateInPandas parity: the ValueState
    processor's final per-key state equals the batch aggregation,
    across multiple micro-batches.

    Two execution paths, so the test RUNS everywhere instead of
    skipping: with `protobuf` installed it runs the real streaming
    query on the RocksDB state store; in this offline container (no
    protobuf — only Spark's JVM state-server WIRE protocol needs it,
    not the processor) it drives the identical processor class over
    the same per-file micro-batch splits against a faithful in-memory
    ValueState, which exercises every line of OUR accumulator logic:
    state load, multi-batch fold, update, snapshot emission."""
    try:
        import google.protobuf  # noqa: F401

        has_protobuf = True
    except ImportError:
        has_protobuf = False

    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.unix_millis(F.max("ts")).alias("last_ts_ms"),
        )
    )
    expected = {r.user_id: r for r in batch.collect()}

    if not has_protobuf:
        _drive_tws_processor_inline(spark, events_dir, expected)
        return

    from firebase_realtime_database_backup_spark.streaming.stateful import (
        stateful_user_totals_tws,
    )

    old_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, event_type string, "
            "value double, props string"
        ).option("maxFilesPerTrigger", 1).parquet(events_dir)
        q = (
            stateful_user_totals_tws(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_totals")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if old_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", old_provider
            )

    final = {}
    for r in spark.table("tws_totals").collect():
        cur = final.get(r.user_id)
        if cur is None or r.n_events > cur.n_events:
            final[r.user_id] = r

    assert set(final) == set(expected)
    for uid, exp in expected.items():
        got = final[uid]
        assert got.n_events == exp.n_events, uid
        assert got.total_value == pytest.approx(exp.total_value, rel=1e-12), uid
        assert got.last_ts_ms == exp.last_ts_ms, uid


class _FakeValueState:
    """In-memory ValueState with the exact get/exists/update surface
    the processor uses — per-key isolation handled by the driver loop
    (the runtime scopes the handle's state to the current grouping
    key; one fake handle per key reproduces that)."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class _FakeHandle:
    def __init__(self):
        self._states = {}

    def getValueState(self, name, schema):
        return self._states.setdefault(name, _FakeValueState())


def _drive_tws_processor_inline(spark, events_dir, expected):
    """Execute the real UserTotalsProcessor class over the same 3-file
    micro-batch split the streaming run would see, with one
    handle-scoped state per key, and assert the final snapshots equal
    the batch aggregation."""
    import glob
    import os

    from firebase_realtime_database_backup_spark.streaming.stateful import (
        _make_user_totals_processor,
    )

    cls = _make_user_totals_processor()
    procs, final = {}, {}
    files = sorted(glob.glob(os.path.join(events_dir, "part-*.parquet")))
    assert len(files) >= 3  # multiple micro-batches, state carry-over
    for f in files:  # one micro-batch per file (maxFilesPerTrigger=1)
        pdf_all = spark.read.parquet(f).toPandas()
        for uid, pdf in pdf_all.groupby("user_id"):
            if uid not in procs:
                proc = cls()
                proc.init(_FakeHandle())
                procs[uid] = proc
            for out in procs[uid].handleInputRows(
                (uid,), iter([pdf.reset_index(drop=True)]), None
            ):
                final[int(out["user_id"].iloc[0])] = out.iloc[0]
    for proc in procs.values():
        proc.close()

    assert set(final) == set(expected)
    for uid, exp in expected.items():
        got = final[uid]
        assert got["n_events"] == exp.n_events, uid
        assert got["total_value"] == pytest.approx(
            exp.total_value, rel=1e-12
        ), uid
        assert got["last_ts_ms"] == exp.last_ts_ms, uid
