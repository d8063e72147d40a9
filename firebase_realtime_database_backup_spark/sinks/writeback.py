"""Batched writeback sink: replay a tree DataFrame into a Firebase-style
store via merge-PATCH updates with AIMD batch sizing and recursive
split-on-failure (the reference's restore pipeline, R3-R6).

Mapping (SURVEY.md §2.A):
- R3 batched PATCH      slice N keys → update(path, slice)
                        (src/RestoreProcessor.php:70-106)
      → foreachPartition writer; each task owns a client connection
- R4 AIMD batch sizing  halve on failure (floor 1), ×1.2 after 5
                        successes cap 1000 (src/RestoreProcessor.php:83,97-104)
      → identical controller per (task, path)
- R5 split-on-failure   single-key update still fails ⇒ descend one
                        level and PATCH per child (src/RestoreProcessor.php:86-94)
- R6 progress anti-join array_diff_key written keys
                        (src/RestoreProcessor.php:99)
      → structural: batches are disjoint slices, so "remaining keys"
        is the iterator position; the DataFrame-level form is
        df.join(written, keys, "left_anti")

Ordering hazard (SURVEY.md §7.4): Firebase update() is a merge at the
TARGET path, but replacing descendants it writes — so a parent-level
PATCH after a child-level PATCH can clobber the child.  The reference
dodges this with strictly sequential manifest order; we make it
structural instead: rows are grouped by parent path (one PATCH never
spans paths), paths are partitioned by hash so one path lands in exactly
one task, and within a task paths are written in ascending depth so
ancestors never overwrite a descendant's finer-grained write.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_BATCH = 1000          # src/RestoreProcessor.php:17
GROWTH_FACTOR = 1.2       # src/RestoreProcessor.php:100-103
GROWTH_AFTER = 5
MIN_BATCH = 1             # src/RestoreProcessor.php:83 floor


@dataclass
class WritebackStats:
    patches: int = 0
    halvings: int = 0
    splits: int = 0
    keys_written: int = 0

    def merge(self, other: "WritebackStats") -> None:
        self.patches += other.patches
        self.halvings += other.halvings
        self.splits += other.splits
        self.keys_written += other.keys_written


def _write_path(
    client, path: str, data: dict, stats: WritebackStats, max_batch: int = MAX_BATCH
) -> None:
    """AIMD loop for one path's key set (the reference's save_path,
    src/RestoreProcessor.php:70-106), iterative."""
    keys = sorted(data)
    ipp = min(max_batch, max(MIN_BATCH, len(keys)))
    successes = 0
    i = 0
    while i < len(keys):
        batch_keys = keys[i : i + ipp]
        batch = {k: data[k] for k in batch_keys}
        try:
            client.update(path, batch)
            stats.patches += 1
            stats.keys_written += len(batch_keys)
            i += len(batch_keys)  # R6: advancing the slice IS the anti-join
            successes += 1
            if successes >= GROWTH_AFTER:  # R4 growth
                ipp = min(max_batch, int(ipp * GROWTH_FACTOR) or 1)
                successes = 0
        except Exception:
            successes = 0
            if ipp > MIN_BATCH:  # R4 backoff
                ipp = max(MIN_BATCH, ipp // 2)
                stats.halvings += 1
                continue
            # R5: single key still failing — descend one level
            key = batch_keys[0]
            value = data[key]
            if isinstance(value, dict) and value:
                stats.splits += 1
                child = (path.rstrip("/") or "") + "/" + key
                _write_path(client, child, value, stats, max_batch)
                i += 1
            else:
                raise


def _drain_rows(client, rows: Iterator, max_batch: int) -> WritebackStats:
    """Write an ordered stream of tree rows: batch contiguous same-path
    rows, AIMD-write each path's bucket."""
    stats = WritebackStats()
    cur_path: str | None = None
    bucket: dict = {}

    def flush() -> None:
        if cur_path is not None and bucket:
            _write_path(client, cur_path, dict(bucket), stats, max_batch)
            bucket.clear()

    for row in rows:
        if row.path != cur_path:
            flush()
            cur_path = row.path
        bucket[row.key] = json.loads(row.value_json)
    flush()
    return stats


def writeback(
    tree: DataFrame,
    client_factory: Callable[[], object],
    *,
    max_batch: int = MAX_BATCH,
    driver_side: bool = False,
) -> WritebackStats | None:
    """Replay tree rows (path, key, value_json) through merge-PATCH
    updates.  Rows are repartitioned by path (one path → one task) and
    sorted by (depth, path) within tasks for ancestor-before-descendant
    order; each task batches contiguous same-path rows and runs the
    AIMD writer.

    driver_side=True collects through toLocalIterator and writes from
    the driver — the reference's sequential restore shape
    (src/RestoreProcessor.php:62-67), for small trees, tests, and
    clients whose state must stay in-process.  Returns stats in that
    mode (executor stats aren't shipped back in distributed mode)."""
    ordered = tree.repartition(F.col("path")).sortWithinPartitions(
        "depth", "path", "key"
    )
    if driver_side:
        client = client_factory()
        return _drain_rows(client, ordered.toLocalIterator(), max_batch)

    def write_partition(rows: Iterator) -> None:
        _drain_rows(client_factory(), rows, max_batch)

    ordered.foreachPartition(write_partition)
    return None


class JsonlAuditClient:
    """Op-log client: records every merge-PATCH as a JSON line in a
    per-process file instead of sending it — for audits, dry-runs, and
    testing the executor-side writeback path.  Replaying the log against
    a real client reproduces the writeback (operations on distinct paths
    commute; same-path operations stay ordered within one file because
    one path maps to one task)."""

    def __init__(self, log_dir: str) -> None:
        self.log_dir = log_dir

    def update(self, path: str, data: dict) -> None:
        import os
        import uuid

        fn = os.path.join(
            self.log_dir, f"ops-{os.getpid()}-{uuid.uuid4().hex[:8]}.jsonl"
        )
        with open(fn, "a") as f:
            f.write(json.dumps({"path": path, "data": data}) + "\n")


def restore_snapshot(
    spark,
    snapshot_dir: str,
    client_factory: Callable[[], object],
    *,
    max_batch: int = MAX_BATCH,
) -> None:
    """End-to-end restore: snapshot directory → tree DF → writeback.
    The Spark twin of `frdbackup import` (src/RestoreProcessor.php:56-68)."""
    from firebase_realtime_database_backup_spark.sinks.snapshot import read_snapshot

    writeback(read_snapshot(spark, snapshot_dir), client_factory, max_batch=max_batch)
