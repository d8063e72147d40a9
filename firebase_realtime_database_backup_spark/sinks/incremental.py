"""Incremental snapshots: tree diff + delta export.

The reference can only export the ENTIRE database every time
(src/BackupProcessor.php:39-53 — no state carried between runs).  At
100 TB that's the difference between an hourly job and an impossible
one, so the engine adds the incremental layer the reference lacks:

- `tree_diff(old, new)`  — row-level diff of two tree relations:
  added / removed / changed(with before+after), one full-outer join on
  (path, key).
- `incremental_backup(...)` — extract, diff against the previous
  snapshot, write ONLY the delta (partitioned like full snapshots) plus
  a summary; `apply_delta` folds a delta onto a base tree to
  reconstruct the current state (base ∖ removed ∖ changed ∪ added ∪
  changed-after) — so full_snapshot + deltas* is a complete,
  verifiable backup chain.

Scale shape: the diff is a single full-outer shuffle join on
(path, key) — both sides hash-partition once; value comparison is a
string equality on the canonical JSON.  Delta application is the same
join shape.  Nothing is collected to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firebase_realtime_database_backup_spark.sinks.snapshot import (
    read_snapshot,
    write_snapshot,
)

#: diff row status values
ADDED, REMOVED, CHANGED = "added", "removed", "changed"


def tree_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(path, key, status, old_value_json, new_value_json, depth):
    row-level difference new vs old — one full-outer join, no driver
    state."""
    o = old.select(
        "path", "key",
        F.col("value_json").alias("old_value_json"),
        F.col("depth").alias("old_depth"),
    )
    n = new.select(
        "path", "key",
        F.col("value_json").alias("new_value_json"),
        F.col("depth").alias("new_depth"),
    )
    j = o.join(n, ["path", "key"], "full_outer")
    status = (
        F.when(F.col("old_value_json").isNull(), ADDED)
        .when(F.col("new_value_json").isNull(), REMOVED)
        .when(F.col("old_value_json") != F.col("new_value_json"), CHANGED)
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            "path",
            "key",
            "status",
            "old_value_json",
            "new_value_json",
            F.coalesce("new_depth", "old_depth").alias("depth"),
        )
    )


def write_delta(delta: DataFrame, out_dir: str, mode: str = "overwrite") -> None:
    delta.write.mode(mode).parquet(os.path.join(out_dir, "delta"))


def read_delta(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "delta"))


def apply_delta(base: DataFrame, delta: DataFrame) -> DataFrame:
    """base (tree) + delta -> new tree.  Removed/changed rows leave the
    base via an anti join; added/changed rows enter with their new
    values."""
    touched = delta.select("path", "key")
    keep = base.join(touched, ["path", "key"], "left_anti")
    incoming = (
        delta.filter(F.col("status").isin(ADDED, CHANGED))
        .select(
            "path", "key", F.col("new_value_json").alias("value_json"), "depth"
        )
    )
    return keep.unionByName(incoming)


def incremental_backup(
    spark: SparkSession,
    current_tree: DataFrame,
    prev_snapshot_dir: str,
    out_dir: str,
) -> dict:
    """Diff the current tree against the previous snapshot and persist
    only the delta.  Returns counts per status (one aggregation)."""
    prev = read_snapshot(spark, prev_snapshot_dir)
    delta = tree_diff(prev, current_tree)
    write_delta(delta, out_dir)
    counts = {
        r["status"]: r["n"]
        for r in read_delta(spark, out_dir)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return {s: counts.get(s, 0) for s in (ADDED, REMOVED, CHANGED)}


def restore_to_version(
    spark: SparkSession, full_snapshot_dir: str, delta_dirs: list[str]
) -> DataFrame:
    """Replay a backup chain: full snapshot + ordered deltas -> tree."""
    tree = read_snapshot(spark, full_snapshot_dir)
    for d in delta_dirs:
        tree = apply_delta(tree, read_delta(spark, d))
    return tree


#: Sidecar file a checkpoint writes to record WHICH chain it compacted
#: (consumed by expire_chain's provenance latch).
PROVENANCE_FILE = "chain_provenance.json"


def checkpoint_chain(
    spark: SparkSession,
    full_snapshot_dir: str,
    delta_dirs: list[str],
    out_dir: str,
) -> None:
    """Compact a chain back into a new full snapshot (bounded restore
    cost — the chain never grows past the compaction interval).

    Also records the compacted chain's directories in a provenance
    sidecar so retention (expire_chain) can verify it is deleting the
    chain THIS checkpoint supersedes, not an unrelated one."""
    import json

    write_snapshot(restore_to_version(spark, full_snapshot_dir, delta_dirs), out_dir)
    with open(os.path.join(out_dir, PROVENANCE_FILE), "w") as fh:
        json.dump(
            {
                "full_snapshot_dir": os.path.abspath(full_snapshot_dir),
                "delta_dirs": [os.path.abspath(d) for d in delta_dirs],
            },
            fh,
        )


def expire_chain(
    spark: SparkSession,
    checkpoint_dir: str,
    full_snapshot_dir: str,
    delta_dirs: list[str],
) -> list[str]:
    """Retention: delete a chain's old full snapshot and the deltas a
    checkpoint has already compacted — the step that keeps N daily
    incrementals from accumulating forever (write → diff → checkpoint
    → EXPIRE is the full lifecycle).

    Safety latches (ALL must pass before anything is deleted):

    1. Integrity: the checkpoint is readable and its manifest row count
       is positive and equals the checkpoint's actual row count — a
       truncated or half-written checkpoint must never authorize
       destroying the only chain that can reconstruct it.
    2. Provenance: the checkpoint's `chain_provenance.json` (written by
       checkpoint_chain) must name the directories being expired — a
       caller passing the WRONG chain (one this checkpoint never
       compacted, still needed by some other checkpoint) is refused.
       For checkpoints predating the sidecar, fall back to a content
       cross-check: replay the chain and require its diff against the
       checkpoint to be empty (one full-outer join).

    Returns the directories removed.

    Scale note: with provenance present the validation reads one
    manifest JSON, one sidecar JSON, and one count() over the
    checkpoint — O(checkpoint), no chain replay; the deletions are
    filesystem metadata ops.  The no-sidecar fallback replays the
    chain once (retention is rare; correctness beats speed here)."""
    import json
    import shutil

    from firebase_realtime_database_backup_spark.sinks.snapshot import (
        read_manifest,
        read_snapshot,
    )

    manifest_rows = read_manifest(spark, checkpoint_dir).agg(
        F.sum("n_rows")
    ).collect()[0][0]
    if not manifest_rows or manifest_rows <= 0:
        raise ValueError(
            f"checkpoint {checkpoint_dir!r} has an empty/unreadable "
            "manifest; refusing to expire the chain it depends on"
        )
    actual = read_snapshot(spark, checkpoint_dir).count()
    if actual != manifest_rows:
        raise ValueError(
            f"checkpoint {checkpoint_dir!r} row count {actual} != "
            f"manifest {manifest_rows}; refusing to expire the chain"
        )
    prov_path = os.path.join(checkpoint_dir, PROVENANCE_FILE)
    if os.path.isfile(prov_path):
        with open(prov_path) as fh:
            prov = json.load(fh)
        recorded_full = prov.get("full_snapshot_dir")
        recorded_deltas = set(prov.get("delta_dirs", []))
        if os.path.abspath(full_snapshot_dir) != recorded_full:
            raise ValueError(
                f"checkpoint {checkpoint_dir!r} compacted full snapshot "
                f"{recorded_full!r}, not {full_snapshot_dir!r}; refusing "
                "to expire a chain it does not supersede"
            )
        strays = [
            d for d in delta_dirs if os.path.abspath(d) not in recorded_deltas
        ]
        if strays:
            raise ValueError(
                f"checkpoint {checkpoint_dir!r} never compacted delta "
                f"dirs {strays!r}; refusing to expire them"
            )
    else:
        # Pre-provenance checkpoint: prove BY CONTENT that the passed
        # chain reconstructs exactly this checkpoint before deleting it.
        replayed = restore_to_version(spark, full_snapshot_dir, delta_dirs)
        n_diff = tree_diff(replayed, read_snapshot(spark, checkpoint_dir)).count()
        if n_diff:
            raise ValueError(
                f"chain replay differs from checkpoint {checkpoint_dir!r} "
                f"on {n_diff} rows; refusing to expire a chain the "
                "checkpoint does not supersede"
            )
    removed = []
    for d in [full_snapshot_dir, *delta_dirs]:
        if os.path.isdir(d):
            shutil.rmtree(d)
            removed.append(d)
    return removed
