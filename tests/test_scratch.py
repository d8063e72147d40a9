"""Content-keyed scratch-table protocol (scratch.py): cross-session
reuse of the persisted shingle/BPE dictionaries, fingerprint staleness,
atomic-publish race behavior, and the GC sweep's grace rules.

These pin VERDICT r7's top next-round item: the dictionary build must
be paid once per CORPUS VERSION, not once per session, and dead copies
must be collected instead of accreting (the 3.8 GB .scratch leak)."""

import json
import os
import time

import pytest

from firebase_realtime_database_backup_spark import scratch
from firebase_realtime_database_backup_spark.scratch import (
    MARKER,
    corpus_fingerprint,
    is_published,
    publish_table,
    sweep_scratch,
    table_path,
)

SF = "/root/testdata/sf0.01"


def _marker_mtime(path: str) -> float:
    return os.stat(os.path.join(path, MARKER)).st_mtime


def test_shingle_table_survives_sessions(spark):
    """A FRESH session (simulated by clearing every in-process memo —
    the only state a new python process would lack) must resolve to the
    already-published table and reuse it WITHOUT rebuilding: the
    content key is pure filesystem, so any session seeing the same
    corpus bytes computes the same path.  Also pins path-spelling
    normalization: a trailing-slash corpus spelling must reuse the same
    table and the same cached relation (ADVICE r7)."""
    from firebase_realtime_database_backup_spark.operators import text

    path = text.ensure_shingle_table(spark, SF)
    assert is_published(path)
    before = _marker_mtime(path)

    text._SHINGLE_TABLES.clear()
    text._DSHINGLE_CACHE.clear()
    again = text.ensure_shingle_table(spark, SF)
    assert again == path, "new session rebuilt instead of reusing"
    assert _marker_mtime(path) == before, "table was rewritten"

    # Two spellings of one corpus dir -> one table, one cached relation.
    df1 = text.doc_shingle_ids(spark, SF)
    df2 = text.doc_shingle_ids(spark, SF + "/")
    assert df2 is df1
    assert text.ensure_shingle_table(spark, SF + "/") == path


def test_bpe_table_survives_sessions(spark):
    """Same cross-session contract for the trained BPE merge table —
    training (the 6-round driver-argmax loop) is paid once per corpus
    version across all sessions."""
    from firebase_realtime_database_backup_spark.operators import text

    path = text.ensure_bpe_table(spark, SF)
    assert is_published(path)
    before = _marker_mtime(path)
    text._BPE_TABLES.clear()
    assert text.ensure_bpe_table(spark, SF) == path
    assert _marker_mtime(path) == before, "merge table was retrained"


def test_ivfpq_index_survives_sessions(spark):
    """The persisted IVF x PQ code table must also ride the content
    key: a fresh session re-derives only the bounded driver state
    (deterministic centroid/codebook training) and reuses the
    corpus-scale encode without rewriting it."""
    from firebase_realtime_database_backup_spark.operators import similarity

    idx = similarity.ensure_ivfpq_index(spark, SF)
    assert idx is not None and is_published(idx[0])
    before = _marker_mtime(idx[0])
    similarity._IVFPQ_INDEXES.clear()
    again = similarity.ensure_ivfpq_index(spark, SF)
    assert again[0] == idx[0], "new session re-encoded instead of reusing"
    assert _marker_mtime(idx[0]) == before, "index was rewritten"


def test_fingerprint_tracks_corpus_version(tmp_path, monkeypatch):
    """The fingerprint must change when a dependency table's bytes
    change (rebuilt scale corpora get a FRESH table, never a stale
    hit) and must be insensitive to path spelling."""
    monkeypatch.setattr(scratch, "scratch_root", lambda: str(tmp_path))
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    doc = corpus / "documents.parquet"
    doc.write_bytes(b"v1")

    fp1 = corpus_fingerprint(str(corpus))
    assert corpus_fingerprint(str(corpus) + "/") == fp1

    # Same size, newer mtime -> new version (make-style staleness).
    doc.write_bytes(b"v2")
    os.utime(doc, ns=(doc.stat().st_mtime_ns + 10**9,) * 2)
    fp2 = corpus_fingerprint(str(corpus))
    assert fp2 != fp1
    assert table_path("shingle_table", str(corpus), fp2) != table_path(
        "shingle_table", str(corpus), fp1
    )


def test_publish_is_write_once_and_race_safe(tmp_path, monkeypatch):
    """Second publish for the same (kind, corpus version) must not
    invoke the builder; a concurrent-winner race (final dir appears
    between the is_published check and the rename) must leave the
    loser reading the winner's table with its tmp dir discarded."""
    monkeypatch.setattr(scratch, "scratch_root", lambda: str(tmp_path))
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "documents.parquet").write_bytes(b"v1")

    calls = []

    def build(tmp):
        calls.append(tmp)
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, "part-0"), "w") as fh:
            fh.write("data")

    p1 = publish_table("shingle_table", str(corpus), ("documents",), build)
    assert is_published(p1) and len(calls) == 1
    p2 = publish_table("shingle_table", str(corpus), ("documents",), build)
    assert p2 == p1 and len(calls) == 1, "builder re-ran on a published table"

    # Race: winner publishes while loser is mid-build.
    fp = corpus_fingerprint(str(corpus))
    final = table_path("bpe_table", str(corpus), fp)

    def racing_build(tmp):
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, "part-0"), "w") as fh:
            fh.write("loser")
        # Winner lands first.
        os.makedirs(final)
        with open(os.path.join(final, "part-0"), "w") as fh:
            fh.write("winner")
        with open(os.path.join(final, MARKER), "w") as fh:
            json.dump({"fingerprint": fp}, fh)

    p3 = publish_table("bpe_table", str(corpus), ("documents",), racing_build)
    assert p3 == final
    with open(os.path.join(final, "part-0")) as fh:
        assert fh.read() == "winner"
    leftovers = [n for n in os.listdir(tmp_path) if ".tmp-" in n]
    assert leftovers == [], "loser's tmp dir leaked"


def test_sweep_grace_and_families(tmp_path, monkeypatch):
    """The sweep collects exactly: orphaned tmp dirs past grace, stale
    content-keyed tables past grace (corpus gone or fingerprint moved),
    and legacy marker-less session-keyed dirs past the long grace.  It
    never touches fresh tables, young tmp dirs, or foreign dirs."""
    monkeypatch.setattr(scratch, "scratch_root", lambda: str(tmp_path))
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "documents.parquet").write_bytes(b"v1")

    def build(tmp):
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, "part-0"), "w") as fh:
            fh.write("data")

    live = publish_table("shingle_table", str(corpus), ("documents",), build)

    # Stale: published against a corpus that no longer exists.
    gone = tmp_path / "gone_corpus"
    gone.mkdir()
    (gone / "documents.parquet").write_bytes(b"x")
    stale = publish_table("bpe_table", str(gone), ("documents",), build)
    import shutil

    shutil.rmtree(gone)

    legacy = tmp_path / "bpe_table_sf0.01_0123456789ab"
    legacy.mkdir()
    orphan_tmp = tmp_path / "shingle_table_sf_deadbeef.tmp-1-abc"
    orphan_tmp.mkdir()
    foreign = tmp_path / "users_notes"
    foreign.mkdir()

    now = time.time()
    # Within every grace: nothing happens.
    assert sweep_scratch(now=now) == []
    # Past the short grace: orphan tmp + stale table go; legacy stays.
    removed = set(sweep_scratch(now=now + scratch.STALE_GRACE_SEC + 5))
    assert removed == {str(stale), str(orphan_tmp)}
    # Past the long grace: legacy goes; live + foreign always stay.
    removed = set(sweep_scratch(now=now + scratch.LEGACY_GRACE_SEC + 5))
    assert removed == {str(legacy)}
    assert os.path.isdir(live) and foreign.is_dir()


def test_marker_is_invisible_to_spark_reads(spark):
    """_FINGERPRINT sits inside the parquet directory; Spark must treat
    it like _SUCCESS (underscore-prefixed = not data) — the persisted
    dictionary read-back must not try to parse it."""
    from firebase_realtime_database_backup_spark.operators import text

    path = text.ensure_shingle_table(spark, SF)
    assert os.path.isfile(os.path.join(path, MARKER))
    n = spark.read.parquet(path).count()
    assert n > 0
