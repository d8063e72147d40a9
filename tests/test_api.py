"""Facade + CLI: export -> restore end-to-end equals identity, and the
naming/option semantics match the reference (sanitizer, URL template,
confirmation guard)."""

import json

from firebase_realtime_database_backup_spark.api import (
    default_backup_name,
    do_backup,
    do_restore,
    main,
    project_url,
    sanitize_name,
)
from firebase_realtime_database_backup_spark.sources.firebase import FakeFirebase

TREE = {
    "users": {"u1": {"name": "ada", "age": 36}, "u2": {"name": "lin"}},
    "cfg": {"dark": True, "limits": {"qps": 10}},
    "motd": "hello",
}


def test_sanitizer_matches_reference_regex():
    assert sanitize_name("my proj/2024:v1.0") == "my-proj-2024-v1-0"
    assert project_url("demo") == "https://demo.firebaseio.com"
    assert default_backup_name("p!d").startswith("p-d-")


def test_backup_restore_identity(spark, tmp_path):
    out = str(tmp_path / "snap")
    do_backup(spark, FakeFirebase(json.loads(json.dumps(TREE))), out)
    target = FakeFirebase({})
    do_restore(spark, out, lambda: target, driver_side=True)
    assert target.tree == TREE


def test_cli_export_offline(spark, tmp_path, capsys):
    src = tmp_path / "tree.json"
    src.write_text(json.dumps(TREE))
    out = str(tmp_path / "cli_snap")
    rc = main([
        "export", "-p", "demo", "--tree-json", str(src), "--output_dir", out,
    ])
    assert rc == 0
    assert "exported" in capsys.readouterr().out


def test_cli_import_requires_confirmation(spark, tmp_path, monkeypatch, capsys):
    src = tmp_path / "tree.json"
    src.write_text(json.dumps(TREE))
    out = str(tmp_path / "cli_snap2")
    main(["export", "-p", "demo", "--tree-json", str(src), "--output_dir", out])
    monkeypatch.setattr("builtins.input", lambda: "no")
    rc = main(["import", "-p", "demo", "--tree-json", str(src),
               "--backup_dir", out])
    assert rc == 1 and "aborted" in capsys.readouterr().out
    rc = main(["import", "-p", "demo", "--tree-json", str(src),
               "--backup_dir", out, "--yes"])
    assert rc == 0


def test_cli_diff_incremental(spark, tmp_path, capsys):
    v1 = dict(TREE)
    v2 = json.loads(json.dumps(TREE))
    v2["motd"] = "changed!"
    v2["extra"] = {"k": 1}
    src1 = tmp_path / "v1.json"; src1.write_text(json.dumps(v1))
    src2 = tmp_path / "v2.json"; src2.write_text(json.dumps(v2))
    snap = str(tmp_path / "snap_v1")
    delta = str(tmp_path / "delta_v2")
    assert main(["export", "-p", "demo", "--tree-json", str(src1),
                 "--output_dir", snap]) == 0
    assert main(["diff", "-p", "demo", "--tree-json", str(src2),
                 "--prev_dir", snap, "--output_dir", delta]) == 0
    out = capsys.readouterr().out
    assert "delta written" in out and "+" in out
    from firebase_realtime_database_backup_spark.sinks.incremental import (
        restore_to_version,
    )
    from firebase_realtime_database_backup_spark.sources.tree import (
        tree_from_dict,
        tree_to_dict,
    )
    restored = restore_to_version(spark, snap, [delta])
    assert tree_to_dict(restored) == v2


def test_cli_query_list_run_explain(spark, capsys):
    # list: every registered query with its check tier
    assert main(["query"]) == 0
    out = capsys.readouterr().out
    assert "flagship_revenue  [oracle]" in out
    assert "dedup_minhash_ml  [rows-only]" in out
    # run: rows printed
    assert main(["query", "tpch_q6_forecast",
                 "--sf_dir", "/root/testdata/sf0.001"]) == 0
    out = capsys.readouterr().out
    assert "revenue" in out and "n_items" in out
    # explain: physical plan, not rows
    assert main(["query", "tpch_q6_forecast", "--explain",
                 "--sf_dir", "/root/testdata/sf0.001"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "Scan parquet" in out
    # unknown name: error exit, helpful message
    assert main(["query", "definitely_not_a_query"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_cli_export_archive_then_import_from_archive(spark, tmp_path, capsys):
    """--archive packs the snapshot as <out>.tar.gz (S11) and import
    accepts the archive path directly (R1), restoring identity."""
    src = tmp_path / "tree.json"
    src.write_text(json.dumps(TREE))
    out = str(tmp_path / "cli_snap3")
    rc = main(["export", "-p", "demo", "--tree-json", str(src),
               "--output_dir", out, "--archive"])
    assert rc == 0
    assert "archived to" in capsys.readouterr().out
    import os
    assert os.path.exists(out + ".tar.gz")

    empty = tmp_path / "empty.json"
    empty.write_text("{}")
    rc = main(["import", "-p", "demo", "--tree-json", str(empty),
               "--backup_dir", out + ".tar.gz", "--yes"])
    assert rc == 0


def test_read_table_normalizes_ntz_timestamps(spark, tmp_path, monkeypatch):
    """Parquet written without UTC adjustment reads back TIMESTAMP_NTZ;
    read_table must normalize every such column to TimestampType (the
    strict-typed time functions reject NTZ and NTZ/LTZ unions don't
    coerce).  Regression: the driver regenerated testdata with NTZ
    timestamps mid-round and unix_millis(ts) started failing."""
    import os

    from pyspark.sql import functions as F

    from firebase_realtime_database_backup_spark import catalog

    sf_dir = str(tmp_path)
    spark.sql(
        "SELECT CAST(1 AS BIGINT) AS event_id,"
        " TIMESTAMP_NTZ '2024-01-01 00:00:07' AS ts,"
        " CAST(8 AS BIGINT) AS user_id, 'click' AS event_type,"
        " CAST(1.5 AS DOUBLE) AS value, '{}' AS props"
    ).write.mode("overwrite").parquet(os.path.join(sf_dir, "events.parquet"))

    df = catalog.read_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # wall-clock preserved under the UTC session timezone
    row = df.select(F.unix_millis("ts").alias("ms")).first()
    assert row.ms == 1704067207000
