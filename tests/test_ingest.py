"""JSONL / CSV ingest roundtrips: parquet -> text format -> DataFrame
must be lossless (exceptAll empty both directions), the same identity
invariant the reference's chunk-spill/restore cycle maintains."""

from pyspark.sql import functions as F

from firebase_realtime_database_backup_spark.catalog import read_table
from firebase_realtime_database_backup_spark.sources.ingest import (
    read_csv,
    read_jsonl,
    read_orc,
    write_csv,
    write_jsonl,
    write_orc,
)

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string"


def _assert_same(a, b):
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_jsonl_roundtrip(spark, tmp_path):
    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang", "source"
    )
    d = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, d)
    back = read_jsonl(spark, d, DOCS_SCHEMA).select(*docs.columns)
    _assert_same(docs, back)


def test_jsonl_schema_inference(spark, tmp_path):
    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang"
    )
    d = str(tmp_path / "docs_jsonl_infer")
    write_jsonl(docs, d)
    back = read_jsonl(spark, d)
    assert dict(back.dtypes) == {"doc_id": "bigint", "lang": "string"}
    assert back.count() == docs.count()


def test_csv_roundtrip(spark, tmp_path):
    orders = read_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    d = str(tmp_path / "orders_csv")
    write_csv(orders, d)
    back = read_csv(
        spark,
        d,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double",
    ).select(*orders.columns)
    _assert_same(orders, back)


def test_orc_roundtrip(spark, tmp_path):
    """ORC keeps full types (timestamps, doubles) without the text-format
    casting dance — roundtrip must be exactly lossless on orders."""
    orders = read_table(spark, "/root/testdata/sf0.001", "orders")
    d = str(tmp_path / "orders_orc")
    write_orc(orders, d)
    back = read_orc(spark, d).select(*orders.columns)
    _assert_same(orders, back)


def test_jsonl_quarantine_routes_malformed_lines(spark, tmp_path):
    """read_jsonl_quarantine must split a mixed file into parsed rows
    and raw quarantined lines with nothing dropped: good + bad == input
    lines, bad carries the verbatim offending text."""
    import os

    from firebase_realtime_database_backup_spark.sources.ingest import (
        read_jsonl_quarantine,
    )

    p = str(tmp_path / "mixed.jsonl")
    lines = [
        '{"id": 1, "name": "ok"}',
        '{"id": 2 "name": "missing-comma"}',
        '{"id": 3, "name": "fine"}',
        "not json at all",
        '{"id": "4", "name": "wrong-type-but-castable"}',
    ]
    with open(p, "w") as fh:
        fh.write("\n".join(lines) + "\n")

    good, bad = read_jsonl_quarantine(spark, p, "id BIGINT, name STRING")
    good_rows = {(r.id, r.name) for r in good.collect()}
    bad_rows = [r.raw_line for r in bad.collect()]

    # id "4" is a JSON string: under the declared BIGINT it does not
    # parse as a typed row -> quarantined, not silently nulled
    assert good_rows == {(1, "ok"), (3, "fine")}
    assert sorted(bad_rows) == sorted(
        [lines[1], lines[3], lines[4]]
    )
    assert good.count() + bad.count() == len(lines)
