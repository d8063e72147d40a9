"""Tree-relation tests: flatten, subtree, leaves, dict roundtrip."""

import json

from pyspark.sql import functions as F

from firebase_realtime_database_backup_spark.sources.tree import (
    flatten_full,
    flatten_level,
    leaves,
    rows_from_dict,
    subtree,
    tree_from_dict,
    tree_to_dict,
)

NESTED = {
    "a": {"x": 1, "y": {"deep": "v"}},
    "b": "leaf",
    "c": {"only": {"chain": {"end": 9}}},
}


def test_tree_from_dict_roundtrip(spark):
    df = tree_from_dict(spark, NESTED)
    assert tree_to_dict(df) == NESTED


def test_rows_one_per_node(spark):
    rows = rows_from_dict(NESTED)
    # nodes: a, a/x, a/y, a/y/deep, b, c, c/only, c/only/chain, c/only/chain/end
    assert len(rows) == 9
    assert all(r[3] == r[0].rstrip("/").count("/") + 1 or r[0] == "/" for r in rows)


def test_flatten_level_peels_one_level(spark):
    # page-grained single row holding the whole subtree
    row = [("/", "a", json.dumps({"x": "1", "y": "2"}), 1)]
    df = spark.createDataFrame(row, "path string, key string, value_json string, depth int")
    out = flatten_level(df).collect()
    got = {(r.path, r.key, r.value_json, r.depth) for r in out}
    assert got == {("/a", "x", "1", 2), ("/a", "y", "2", 2)}


def test_flatten_full_reaches_fixpoint(spark):
    deep = {"a": {"b": {"c": {"d": "leaf"}}}}
    df = spark.createDataFrame(
        [("/", "a", json.dumps(deep["a"]), 1)],
        "path string, key string, value_json string, depth int",
    )
    out = flatten_full(df)
    rows = {(r.path, r.key, r.value_json) for r in out.collect()}
    assert ("/a/b/c", "d", '"leaf"') in rows or ("/a/b/c", "d", "leaf") in rows
    # no map-valued rows remain
    assert (
        out.filter(
            F.col("value_json").startswith("{") & (F.col("value_json") != "{}")
        ).count()
        == 0
    )


def test_subtree_filter(spark):
    df = tree_from_dict(spark, NESTED)
    sub = subtree(df, "/a")
    assert {r.path for r in sub.collect()} == {"/a", "/a/y"}


def test_leaves_only_scalars(spark):
    df = tree_from_dict(spark, NESTED)
    lv = leaves(df)
    vals = {r.value_json for r in lv.collect()}
    assert '"leaf"' in vals and "1" in vals
    assert not any(v.startswith("{") and v != "{}" for v in vals)
