"""The `tree` relation: Spark-native normalization of a Firebase-style
JSON tree (SURVEY.md §1.3).

    tree(path: string, key: string, value_json: string, depth: int)

One row per (parent path, child key) — exactly the unit the reference
pages over REST (src/BackupProcessor.php:150-200).  `value_json` holds
the child's whole subtree as canonical JSON (sorted keys), so a row can
be a scalar leaf or a nested subtree; `flatten_level` peels one level,
`flatten_full` iterates to fixpoint (driver-side loop, executor-side
work — Spark schemas are static, unbounded-depth trees are not, so depth
is unrolled iteratively per SURVEY.md §7.4).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from firebase_realtime_database_backup_spark.catalog import read_table
from firebase_realtime_database_backup_spark.registry import Registry

REG = Registry()

TREE_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("key", StringType(), False),
        StructField("value_json", StringType(), False),
        StructField("depth", IntegerType(), False),
    ]
)


def canonical_json(value: Any) -> str:
    """Deterministic JSON encoding (sorted keys, no whitespace)."""
    return json.dumps(value, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


def child_path(path: str, key: str) -> str:
    """Append a child key — the reference's `$path.'/'.$childKey`
    (src/BackupProcessor.php:115)."""
    return (path.rstrip("/") or "") + "/" + key


def path_depth(path: str) -> int:
    return 0 if path in ("", "/") else path.rstrip("/").count("/")


def rows_from_dict(d: dict, path: str = "/") -> list[tuple[str, str, str, int]]:
    """Fully-flattened tree rows for a nested dict: one row per node
    (maps included, encoded as their canonical JSON).  Test/reference
    fixture helper — the extractor produces page-grained rows instead."""
    out: list[tuple[str, str, str, int]] = []
    depth = path_depth(path) + 1
    for key in sorted(d):
        value = d[key]
        out.append((path, key, canonical_json(value), depth))
        if isinstance(value, dict) and value:
            out.extend(rows_from_dict(value, child_path(path, key)))
    return out


def tree_from_dict(spark: SparkSession, d: dict) -> DataFrame:
    """Materialize a nested dict as a fully-flattened tree DataFrame."""
    return spark.createDataFrame(rows_from_dict(d), TREE_SCHEMA)


def leaves(tree: DataFrame) -> DataFrame:
    """Rows whose value is a JSON scalar or empty container (no children
    of their own).  A leaf-only tree losslessly reconstructs the dict."""
    is_container = F.col("value_json").startswith("{") & (F.col("value_json") != "{}")
    return tree.filter(~is_container)


def subtree(tree: DataFrame, prefix: str) -> DataFrame:
    """All rows under a path prefix (the prefix row itself included)."""
    prefix = prefix.rstrip("/") or "/"
    return tree.filter(
        (F.col("path") == prefix)
        | F.col("path").startswith(prefix + "/")
        | (F.lit(prefix) == "/")
    )


def flatten_level(tree: DataFrame) -> DataFrame:
    """Peel one nesting level: rows with map values explode into their
    children; everything else passes through.  The relational analog of
    the reference's go-deeper descent (src/BackupProcessor.php:114-123),
    as pure Catalyst (from_json + explode) — no Python in the row path."""
    is_map = F.col("value_json").startswith("{") & (F.col("value_json") != "{}")
    passthrough = tree.filter(~is_map)
    exploded = (
        tree.filter(is_map)
        .select(
            F.concat(
                F.when(F.col("path") == "/", "").otherwise(F.col("path")),
                F.lit("/"),
                F.col("key"),
            ).alias("path"),
            F.explode(
                F.from_json(F.col("value_json"), "map<string,string>")
            ).alias("key", "value_json"),
            (F.col("depth") + 1).alias("depth"),
        )
        .select("path", "key", "value_json", "depth")
    )
    return passthrough.unionByName(exploded)


def flatten_full(tree: DataFrame, max_depth: int = 64) -> DataFrame:
    """Iterate flatten_level to fixpoint (bounded driver loop; each
    iteration is one distributed pass)."""
    is_map = F.col("value_json").startswith("{") & (F.col("value_json") != "{}")
    out = tree
    for _ in range(max_depth):
        if out.filter(is_map).limit(1).count() == 0:
            break
        out = flatten_level(out)
    return out


def tree_to_dict(tree: DataFrame) -> dict:
    """Driver-side reassembly of the nested dict (test/roundtrip helper —
    collects; never use on production-scale trees)."""
    root: dict = {}
    rows = [r for r in tree.collect()]
    rows.sort(key=lambda r: (r.depth, r.path, r.key))
    seen_paths = {r.path for r in rows}
    for r in rows:
        node = root
        if r.path not in ("", "/"):
            for seg in r.path.strip("/").split("/"):
                node = node.setdefault(seg, {})
        parsed = json.loads(r.value_json)
        if isinstance(parsed, dict) and child_path(r.path, r.key) in seen_paths:
            # children rows exist; let them fill the subtree
            node.setdefault(r.key, {})
        else:
            node[r.key] = parsed
    return root


# ---------------------------------------------------------------------------
# Registry query: normalize events.props into the tree relation
# ---------------------------------------------------------------------------

@REG.query(
    "tree_normalize_events",
    oracle="""
    SELECT CONCAT('/events/', CAST(event_id AS VARCHAR)) AS path,
           k AS key,
           JSON_EXTRACT_STRING(props, '$.' || k) AS value_json,
           2 AS depth
    FROM events, UNNEST(CAST(JSON_KEYS(props) AS VARCHAR[])) AS t(k)
    WHERE event_id <= 500
    """,
)
def tree_normalize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.props JSON objects → tree rows (path, key, value_json,
    depth): the tree-relation normalization applied to a real table.
    Catalyst explode(from_json) — the same op flatten_level uses."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("event_id") <= 500)
    return ev.select(
        F.concat(F.lit("/events/"), F.col("event_id").cast("string")).alias("path"),
        F.explode(F.from_json("props", "map<string,string>")).alias("key", "value_json"),
        F.lit(2).alias("depth"),
    )
