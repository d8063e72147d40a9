"""Snapshot sink: partitioned parquet + manifest — the Spark form of the
reference's chunk-file / metadata.json / tar.gz pipeline (S9-S11).

Mapping (SURVEY.md §2.A):
- chunk files  `<md5(uniqid)>.json`  (src/BackupProcessor.php:202-223)
      → parquet part-files written by tasks (naming, atomicity, and
        retry-safe commit come from Spark's commit protocol for free)
- metadata.json path→chunks manifest (src/BackupProcessor.php:49-51)
      → an explicit manifest DataFrame path → row_count/part-files,
        written next to the data (parquet footers + directory listing
        already cover rediscovery; the manifest keeps the reference's
        restore contract auditable)
- tar.gz archive (src/BackupProcessor.php:225-242)
      → a directory convention + codec option; at 100 TB a single tar
        stream is precisely the bottleneck to avoid — a snapshot IS a
        directory of independently-written compressed columnar files

Partitioning: by `top` (first path segment).  Top-level subtrees are the
reference's unit of descent and our unit of extract parallelism, so they
are also the pruning key: restoring or querying one subtree reads one
partition directory, nothing else.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firebase_realtime_database_backup_spark.sources.tree import TREE_SCHEMA

MANIFEST_DIR = "_manifest"
DATA_DIR = "tree"


def _with_top(tree: DataFrame) -> DataFrame:
    top = F.when(F.col("path") == "/", F.col("key")).otherwise(
        F.split(F.col("path"), "/").getItem(1)
    )
    return tree.withColumn("top", top)


def write_snapshot(
    tree: DataFrame,
    out_dir: str,
    *,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Write a tree DataFrame as a partitioned parquet snapshot plus a
    path-level manifest.  `mode='overwrite'` is the reference's
    reset_backup_dir (src/BackupProcessor.php:55-61)."""
    data_path = os.path.join(out_dir, DATA_DIR)
    (
        _with_top(tree)
        .repartition("top")
        .write.mode(mode)
        .option("compression", compression)
        .partitionBy("top")
        .parquet(data_path)
    )
    spark = tree.sparkSession
    written = spark.read.parquet(data_path)
    manifest = (
        written.withColumn("part_file", F.input_file_name())
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sort_array(F.collect_set("part_file")).alias("part_files"),
        )
    )
    manifest.write.mode(mode).json(os.path.join(out_dir, MANIFEST_DIR))


def read_snapshot(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read a snapshot back as the canonical tree relation (partition
    column dropped; schema restored)."""
    df = spark.read.parquet(os.path.join(out_dir, DATA_DIR))
    return df.select([f.name for f in TREE_SCHEMA.fields])


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.json(os.path.join(out_dir, MANIFEST_DIR))


def archive_snapshot(out_dir: str, archive_path: str | None = None) -> str:
    """Pack a written snapshot directory into one `.tar.gz` — the
    reference's final export artifact (PharData tar + GZ compress,
    src/BackupProcessor.php:225-242).  Driver-side and single-stream by
    nature, so it is an OPTIONAL convenience for parity / small-export
    portability: at 100 TB the snapshot directory itself is the
    artifact (parquet part-files are already independently
    compressed), and a single tar stream is exactly the bottleneck the
    distributed sink avoids."""
    import tarfile

    archive_path = archive_path or out_dir.rstrip("/") + ".tar.gz"
    with tarfile.open(archive_path, "w:gz") as tf:
        tf.add(out_dir, arcname=os.path.basename(out_dir.rstrip("/")))
    return archive_path


def unarchive_snapshot(archive_path: str, dest_dir: str) -> str:
    """Unpack an archived snapshot (the reference's decompressedBackup,
    src/RestoreProcessor.php:45-54) and return the inner snapshot dir."""
    import tarfile

    with tarfile.open(archive_path, "r:gz") as tf:
        names = tf.getnames()
        tf.extractall(dest_dir, filter="data")
    top = sorted({n.split("/", 1)[0] for n in names})
    if len(top) != 1:
        raise ValueError(f"archive holds {len(top)} top-level entries: {top}")
    return os.path.join(dest_dir, top[0])
