"""Sinks + store lifecycle (reference operators O13-O17).

The reference's KV store persists every stage as pretty-printed JSON in
directory-per-category layout (``scripts/kv_store_server.py:148-190``),
merges reducer outputs into one key-sorted JSON file
(``:246-277``), serves point lookups by (category, key) (``:197-244``)
and deletes everything on ``cleanup`` (``:279-304``). Spark equivalents:

- fidelity sink: globally sorted single JSON file (``coalesce(1)`` — ONLY
  for this byte-parity mode; the native sink is partitioned parquet);
- native sink: parquet partitioned by a column, which turns the
  reference's accidental "storage-side filter" into real partition pruning;
- point lookup: predicate-pushdown read, not a server-side scan;
- cleanup: recursive delete of the store directory.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_sorted_single_json(df: DataFrame, path: str, sort_col: str) -> None:
    """Reference-fidelity final sink: one globally key-sorted JSON file
    (mirrors ``final-output-{op}.json``, sort at ``kv_store_server.py:267``).

    ``coalesce(1)`` funnels through one task — acceptable ONLY because the
    merged final output is small by construction (post-aggregation); never
    use this shape for fact-table writes at scale.
    """
    df.orderBy(sort_col).coalesce(1).write.mode("overwrite").json(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str] | None = None
) -> None:
    """Native analytics sink: parquet, optionally hive-partitioned so
    downstream filters on the partition columns prune at plan time (the
    scalable version of the reference's per-first-letter reducer files,
    ``scripts/reducer.py:27-34``)."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def point_lookup(
    spark: SparkSession, path: str, key_col: str, key: object
) -> DataFrame:
    """Reference ``("get", category, key)`` (O16) / index search (O24):
    read the persisted artifact and filter on the key — the predicate
    reaches the parquet scan (row-group skipping / partition pruning if
    partitioned on ``key_col``)."""
    return spark.read.parquet(path).filter(F.col(key_col) == F.lit(key))


def cleanup_store(path: str) -> None:
    """Reference ``("cleanup", "all")`` (O17): drop the whole store dir."""
    if os.path.isdir(path):
        shutil.rmtree(path)


def upsert_snapshot(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    version_col: str,
    seq_col: str | None = None,
) -> DataFrame:
    """CDC-style keep-latest merge without a table format: union base and
    updates, keep the highest-``version_col`` row per ``key`` (update
    rows win version ties — the upsert contract). The write side pairs
    with ``write_partitioned``; with a lakehouse format (Delta/Iceberg)
    this becomes MERGE INTO, but the logical plan is the same.

    Tie policy: version desc, then update-over-base, then ``seq_col``
    desc when the caller has a source sequence/offset column, and as the
    final resort a deterministic hash of the full row. Without that last
    term two UPDATE rows carrying the same (key, version) — possible
    inside one CDC micro-batch — would tie in the window and
    ``row_number`` would pick an ARBITRARY winner, so a replayed/retried
    batch could produce a different snapshot; the hash makes the winner
    stable across retries (which row wins among true duplicates is
    unspecified but fixed).

    One shuffle on the key; at 100 TB you partition the snapshot on a
    stable key prefix so the rewrite touches only affected partitions.
    """
    tagged_base = base.withColumn("_upd", F.lit(0))
    tagged_upd = updates.withColumn("_upd", F.lit(1))
    order = [F.desc(version_col), F.desc("_upd")]
    if seq_col is not None:
        order.append(F.desc(seq_col))
    order.append(F.desc(F.xxhash64(*[F.col(c) for c in updates.columns])))
    w = Window.partitionBy(key).orderBy(*order)
    return (
        tagged_base.unionByName(tagged_upd)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_upd")
    )


def dataset_stats(spark: SparkSession, path: str) -> dict:
    """Physical stats of a parquet dataset via the Hadoop FileSystem API
    (works for any scheme Spark reads): file count, total bytes, row
    count — the numbers a compaction policy (``compact_parquet``) and a
    capacity dashboard need."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    summary = fs.getContentSummary(p)
    return {
        "files": int(summary.getFileCount()),
        "bytes": int(summary.getLength()),
        "rows": spark.read.parquet(path).count(),
    }
