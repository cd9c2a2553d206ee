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

from pyspark.sql import DataFrame, SparkSession
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
