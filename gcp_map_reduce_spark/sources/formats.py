"""Format-pluggable IO: parquet / ORC / JSON-lines / CSV / text,
schema-explicit.

The reference has exactly one source (a directory of plain-text files,
``master.py:63-71``) and one sink (pretty JSON, O15). An analytics engine
needs the interchange formats too. Policy, per SURVEY.md §1.5: explicit
schemas everywhere — inference passes are a second full scan at 100 TB
and silently type-drift between runs; only the text-ingest edge (where
the schema IS ``value: string``) infers nothing.

All readers return plain DataFrames so everything composes with the
operator library; CSV/JSON write through the same partitioned layout as
the parquet sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ORC ships with Spark (columnar, self-describing, pushdown-capable —
# the other lakehouse-native format next to parquet); Avro does NOT (the
# spark-avro package is external), so it is deliberately absent rather
# than import-gated half-support.
FORMATS = ("parquet", "orc", "json", "csv", "text")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """Read ``path`` in ``fmt``. For csv/json a schema is REQUIRED (no
    inference scan — see module docstring); parquet/text carry their own.
    CSV expects a header row (written by :func:`write_any`) but trusts
    only the declared schema for names/types.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; supported: {FORMATS}")
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if fmt == "text":
        return spark.read.text(path)
    if schema is None:
        raise ValueError(f"{fmt} requires an explicit schema (no inference)")
    reader = spark.read.schema(schema)
    if fmt == "csv":
        return reader.option("header", True).csv(path)
    return reader.json(path)


def write_any(
    df: DataFrame,
    path: str,
    fmt: str,
    partition_cols: list[str] | None = None,
) -> None:
    """Write ``df`` to ``path`` in ``fmt`` (overwrite), optionally
    hive-partitioned. Complex columns (arrays/structs) are fine for
    parquet/json; CSV rejects them by Spark's own rules — callers
    flatten first."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; supported: {FORMATS}")
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "orc":
        w.orc(path)
    elif fmt == "json":
        w.json(path)
    elif fmt == "csv":
        w.option("header", True).csv(path)
    else:
        w.text(path)
