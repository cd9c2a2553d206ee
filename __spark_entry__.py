"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``gcp_map_reduce_spark`` package; this module
is glue only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gcp_map_reduce_spark.plans import registry


def _catalog() -> None:
    registry.load_catalog()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (wordcount — the reference's headline operation) on
    /root/testdata/sf0.001."""
    _catalog()
    return registry.QUERIES["wordcount"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    _catalog()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    _catalog()
    return dict(registry.ORACLES)
