"""SparkSession factory.

The reference's "cluster lifecycle" layer (SURVEY.md §2 O19/O20 —
``master.py:145-205``, ``utils/instance_utils.py``) provisions GCE VMs and
hand-rolls barriers over TCP ACKs. In Spark all of that is the cluster
manager + DAG scheduler; the engine only needs a well-configured session.

Config rationale (100 TB posture, tested on local[32]):
- AQE on: runtime partition coalescing + skew-join splitting replace the
  reference's static letter->reducer partitioning (skew-prone, SURVEY.md §4).
- Arrow on: every pandas-UDF exchange is columnar/batched.
- shuffle.partitions: sized by env for local runs; on a real cluster AQE
  coalesces from a deliberately high initial number.
- session timezone UTC: keeps timestamp semantics aligned with the
  DuckDB oracle (naive timestamps) and parquet files.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "gcp-map-reduce-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark's
        # parquet reader rejects; read as raw long and convert in the source
        # layer (sources/tables.py) — values are whole microseconds.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Scan parallelism: Spark sizes file splits as
        #   min(maxPartitionBytes, max(openCostInBytes, bytes/defaultParallelism))
        # With the 4 MB default openCost, a 15 MB single-file table scans
        # in 4 tasks on local[32] — measured 12.7 s single-task straggler
        # on the sf1 stress set's 1M-row events scan (per-row JSON parse
        # concentrated in one task). 512 KB floors the split size low
        # enough that scan tasks ~ cores for MB-scale files while leaving
        # the 128 MB maxPartitionBytes cap (the right cluster-scale bound)
        # untouched — at 100 TB the bytes/parallelism term dominates and
        # this setting is inert.
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", str(512 * 1024)),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
