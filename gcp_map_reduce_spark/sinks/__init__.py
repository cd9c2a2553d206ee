from gcp_map_reduce_spark.sinks.writers import (
    cleanup_store,
    point_lookup,
    write_partitioned,
    write_sorted_single_json,
)

__all__ = [
    "cleanup_store",
    "point_lookup",
    "write_partitioned",
    "write_sorted_single_json",
]
