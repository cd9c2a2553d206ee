from gcp_map_reduce_spark.streaming.file_trigger import (
    run_file_trigger_wordcount,
    run_incremental_event_counts,
)

__all__ = ["run_file_trigger_wordcount", "run_incremental_event_counts"]
