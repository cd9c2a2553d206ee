from gcp_map_reduce_spark.streaming.file_trigger import (
    run_file_trigger_wordcount,
    run_incremental_event_counts,
    run_sliding_event_counts,
    run_stream_static_enrich,
    run_stream_stream_join,
    run_streaming_dedup,
    run_streaming_upsert,
)
from gcp_map_reduce_spark.streaming.curated import (
    run_streaming_curated_corpus,
)
from gcp_map_reduce_spark.streaming.ann_index_stream import (
    run_streaming_index_maintenance,
    run_streaming_index_takedowns,
)
from gcp_map_reduce_spark.streaming.embedding_near_dup import (
    run_streaming_embedding_near_dup,
)
from gcp_map_reduce_spark.streaming.near_dup import (
    compact_signature_store,
    run_streaming_near_dup_dedup,
)
from gcp_map_reduce_spark.streaming.stateful import run_stateful_sessionize

__all__ = [
    "run_file_trigger_wordcount",
    "run_incremental_event_counts",
    "run_sliding_event_counts",
    "run_stateful_sessionize",
    "run_stream_static_enrich",
    "run_stream_stream_join",
    "run_streaming_dedup",
    "compact_signature_store",
    "run_streaming_curated_corpus",
    "run_streaming_embedding_near_dup",
    "run_streaming_index_maintenance",
    "run_streaming_index_takedowns",
    "run_streaming_near_dup_dedup",
    "run_streaming_upsert",
]
