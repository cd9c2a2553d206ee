"""Structured Streaming parity for the reference's FaaS trigger (O23).

The reference's streaming story (report PDF pp. 6-8, no code in repo): a
bucket upload triggers the master Cloud Function, which re-runs the WHOLE
map-reduce job over the corpus — at-file-granularity full recompute, not
incremental. Two modes here:

1. ``run_file_trigger_wordcount`` — faithful semantics: a file-source
   stream watches a directory; ``foreachBatch`` re-runs the batch wordcount
   over everything seen so far and overwrites the output (exactly the
   reference's "every upload recomputes final-output"). Trigger
   ``availableNow`` drains pending files then stops (test/CI friendly);
   pass ``continuous=True`` for an always-on watcher.

2. ``run_incremental_event_counts`` — the idiomatic upgrade: streaming
   aggregation with a watermark; state is per-window partial aggregates,
   late rows beyond the watermark are dropped, output is append-mode —
   this is what you actually run at 100 TB (no recompute, bounded state).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_map_reduce_spark.functions.text import tokenize


def run_file_trigger_wordcount(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    continuous: bool = False,
):
    """Watch ``input_dir`` for text files; on each batch, recompute the
    full wordcount over the accumulated corpus and overwrite
    ``output_dir`` (reference full-recompute semantics).

    Returns the StreamingQuery (already started). With the default
    availableNow trigger it drains pending files and finishes.
    """
    lines = (
        spark.readStream.format("text")
        .load(input_dir)
        .withColumn("doc", F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1))
        .select("doc", F.col("value").alias("line"))
    )

    def recompute(batch_df: DataFrame, batch_id: int) -> None:
        # The reference recomputes over the WHOLE bucket on every upload,
        # so the batch rows are only a trigger: read the full corpus back
        # from input_dir itself. This is idempotent by construction — a
        # replayed batch (foreachBatch is at-least-once) or a wiped
        # checkpoint re-reading every file as batch 0 recomputes the same
        # answer, with no accumulated corpus copy to double-count.
        corpus = (
            batch_df.sparkSession.read.text(input_dir)
            .withColumn(
                "doc", F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1)
            )
            .select("doc", F.col("value").alias("line"))
        )
        toks = tokenize(corpus, text_col="line", out_col="word", keep_cols=["doc"])
        (
            toks.groupBy("word")
            .agg(F.count("*").alias("cnt"))
            .orderBy("word")
            .write.mode("overwrite")
            .parquet(f"{output_dir}/final")
        )

    writer = (
        lines.writeStream.foreachBatch(recompute)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if not continuous:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_incremental_event_counts(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "event_counts",
):
    """Incremental windowed aggregation over an event-file stream.

    Reads parquet files as they land, keeps per-(window, event_type)
    partial counts in state, emits finalized windows once the watermark
    passes (append mode). In-memory sink named ``query_name`` so callers /
    tests can query the result table.
    """
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    ev = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_sliding_event_counts(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "4 hours",
    query_name: str = "sliding_counts",
):
    """Streaming leg of the sliding-window rollup: the SAME
    ``F.window(ts, window, slide)`` expression as the batch
    ``events_sliding_window`` operator, run incrementally with a
    watermark — each event updates every window covering it; windows
    seal and emit (append mode) once the watermark passes their end."""
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    ev = spark.readStream.schema(schema).parquet(events_dir)
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_streaming_dedup(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    query_name: str = "deduped_docs",
    max_files_per_trigger: int | None = None,
    output_dir: str | None = None,
):
    """Streaming exact dedup: emit each distinct document content hash at
    most once across the whole stream (the ingest-time counterpart of the
    batch ``dedup_exact`` operator).

    State is one row per distinct md5 seen — bounded by content
    cardinality, not stream length; at 100 TB/day you additionally scope
    state with ``dropDuplicatesWithinWatermark`` on an event-time column
    so state ages out.

    Sink: in-memory table ``query_name`` by default (tests/demo); pass
    ``output_dir`` for a durable parquet sink — REQUIRED for restart
    recovery, since the memory sink cannot resume from a checkpoint.
    """
    schema = "doc_id bigint, text string"
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(docs_dir)
    deduped = (
        docs.withColumn("text_hash", F.md5("text"))
        .dropDuplicates(["text_hash"])
        .select("doc_id", "text_hash")
    )
    writer = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    if output_dir is not None:
        return writer.format("parquet").option("path", output_dir).start()
    return writer.format("memory").queryName(query_name).start()


def run_stream_static_enrich(
    spark: SparkSession,
    events_dir: str,
    customer_parquet: str,
    checkpoint_dir: str,
    query_name: str = "enriched_events",
):
    """Stream-static enrichment join: arriving events pick up dimension
    attributes from a static (batch) table.

    Stateless — the static side is re-resolvable per micro-batch and
    broadcast by the planner, so there is no streaming state at all and
    append mode needs no watermark. This is the standard ingest-time
    enrichment shape (events x user profile) at any scale.
    """
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    ev = spark.readStream.schema(schema).parquet(events_dir)
    dim = (
        spark.read.parquet(customer_parquet)
        .select(
            F.col("c_custkey").alias("user_id"),
            "c_mktsegment",
            "c_nationkey",
        )
    )
    enriched = ev.join(F.broadcast(dim), "user_id").select(
        "event_id", "user_id", "event_type", "value", "c_mktsegment", "c_nationkey"
    )
    return (
        enriched.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_stream_stream_join(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    query_name: str = "click_to_purchase",
    within: str = "1 hour",
    watermark: str = "2 hours",
):
    """Stream-stream interval join: clicks joined to the same user's
    purchases that happen within ``within`` afterwards.

    Both sides carry watermarks and the join condition bounds the event-
    time distance, so each side's buffered state is evictable once the
    other side's watermark passes — bounded state on two unbounded
    streams, the attribution-join shape. Inner join + append mode.
    """
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )

    def side(event_type: str, prefix: str):
        return (
            spark.readStream.schema(schema)
            .parquet(events_dir)
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", watermark)
        )

    clicks = side("click", "click")
    purchases = side("purchase", "buy")
    joined = clicks.join(
        purchases,
        F.expr(
            f"""
            click_user = buy_user AND
            buy_ts >= click_ts AND
            buy_ts <= click_ts + INTERVAL {within}
            """
        ),
    ).select("click_id", "buy_id", "click_user", "click_ts", "buy_ts")
    return (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_streaming_upsert(
    spark: SparkSession,
    updates_dir: str,
    snapshot_dir: str,
    checkpoint_dir: str,
    key: str,
    version_col: str,
    schema: str,
    n_buckets: int | None = None,
):
    """Streaming CDC apply: update files land in ``updates_dir``; each
    micro-batch merges into the parquet snapshot at ``snapshot_dir`` via
    the keep-latest ``upsert_snapshot`` contract (update rows win version
    ties). The rewrite goes through a staging directory and is promoted
    BY RENAME — write staging, move the live snapshot aside to ``.old``,
    rename staging into place, delete ``.old`` — so a crash at ANY point
    leaves either the previous snapshot or both directories, never
    neither. (The naive delete-then-rename order has a window where only
    staging exists; a checkpoint replay entering then would take the
    first-batch path and silently rebuild the snapshot from that one
    batch.) Each batch starts by recovering any ``.old``/staging
    leftovers from a prior crash, and replayed batches (checkpoint
    recovery, at-least-once foreachBatch) are idempotent — re-applying
    the same updates yields the same snapshot
    (``tests/test_streaming.py`` asserts both).

    ``n_buckets`` selects the snapshot layout. ``None`` (default)
    keeps the monolithic whole-snapshot rewrite — fine while the
    snapshot is small. An int switches to the partition-pruned layout
    (``sinks.writers.upsert_snapshot_bucketed``): the snapshot lives as
    hash-bucket hive partitions of the key and each micro-batch rewrites
    ONLY the buckets its update keys hash into — the 100 TB shape, where
    a trickle of CDC updates must not pay a full-snapshot scan + write
    per batch (untouched bucket files stay byte-identical; pytest-gated).
    Crash safety moves from one global rename-promote to per-bucket
    promotes + keep-latest replay idempotency; with a lakehouse format
    either mode becomes MERGE INTO.
    """
    import shutil

    from gcp_map_reduce_spark.sinks.writers import (
        upsert_snapshot,
        upsert_snapshot_bucketed,
    )

    staging = snapshot_dir + ".staging"
    old = snapshot_dir + ".old"

    def apply_bucketed(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        upsert_snapshot_bucketed(
            spark, batch_df, snapshot_dir, key, version_col, n_buckets=n_buckets
        )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # crash recovery: a leftover .old means a previous promote died
        # between its renames — roll forward (snapshot present: drop
        # .old) or roll back (snapshot missing: .old IS the snapshot).
        if os.path.isdir(old):
            if os.path.isdir(snapshot_dir):
                shutil.rmtree(old)
            else:
                os.rename(old, snapshot_dir)
        if not batch_df.head(1):
            return
        if os.path.isdir(snapshot_dir):
            base = spark.read.parquet(snapshot_dir)
            merged = upsert_snapshot(base, batch_df, key, version_col)
        else:
            # first batch: dedupe the batch itself by the same contract
            merged = upsert_snapshot(
                batch_df.limit(0), batch_df, key, version_col
            )
        # mode("overwrite") clobbers any stale staging from a crash
        merged.write.mode("overwrite").parquet(staging)
        if os.path.isdir(snapshot_dir):
            os.rename(snapshot_dir, old)
        os.rename(staging, snapshot_dir)
        if os.path.isdir(old):
            shutil.rmtree(old)

    reader = spark.readStream.schema(schema)
    return (
        reader.parquet(updates_dir)
        .writeStream.foreachBatch(
            apply_batch if n_buckets is None else apply_bucketed
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
