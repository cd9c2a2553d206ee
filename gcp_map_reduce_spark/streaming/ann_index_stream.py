"""Streaming maintenance of the persisted ANN index: vectors appended
at ingest, searches served from the same published index throughout.

The batch module (``operators/ann_index.py``) gives build-once /
query-many; an ingest pipeline also needs GROW-continuously — new
embedding files land, and the index must absorb them without a corpus
rescan and without ever presenting a partial state to a concurrent
searcher. This stream is a thin trigger around
:func:`operators.ann_index.ann_index_append`:

- per micro-batch: assign ONLY the batch against the fixed published
  codebook and commit it as a new segment (one manifest ``os.replace``
  = the commit point — a reader sees the index before-batch or
  after-batch, never between);
- at-least-once safety by construction: appends run with
  ``if_exists="skip"``, so a replayed batch (foreachBatch redelivery,
  wiped checkpoint, crash between manifest commit and checkpoint
  commit) skips every already-present vec_id and no-ops instead of
  corrupting or raising;
- segment growth is the caller's compaction budget:
  :func:`operators.ann_index.compact_ann_index` folds segments between
  drains (atomic publish, search results unchanged), the same
  store-compaction discipline as the near-dup streams.

The index must exist before the stream starts (built from the initial
corpus snapshot — the realistic deployment: nightly build, daytime
ingest). Bootstrapping the codebook from a first micro-batch would pin
index quality to whatever files happened to land first; an explicit
build keeps that decision with the operator. Parity is exact, not
statistical: an index grown by this stream over N files equals a fresh
build over the concatenated corpus bit-for-bit (same codebook, shared
assignment expression) — pytest-gated in ``tests/test_streaming.py``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from gcp_map_reduce_spark.operators.ann_index import (
    ann_index_append,
    ann_index_meta,
)


def run_streaming_index_maintenance(
    spark: SparkSession,
    emb_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Drain pending embedding files (availableNow trigger) into the
    persisted index at ``index_dir``; returns the query handle (call
    ``awaitTermination()``). Raises up front if the index is missing —
    build it first (see module docstring for why there is no
    first-batch bootstrap).

    Indexes with persisted attrs are supported: the manifest records
    the attr DDL at build time, and the reader schema extends to match,
    so arriving files must carry those columns (a pre-attrs-ddl index
    with attrs fails HERE with guidance, not mid-stream inside
    foreachBatch)."""
    meta = ann_index_meta(index_dir)  # fail fast on a missing index
    schema = "vec_id bigint, embedding array<float>"
    if meta["attrs"]:
        if not meta["attrs_ddl"]:
            raise ValueError(
                f"index persists attrs {meta['attrs']} but its manifest "
                "predates attrs_ddl — rebuild the index so the stream "
                "can type its reader schema"
            )
        schema += ", " + meta["attrs_ddl"]
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    vecs = reader.parquet(emb_dir)

    def process(batch_df, batch_id: int) -> None:
        # collected=True: micro-batches are driver-sized by construction,
        # and the driver-centric append is the difference between ~6 and
        # 2 Spark jobs per trigger (this repo's streaming-trigger rule)
        ann_index_append(
            batch_df.sparkSession, index_dir, batch_df,
            if_exists="skip", collected=True,
        )

    return (
        vecs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
