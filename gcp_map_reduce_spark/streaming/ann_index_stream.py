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
- segment growth is bounded in-stream when asked
  (``compact_at_segments=K`` folds segments back to one base the moment
  the manifest holds K — atomic publish, search results unchanged) or
  between drains by calling
  :func:`operators.ann_index.compact_ann_index` directly, the same
  store-compaction discipline as the near-dup streams; and the
  codebook-outgrown condition a compaction CANNOT fix surfaces through
  ``on_rebuild_due`` (r12 verdict: the manifest carried ``n_vec`` and
  the docstring named the trigger, but nothing acted on it).

``run_streaming_index_takedowns`` (r15) is the delete-side twin: id
batches landing as files tombstone-commit through the same folded,
idempotent path, so the full lifecycle — grow, take down, compact,
rebuild — runs in-stream under one locking discipline.

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
    FullyTombstonedError,
    ann_index_append,
    ann_index_delete,
    ann_index_meta,
    ann_index_rebuild_due,
    compact_ann_index,
)


def _compact_tolerating_fully_tombstoned(spark, index_dir: str):
    """In-stream compaction with the one exception both maintenance
    streams must tolerate: a fully-tombstoned index still SERVES
    (readers anti-join to empty results) but cannot compact — the
    condition is an operator-level takedown-of-everything, and
    crash-looping a stream on it would help no one; it clears when
    rows arrive or the operator drops/rebuilds the index. Returns the
    post-compaction manifest, or None when compaction was impossible."""
    try:
        return compact_ann_index(spark, index_dir)
    except FullyTombstonedError:
        return None


def run_streaming_index_maintenance(
    spark: SparkSession,
    emb_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    compact_at_segments: int | None = None,
    on_rebuild_due=None,
    rebuild_cell_target: int | None = None,
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
    foreachBatch).

    Maintenance hooks (opt-in — a long-running ingest otherwise grows
    segment count and per-probe scan cost forever):

    - ``compact_at_segments=K``: after any append that leaves the
      manifest holding >= K segments, fold them back into one base
      segment (:func:`compact_ann_index` — atomic publish, search
      results unchanged, so a reader mid-drain never notices beyond
      fewer files opened). Compaction bounds the per-search file count
      at K x probed cells instead of (triggers elapsed) x probed cells.
    - ``on_rebuild_due=callback``: invoked with the post-append manifest
      whenever :func:`ann_index_rebuild_due` says the corpus has outrun
      the FIXED codebook (``n_vec > 2 x n_cells x cell_target``) —
      compaction cannot fix that (same cells, fatter), only a rebuild
      re-sizes ``n_cells``. The callback decides: flag a metric, kick a
      nightly rebuild, or — if it owns the current corpus snapshot —
      rebuild inline with :func:`operators.ann_index.ann_index_rebuild`
      (lock-held, atomic publish, storage/levels/attrs preserved,
      ``n_cells`` re-sized; drain-tested in ``tests/test_streaming.py``).
      The stream itself never rebuilds — it does not know the corpus
      dir, and an implicit rebuild mid-ingest would swap the index under
      the operator's feet. ``rebuild_cell_target`` overrides the sizing
      target the criterion assumes (default: the module's
      IVF_DEDUP_CELL_TARGET)."""
    meta = ann_index_meta(index_dir)  # fail fast on a missing index
    # the manifest records the BUILD corpus's embedding element type
    # (pre-r13 manifests default to array<float>, what they were all
    # built over) — typing the reader from it means an array<double>
    # index fails nowhere: the stream reads doubles as doubles
    schema = f"vec_id bigint, embedding {meta['embedding_ddl']}"
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
        new_meta = ann_index_append(
            batch_df.sparkSession, index_dir, batch_df,
            if_exists="skip", collected=True,
        )
        if (
            compact_at_segments is not None
            and len(new_meta["segments"]) >= compact_at_segments
        ):
            compacted = _compact_tolerating_fully_tombstoned(
                batch_df.sparkSession, index_dir
            )
            if compacted is not None:
                new_meta = compacted
        if on_rebuild_due is not None and ann_index_rebuild_due(
            new_meta, cell_target=rebuild_cell_target
        ):
            on_rebuild_due(new_meta)

    return (
        vecs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_streaming_index_takedowns(
    spark: SparkSession,
    takedown_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    compact_at_deleted: int | None = None,
):
    """Drain pending TAKEDOWN files (``vec_id bigint`` parquet rows —
    the id-list shape legal/contamination removals arrive in) into
    tombstone commits on the persisted index at ``index_dir``; returns
    the query handle (r15 — closes the index lifecycle's last
    batch-only edge: appends, compaction, and rebuild already run
    in-stream, deletes required a hand-run batch call between drains).

    Per micro-batch: the driver-sized id batch (takedowns are bounded
    by contract, same as :func:`operators.ann_index.ann_index_delete`)
    commits through the folded-tombstone path with
    ``if_missing="skip"``, AND ``(lineage, batch_id)`` is recorded as
    a stream watermark in the manifest atomically with the delete —
    lineage being the streaming query id from ``<ckpt>/metadata``,
    stable across crash-restarts, regenerated on a checkpoint wipe
    (batch numbers only mean anything within one lineage: keyed on
    the PATH, a wiped checkpoint's re-numbered batch 0 repacking NEW
    takedown files with old ones would skip wholesale). Replay safety
    therefore has two layers: the watermark proves a same-lineage
    redelivery (crash between manifest commit and checkpoint commit)
    was already applied — even if a compaction has since MATERIALIZED
    its tombstones and a legitimate replacement row re-appended, the
    case where skip-mode alone would find the replacement live and
    silently kill it (review catch) — and skip-mode covers
    cross-lineage replays (wiped checkpoint, files re-pointed at a
    fresh path), which no-op while the ids stay tombstoned. The one
    window that remains open, and deliberately so, is replaying old
    takedown files under a NEW lineage after a compaction and a
    re-append of the same ids: once a takedown is materialized, its
    files are spent — do not re-point them at fresh checkpoints. Null ``vec_id`` rows (or a
    takedown file whose id column is misnamed, which the user-supplied
    schema reads as all-null) raise a clear ValueError rather than
    crash-looping on a TypeError. The delete holds the index writer
    lock per commit, so this stream composes with a
    concurrently-running :func:`run_streaming_index_maintenance` —
    commits serialize, and the external-mutation guard never fires
    between lock-holding writers.

    Ordering semantics the operator must know: a takedown tombstones
    ids LIVE at commit time. An id that ingests AFTER its takedown
    drained is not retroactively blocked — gate future ingest with the
    decontamination screen, not the tombstone list (deliberately: a
    forever-blocklist keyed on vec_id would also block a legitimate
    replacement row, the same reason re-appends of tombstoned ids wait
    for compaction).

    ``compact_at_deleted=N``: after any delete that leaves the manifest
    with >= N tombstoned rows, MATERIALIZE the deletes
    (:func:`compact_ann_index` — live rows rewritten, tombstones
    cleared, atomic publish). A fully-tombstoned index tolerates the
    impossible compaction exactly like the append maintainer does."""
    ann_index_meta(index_dir)  # fail fast on a missing index
    reader = spark.readStream.schema("vec_id bigint")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ids_stream = reader.parquet(takedown_dir)
    lineage: list = []  # memoized once the checkpoint exists

    def stream_key() -> str | None:
        # the watermark key is the checkpoint LINEAGE (the streaming
        # query id Structured Streaming writes to <ckpt>/metadata at
        # start, stable across crash-restarts, regenerated on a wipe):
        # batch numbers are only meaningful within one lineage — a
        # path-derived key would let a wiped checkpoint's re-numbered
        # batch 0, repacking NEW takedown files with old ones, skip
        # wholesale against the old run's watermark (4th review pass;
        # realpath also mangled URI checkpoint locations). If the
        # metadata is not locally readable (an object-store checkpoint)
        # there is NO safe stable key — a path key survives wipes and
        # reintroduces exactly that bug (5th review pass) — so the
        # watermark degrades to None and replay safety falls back to
        # skip-mode alone, the module's documented local-FS caveat
        # class (same as the writer flock and os.replace commits).
        if not lineage:
            import hashlib
            import json as _json
            import os as _os

            try:
                with open(_os.path.join(checkpoint_dir, "metadata")) as fh:
                    qid = _json.load(fh)["id"]
            except (OSError, ValueError, KeyError, TypeError):
                return None  # not memoized: a transient miss may clear
            lineage.append(
                "td-" + hashlib.sha1(str(qid).encode()).hexdigest()[:12]
            )
        return lineage[0]

    def process(batch_df, batch_id: int) -> None:
        rows = batch_df.select("vec_id").collect()
        ids = [int(r.vec_id) for r in rows if r.vec_id is not None]
        if len(ids) != len(rows):
            # a null takedown id is a producer bug, not a skippable row
            # — and a misnamed id column reads as ALL-null under the
            # user-supplied schema; fail with the diagnosis instead of
            # crash-looping on int(None)
            raise ValueError(
                f"takedown batch {batch_id} carries "
                f"{len(rows) - len(ids)} null vec_id rows — fix the "
                "producer (a fully-null batch usually means the file's "
                "id column is not named vec_id)"
            )
        if not ids:
            return
        key = stream_key()
        new_meta = ann_index_delete(
            batch_df.sparkSession, index_dir, ids, if_missing="skip",
            stream_mark=(key, int(batch_id)) if key else None,
        )
        if (
            compact_at_deleted is not None
            and int(new_meta.get("n_deleted", 0)) >= compact_at_deleted
        ):
            _compact_tolerating_fully_tombstoned(
                batch_df.sparkSession, index_dir
            )

    return (
        ids_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
