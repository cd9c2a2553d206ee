"""Streaming EMBEDDING near-duplicate dedup: IVF cell pruning against a
durable accepted-vector store — semantic dedup at ingest time.

The ingest-time counterpart of the batch ``dedup_embedding_cosine``
(whose r11 registered plan is the same cell-pruned candidate generator,
``operators/similarity.py:embedding_near_dup_pairs_ivf``): vectors
arrive as parquet files; each micro-batch assigns its vectors to their
``n_probe`` nearest codebook cells, matches them against the ACCEPTED
vectors sharing a cell (exact cosine >= NEAR_DUP_COSINE decides), and
emits only vectors that are not semantic near-dups of anything earlier.
Accepted vectors (with their features and cell assignments) append to
the store.

Codebook stability across batches: the coarse quantizer is built ONCE,
from the first batch's ``n_cells`` lowest vec_ids (the batch op's
rank-based seed convention), and persisted under ``store_dir/_codebook``
— every later batch (and every replay) reads the same centroids, so
cell recall is a fixed property of the stream, not of batch order. When
ingest is id-ordered the codebook equals the batch op's, which is what
the parity test exploits to replay the streaming acceptance policy over
``embedding_near_dup_pairs_ivf``'s pair graph EXACTLY.

Plan shape per trigger (the r11 minhash-stream lessons applied from the
start): the micro-batch side is explicitly broadcast everywhere, so the
growing store is only ever touched MAP-SIDE (scan -> broadcast hash
join on cell_id — zero store shuffle); the dups relation has no
shuffle at all (the anti-join consumer is multiplicity-blind); accepted
rows are localCheckpointed once and written coalesce(1) per batch dir.

Replay safety mirrors ``near_dup``: per-batch ``batch_id=N`` dirs are
rewritten on replay; same-id store rows are excluded by
``vec_a != vec_b``; and two same-batch accepted vectors are by
construction not near-dups, so re-seeing them via the store cannot flip
a decision. ``compact_signature_store(..., schema=EMB_STORE_SCHEMA,
key="vec_id")`` applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from gcp_map_reduce_spark.operators.similarity import (
    IVF_DEDUP_CELLS,
    IVF_DEDUP_NPROBE,
    NEAR_DUP_COSINE,
    _cosine_arrow,
    embed_features_arrow,
    ivf_dedup_n_cells,
    ivf_probe_cells,
)
from gcp_map_reduce_spark.streaming.near_dup import read_store

EMB_STORE_SCHEMA = (
    "vec_id bigint, e array<double>, n2 double, cells array<bigint>"
)


def _codebook(ss: SparkSession, store_dir: str, batch_feats: DataFrame,
              n_cells: int) -> DataFrame:
    """Read the persisted codebook, creating it from this batch's
    ``n_cells`` lowest vec_ids if absent or UNCOMMITTED (first batch /
    replayed first batch — deterministic either way). One row per cell:
    (cell_id, ce, cn2).

    Dir existence is NOT commitment: a first trigger killed mid-write
    leaves ``_codebook/_temporary`` only, which an explicit-schema read
    returns as ZERO rows — treating that as a codebook would silently
    assign every later vector an empty probe list and disable dedup
    forever (r11 review catch). A committed-but-empty codebook is
    impossible: an empty first batch raises instead of seeding."""
    path = f"{store_dir}/_codebook"
    schema = "cell_id bigint, ce array<double>, cn2 double"
    try:
        cb = ss.read.schema(schema).parquet(path)
        if cb.limit(1).count() > 0:
            return cb
    except AnalysisException:
        pass
    seeds = (
        batch_feats.orderBy("vec_id")
        .limit(n_cells)
        .select(
            F.col("vec_id").alias("cell_id"),
            F.col("e").alias("ce"),
            F.col("n2").alias("cn2"),
        )
        .localCheckpoint(eager=True)
    )
    if seeds.limit(1).count() == 0:
        raise ValueError(
            "run_streaming_embedding_near_dup: the first batch is empty — "
            "cannot seed the IVF codebook"
        )
    # overwrite heals a killed prior write's _temporary debris
    seeds.coalesce(1).write.mode("overwrite").parquet(path)
    return ss.read.schema(schema).parquet(path)


def run_streaming_embedding_near_dup(
    spark: SparkSession,
    emb_dir: str,
    checkpoint_dir: str,
    store_dir: str,
    output_dir: str,
    n_cells: int | None = None,
    n_probe: int = IVF_DEDUP_NPROBE,
    threshold: float = NEAR_DUP_COSINE,
    max_files_per_trigger: int | None = None,
    expected_corpus_size: int | None = None,
):
    """Start the stream (availableNow trigger: drains pending files and
    stops). ``output_dir`` accumulates accepted (vec_id) rows;
    ``store_dir`` accumulates accepted feature rows (EMB_STORE_SCHEMA)
    plus the one-time ``_codebook``.

    Codebook sizing (r12, threading the batch op's probe-scaled
    ``ivf_dedup_n_cells``): a stream cannot observe the final corpus
    size, and the codebook is pinned at the FIRST batch — so pass
    ``expected_corpus_size`` (the planned ingest volume) and the stream
    sizes its codebook exactly as the batch op would on that corpus
    (``ceil(N·n_probe/IVF_DEDUP_CELL_TARGET)``, clamped) — what the
    batch-parity test and the throughput bench do. An explicit
    ``n_cells`` overrides; with neither, the legacy ``IVF_DEDUP_CELLS``
    constant applies (documented mid-scale default — undersized
    codebooks degrade throughput, never correctness: precision is the
    exact cosine gate either way)."""
    if n_cells is None:
        n_cells = (
            ivf_dedup_n_cells(expected_corpus_size, n_probe)
            if expected_corpus_size is not None
            else IVF_DEDUP_CELLS
        )
    reader = spark.readStream.schema("vec_id bigint, embedding array<float>")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    vecs = reader.parquet(emb_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        ss = batch_df.sparkSession
        feats = embed_features_arrow(batch_df, sketch=False).select(
            "vec_id", "e", "n2"
        )
        cb = _codebook(ss, store_dir, feats, n_cells)
        cb_row = cb.agg(
            F.collect_list(F.struct("cell_id", "ce", "cn2")).alias("cb")
        )
        batch = (
            feats.crossJoin(F.broadcast(cb_row))
            .select("vec_id", "e", "n2", ivf_probe_cells(n_probe).alias("cells"))
            .localCheckpoint(eager=True)
        )

        store = read_store(ss, EMB_STORE_SCHEMA, store_dir).withColumn(
            "_bid",
            F.coalesce(
                F.regexp_extract(
                    F.input_file_name(), r"batch_id=(\d+)", 1
                ).try_cast("long"),
                F.lit(-1),
            ),
        ).filter(F.col("_bid") != batch_id).drop("_bid")

        def exploded(df: DataFrame, in_batch: bool) -> DataFrame:
            return df.select(
                F.explode("cells").alias("cell_id"),
                F.col("vec_id").alias("vec_a"),
                F.col("e").alias("e_a"),
                F.col("n2").alias("n2_a"),
                F.lit(in_batch).alias("in_batch"),
            )

        probe = F.broadcast(
            batch.select(
                F.explode("cells").alias("cell_id"),
                F.col("vec_id").alias("vec_b"),
                F.col("e").alias("e_b"),
                F.col("n2").alias("n2_b"),
            )
        )
        cand = (
            exploded(store, False)
            .unionByName(exploded(batch, True))
            .join(probe, "cell_id")
            .filter(
                (~F.col("in_batch") & (F.col("vec_a") != F.col("vec_b")))
                | (F.col("in_batch") & (F.col("vec_a") < F.col("vec_b")))
            )
        )
        # a pair sharing both probed cells repeats (<= n_probe^2 rows);
        # each repeat is one more Arrow-batched cosine — no distinct, the
        # anti-join below is multiplicity-blind (the near_dup lesson)
        dups = cand.filter(
            _cosine_arrow(
                F.col("e_a"), F.col("e_b"), F.col("n2_a"), F.col("n2_b")
            )
            >= threshold
        ).select("vec_b")

        accepted = (
            batch.join(
                F.broadcast(dups), batch.vec_id == dups.vec_b, "left_anti"
            )
            .localCheckpoint(eager=True)
            .coalesce(1)
        )
        accepted.write.mode("overwrite").parquet(
            f"{store_dir}/batch_id={batch_id}"
        )
        accepted.select("vec_id").write.mode("overwrite").parquet(
            f"{output_dir}/batch_id={batch_id}"
        )

    return (
        vecs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
