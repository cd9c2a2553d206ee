"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the raw bytes as a
``binary`` column with a metadata struct (modality, byte size, provenance),
keep ALL filtering/joining on the metadata (columnar, pushdown-friendly),
and run decode/feature-extraction as Arrow-batched pandas functions via
``mapInPandas`` — bytes stream through Arrow in batches, never row-at-a-time
pickling.

The container has no image/audio codecs, so the real decoder is STUBBED
(``decode_media`` raises NotImplementedError); the Spark-side plumbing —
schema, batching, UDF signature, partitioning — is real and tested via the
deterministic fake feature extractor ``_fake_features``.

The binary fixture is built from ``documents.text`` (utf-8 bytes) so the
whole path runs on the driver-provided tables.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gcp_map_reduce_spark.plans.registry import query
from gcp_map_reduce_spark.sources.tables import load_table


def build_binary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, payload: binary, meta: struct) — the canonical
    multimodal layout. Metadata is a real struct column so predicates like
    ``meta.n_bytes > x`` prune at the parquet scan when persisted."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text-as-bytes").alias("modality"),
            F.octet_length(payload).alias("n_bytes"),
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, modality: str) -> object:
    """Real media decode (image/audio/video). Requires codec libraries not
    present in this container — deliberately stubbed."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; use _fake_features "
        "for the plumbing path"
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("last_byte", T.IntegerType()),
        T.StructField("byte_sum_mod", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def _fake_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for a media feature extractor: pure integer
    byte statistics (mean is one double division), so output is
    reproducible across engines/runs. Shape mirrors a real extractor:
    consumes (doc_id, payload) Arrow batches, emits fixed-width features.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        n = payloads.map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n.astype("int64"),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype(
                    "int32"
                ),
                "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1).astype(
                    "int32"
                ),
                "byte_sum_mod": payloads.map(lambda b: sum(b) % 997).astype("int64"),
                "mean_byte": payloads.map(
                    lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                ),
            }
        )


@query("multimodal_features")  # pandas-UDF byte stats; no clean ANSI-SQL analog
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the multimodal decode plumbing, minus the codec."""
    return build_binary_table(spark, sf_dir).select("doc_id", "payload").mapInPandas(
        _fake_features, schema=FEATURE_SCHEMA
    )


RESIZE_STRIDE = 4  # keep every 4th byte (stand-in for spatial downsample)
FRAME_SIZE = 256  # bytes per pseudo-frame
FRAME_STEP = 8  # sample every 8th frame

_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes_in", T.LongType()),
        T.StructField("n_bytes_out", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic 'resize': stride-subsample the byte stream (a real
    implementation decodes, resamples pixels, re-encodes — same Arrow
    in/out shape, same 1-row-in/1-row-out contract)."""
    for pdf in batches:
        payloads = pdf["payload"]
        resized = payloads.map(lambda b: bytes(b[:: RESIZE_STRIDE]))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes_in": payloads.map(len).astype("int64"),
                "n_bytes_out": resized.map(len).astype("int64"),
                "resized": resized,
            }
        )


@query("multimodal_resize")  # binary transform; no ANSI-SQL analog
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing over binary payloads (1 row -> 1 smaller row) via
    ``mapInPandas``. At 100 TB this is the shape of every re-encode pass:
    payload-in/payload-out, no shuffle, output written straight back to a
    binary column."""
    return (
        build_binary_table(spark, sf_dir)
        .select("doc_id", "payload")
        .mapInPandas(_resize_batches, schema=_RESIZE_SCHEMA)
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("frame_sum_mod", T.LongType()),
    ]
)


def _frame_sample_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic frame sampler: treat the payload as FRAME_SIZE-byte
    frames, emit every FRAME_STEP-th frame — 1 row -> N rows, the video
    keyframe-extraction shape."""
    for pdf in batches:
        ids, idxs, frames, sums = [], [], [], []
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = (len(b) + FRAME_SIZE - 1) // FRAME_SIZE
            for fi in range(0, n_frames, FRAME_STEP):
                fr = bytes(b[fi * FRAME_SIZE : (fi + 1) * FRAME_SIZE])
                ids.append(doc_id)
                idxs.append(fi)
                frames.append(fr)
                sums.append(sum(fr) % 997)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame": pd.Series(frames, dtype="object"),
                "frame_sum_mod": pd.Series(sums, dtype="int64"),
            }
        )


@query("multimodal_frame_sample")  # 1->N binary emit; no ANSI-SQL analog
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (1 row -> N frame rows) via
    ``mapInPandas`` — generator output keeps peak memory at one batch, and
    downstream per-frame operators (decode, embed) parallelize over the
    exploded rows."""
    return (
        build_binary_table(spark, sf_dir)
        .select("doc_id", "payload")
        .mapInPandas(_frame_sample_batches, schema=_FRAME_SCHEMA)
    )


@query(
    "multimodal_stats",
    oracle="""
SELECT lang AS meta_lang, source AS meta_source, count(*) AS n_items,
  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
  CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents GROUP BY lang, source
""",
)
def multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only rollup over the binary table: byte budgets per
    (lang, source) — never touches payload bytes (column pruning keeps the
    scan narrow)."""
    bt = build_binary_table(spark, sf_dir)
    return bt.groupBy(
        F.col("meta.lang").alias("meta_lang"),
        F.col("meta.source").alias("meta_source"),
    ).agg(
        F.count("*").alias("n_items"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.max("meta.n_bytes").cast("bigint").alias("max_bytes"),
    )
