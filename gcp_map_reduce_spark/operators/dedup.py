"""Deduplication operators for training-data pipelines.

Not present in the reference (its only dedup is the map-side ``set`` on
(token, doc) pairs, ``scripts/invertedindex_map.py:8-16`` — exact distinct).
These are the standard large-corpus dedup ladder:

- exact: hash-groupBy on content (or normalized content);
- n-gram Jaccard: exact set-similarity via shingle inverted index + join;
- MinHash + LSH banding: the 100 TB path — constant-size signatures, only
  band-collision candidates are verified, never all pairs;
- SimHash: 64-bit fingerprints, near-dup = small Hamming distance, banded
  by 16-bit chunks.

Scale notes: the shingle self-join in ``dedup_ngram_jaccard`` is quadratic
in the hottest shingle's doc-frequency — fine as the exactness oracle /
verifier, but at 100 TB you run ``dedup_minhash`` (bounded shuffle: k
signature longs per doc) and verify only its candidates. Hot-shingle
skew is handled by dropping top-percentile shingles (like stop-words),
controlled by ``max_shingle_df``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_map_reduce_spark.functions.text import WS_SPLIT, normalize_text, sql_normalize
from gcp_map_reduce_spark.operators.scale import materialize
from gcp_map_reduce_spark.plans.registry import query
from gcp_map_reduce_spark.sources.tables import load_table

# -- exact dedup ----------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one group per byte-identical text, keeping the smallest
    doc_id. Hash-groupBy => map-side partial agg, single shuffle on the
    128-bit digest (no skew: hashes are uniform)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies")
    )


@query(
    "dedup_exact_normalized",
    oracle=f"""
SELECT md5({sql_normalize('text')}) AS text_hash,
       min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY 1 HAVING count(*) > 1
""",
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup after §1.4 normalization (case/punct/ASCII folding) —
    catches trivially-reformatted copies; only groups with >1 member."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(normalize_text(F.col("text"))).alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


# -- shingling (shared by jaccard / minhash / simhash) --------------------


def doc_shingle_arrays(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """(doc_id, sh_arr: array<string>) — the DISTINCT n-token shingles of
    each document as one array row. Zero shuffle: per-doc array work only.

    Each document is one row, so shingles are built array-natively with
    zip_with over shifted slices of the token array — ~2x faster than a
    posexplode + lead()-window formulation (and that one shuffles every
    token on doc_id first). Shifted zips pad with null past the shorter
    end; nulls mark incomplete trailing grams and are filtered before
    distinct.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # A small parquet arrives as one split; fan out before the CPU-heavy
    # per-row array work so all cores participate (on a real cluster the
    # scan itself provides the splits and this is a cheap no-op shuffle).
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    w = F.filter(
        F.split(normalize_text(F.col("text")), WS_SPLIT), lambda t: t != ""
    )
    grams = w
    for j in range(1, n):
        shifted = F.slice(w, j + 1, F.greatest(F.size(w) - j, F.lit(0)))
        grams = F.zip_with(
            grams,
            shifted,
            lambda g, t: F.when(
                g.isNull() | t.isNull(), F.lit(None)
            ).otherwise(F.concat(g, F.lit(" "), t)),
        )
    sh_arr = F.array_distinct(F.filter(grams, lambda x: x.isNotNull()))
    return docs.select("doc_id", sh_arr.alias("sh_arr"))


def doc_shingles(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """DISTINCT (doc_id, shingle) rows — the exploded form of
    :func:`doc_shingle_arrays`, for inverted-index-style self-joins.

    ``max_shingle_df`` drops shingles appearing in more than that many docs
    (stop-shingles) — the skew guard for the self-join path at scale.
    """
    out = doc_shingle_arrays(spark, sf_dir, n).select(
        "doc_id", F.explode("sh_arr").alias("sh")
    )
    if max_shingle_df is not None:
        hot = (
            out.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("sh")
        )
        out = out.join(hot, "sh", "left_anti")
    return out


_SHINGLES_SQL = f"""
toks AS (
  SELECT doc_id, regexp_split_to_array({sql_normalize('text')}, '{WS_SPLIT}') AS w
  FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 3
)
"""


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH {_SHINGLES_SQL},
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isect
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, isect,
  CAST(isect AS DOUBLE) / (sa.sz + sb.sz - isect) AS jaccard
FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(isect AS DOUBLE) / (sa.sz + sb.sz - isect) >= 0.8
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs: 3-shingle Jaccard >= 0.8 via inverted-index
    self-join. Jaccard is integer-arithmetic + one double division, so it
    hash-matches the oracle bit-for-bit."""
    # three consumers (both join sides + sizes): materialize once
    sh = materialize(doc_shingles(spark, sf_dir, n=3))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("isect"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    jac = F.col("isect").cast("double") / (
        F.col("sza") + F.col("szb") - F.col("isect")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", "isect", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8)
    )


# -- MinHash + LSH (the scale path) ---------------------------------------

NUM_HASHES = 32  # signature length k
BANDS = 8  # b bands of r = k/b rows; P(collide) = 1-(1-j^r)^b


def minhash_signatures(
    spark: SparkSession, sf_dir: str, k: int = NUM_HASHES
) -> DataFrame:
    """(doc_id, sig: array<bigint>[k]) — k independent min-hashes per doc.

    Each hash family member is xxhash64 seeded by its index (JVM-side,
    whole-stage-codegen'd); min-aggregation is map-side-combinable, and
    because explode preserves the scan's locality every doc's shingles sit
    in one partition — the groupBy shuffle moves exactly k longs per doc.
    (An array-native zero-shuffle formulation via aggregate/zip_with was
    benchmarked ~35% slower: higher-order functions are interpreted, while
    this explode + hash + min pipeline stays in codegen.)
    """
    sh = doc_shingles(spark, sf_dir, n=3)
    return sh.groupBy("doc_id").agg(
        F.array(
            *[F.min(F.xxhash64(F.lit(i), F.col("sh"))) for i in range(k)]
        ).alias("sig")
    )


@query("dedup_minhash")  # xxhash64 family not reproducible in ANSI SQL -> rows-only
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates, verified by signature similarity.

    Pipeline: signatures -> band hashes -> explode bands -> self-join on
    (band_id, band_hash) -> distinct candidate pairs -> estimated Jaccard =
    fraction of agreeing signature positions; keep >= 0.7.

    At 100 TB this is THE dedup plan: per-doc state is k=32 longs, the
    band join only touches colliding buckets, and AQE splits any hot
    bucket. Recall vs the exact operator is asserted in unit tests.

    The signature rides along the band rows as an array column (k longs =
    256 bytes/row), so the whole operator is ONE computation of the
    signatures + one band self-join — no signature re-join, no cache. The
    estimated Jaccard is zip_with agreement over the two arrays.
    """
    sig = minhash_signatures(spark, sf_dir)
    r = NUM_HASHES // BANDS
    bands = sig.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.hash(*[F.col("sig")[band * r + j] for j in range(r)])
                    for band in range(BANDS)
                ]
            )
        ).alias("band_id", "band_hash"),
    )
    # self-join: materialize once or the whole signature pipeline runs
    # twice (no cross-side subexpression reuse in Spark)
    bands = materialize(bands)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()  # sig is functionally determined by doc_id
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return (
        cand.select(
            "doc_a",
            "doc_b",
            (agree / F.lit(float(NUM_HASHES))).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= 0.7)
    )


# -- SimHash --------------------------------------------------------------

SIMHASH_BITS = 64
_CHUNK_BITS = 16  # band width for the Hamming-distance join


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per doc from token-frequency-weighted bit votes.

    For each bit j: vote = sum over distinct tokens of (+cnt if bit j of
    xxhash64(token) set else -cnt); bit j of the fingerprint = vote > 0.
    All 64 votes are one wide aggregate — single shuffle on doc_id.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(normalize_text(F.col("text")), WS_SPLIT)).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
        .withColumn("th", F.xxhash64("word"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("th"), j).bitwiseAND(F.lit(1)) == 1, F.col("cnt"))
            .otherwise(-F.col("cnt"))
        ).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    fp = sum(
        F.when(F.col(f"v{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
            F.lit(0).cast("long")
        )
        for j in range(SIMHASH_BITS)
    )
    return agg.select("doc_id", fp.alias("simhash"))


@query("dedup_simhash")  # xxhash64-based fingerprint -> rows-only
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= 3.

    Banding: split the 64-bit fingerprint into 4 chunks of 16 bits; any
    pair within distance 3 agrees on >= 1 chunk (pigeonhole), so the join
    key is (chunk_id, chunk_value) — never all-pairs."""
    fp = simhash_fingerprints(spark, sf_dir)
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * _CHUNK_BITS)
                    .bitwiseAND(F.lit((1 << _CHUNK_BITS) - 1))
                    .alias(f"c{i}")
                    for i in range(SIMHASH_BITS // _CHUNK_BITS)
                ]
            )
        ).alias("chunk_id", "chunk_val"),
    )
    chunks = materialize(chunks)
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= 3)
    )


# -- dedup clustering (connected components over near-dup pairs) -----------


@query(
    "dedup_clusters",
    oracle=f"""
WITH RECURSIVE {_SHINGLES_SQL},
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isect
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
  WHERE CAST(isect AS DOUBLE) / (sa.sz + sb.sz - isect) >= 0.8
),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
  UNION SELECT doc_a, doc_a FROM pairs
  UNION SELECT doc_b, doc_b FROM pairs
),
reach AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
)
SELECT s AS doc_id, min(d) AS cluster_id, count(DISTINCT d) AS reach_size
FROM reach GROUP BY s
""",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup pair graph: every document
    in any >= 0.8-Jaccard pair gets a cluster id (the component's minimum
    doc_id) — the dedup ENDGAME: keep cluster_id == doc_id, drop the rest.

    Spark side is iterative min-label propagation (labels drop to the
    smallest label among self + neighbors each round, log-diameter
    rounds); the driver-side loop checks only a CHANGE COUNT per round
    (scalar), never row data, and each round is one join + one
    aggregation on the (tiny relative to corpus) pair-graph node set.
    The DuckDB oracle computes the same components via a recursive-CTE
    transitive closure — engine-independent agreement on an iterative
    algorithm's fixpoint. reach_size doubles as the component size.
    """
    pairs = materialize(
        dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    )
    fwd = pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
    rev = pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d"))
    edges = materialize(fwd.union(rev))
    labels = edges.groupBy("s").agg(F.min("d").alias("label"))
    labels = labels.select(
        "s", F.least(F.col("s"), F.col("label")).alias("label")
    )
    for _ in range(16):  # >= log2(diameter) for any realistic cluster
        neigh = (
            edges.select(F.col("s").alias("ns"), F.col("d").alias("nd"))
            .join(
                labels.select(F.col("s").alias("ls"), "label"),
                F.col("nd") == F.col("ls"),
            )
            .groupBy("ns")
            .agg(F.min("label").alias("nlabel"))
        )
        updated = materialize(
            labels.join(neigh, labels.s == neigh.ns, "left").select(
                F.col("s"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
        )
        changed = (
            updated.select(F.col("s").alias("us"), F.col("label").alias("ulabel"))
            .join(labels, F.col("us") == F.col("s"))
            .filter(F.col("ulabel") != F.col("label"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    comp = labels.select("s", F.col("label").alias("cluster_id"))
    sizes = comp.groupBy("cluster_id").agg(F.count("*").alias("reach_size"))
    return (
        comp.join(sizes, "cluster_id")
        .select(F.col("s").alias("doc_id"), "cluster_id", "reach_size")
    )
