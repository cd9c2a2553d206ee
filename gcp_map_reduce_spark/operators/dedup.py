"""Deduplication operators for training-data pipelines.

Not present in the reference (its only dedup is the map-side ``set`` on
(token, doc) pairs, ``scripts/invertedindex_map.py:8-16`` — exact distinct).
These are the standard large-corpus dedup ladder:

- exact: hash-groupBy on content (or normalized content);
- n-gram Jaccard: exact set-similarity via shingle inverted index + join;
- MinHash + LSH banding: the 100 TB path — constant-size signatures, only
  band-collision candidates are verified, never all pairs;
- SimHash: 60-bit fingerprints, near-dup = small Hamming distance, banded
  by 15-bit chunks.

Scale notes: the shingle self-join in ``dedup_ngram_jaccard`` is quadratic
in the hottest shingle's doc-frequency — fine as the exactness oracle /
verifier, but at 100 TB you run ``dedup_minhash`` (bounded shuffle: k
signature longs per doc) and verify only its candidates. Hot-shingle
skew is handled by dropping top-percentile shingles (like stop-words),
controlled by ``max_shingle_df``.

Hash family: every sketch here hashes through ``portable_hash64`` — a
60-bit integer parsed from the md5 hex digest. md5 is available in both
Spark (JVM codegen) and DuckDB, so the minhash signatures and simhash
fingerprints are bit-reproducible in the oracle: the sketch operators are
fully value-hash-checked, not rows-only. (xxhash64 would be marginally
faster but exists only in Spark.)
"""

from __future__ import annotations

import logging
import os
import threading

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_map_reduce_spark.functions.text import WS_SPLIT, normalize_text, sql_normalize
from gcp_map_reduce_spark.operators.scale import ensure_parallelism, materialize
from gcp_map_reduce_spark.plans.probes import corpus_key
from gcp_map_reduce_spark.plans.registry import query
from gcp_map_reduce_spark.sources.tables import load_table

log = logging.getLogger(__name__)

# -- portable hashing (Spark + DuckDB twin expressions) --------------------

MERSENNE31 = 2_147_483_647  # 2^31 - 1
ROLL_C = 1_000_003  # rolling-combine multiplier for gram hashes


def portable_hash64(c: Column) -> Column:
    """60-bit integer hash of a string, identical in Spark and DuckDB:
    the first 15 hex digits of md5, parsed as an integer. JVM-side
    (md5 + conv are codegen'd) — no Python in the row path."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_portable_hash64(expr: str) -> str:
    """DuckDB twin of :func:`portable_hash64`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


# -- exact dedup ----------------------------------------------------------


@query(
    "dedup_exact",
    oracle=f"""
SELECT 'raw' AS kind, md5(text) AS text_hash,
       min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
UNION ALL
SELECT 'normalized' AS kind, md5({sql_normalize('text')}) AS text_hash,
       min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY 2 HAVING count(*) > 1
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, two granularities in one result (tagged by ``kind``):

    - ``raw``: one group per byte-identical text (all groups);
    - ``normalized``: groups that collide only after §1.4 normalization
      (case/punct/ASCII folding) with >1 member — trivially-reformatted
      copies.

    Hash-groupBy => map-side partial agg, single shuffle on the 128-bit
    digest (no skew: hashes are uniform). One scan feeds both branches.
    NO degenerate-split fan-out here, deliberately: measured at sf0.1 a
    pre-agg Exchange costs 2.5x (0.30 -> 0.77 s, text bytes shuffled
    twice for the two branches) against a ~0.2 s stress-straggler gain —
    md5+normalize is too cheap per row to buy an exchange. Contrast
    ``doc_tokens``/``salted_token_counts``, where tokenize+explode is
    heavy enough that the conditional fan-out wins at stress and is free
    at sf0.1. Also measured (r8): computing both hashes in ONE scan and
    checkpointing (doc_id, h_raw, h_norm) before the two groupBys is a
    wash — 0.35 vs 0.33 s at sf0.1, 0.95 vs 1.03 s at stress — because
    the branch scans run CONCURRENTLY and the checkpoint write costs
    what the saved pass saves; the dual-scan form stays.
    """
    docs = load_table(spark, sf_dir, "documents")
    raw = (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .select(F.lit("raw").alias("kind"), "text_hash", "keep_doc_id", "n_copies")
    )
    norm = (
        docs.groupBy(F.md5(normalize_text(F.col("text"))).alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select(
            F.lit("normalized").alias("kind"), "text_hash", "keep_doc_id", "n_copies"
        )
    )
    return raw.unionByName(norm)


def dedup_exact_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id) survivors of raw exact dedup — the library form consumed
    by the curation pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )


# -- shingling (shared by jaccard / minhash / simhash) --------------------


def shingle_arrays_for(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sh_arr) for an arbitrary (doc_id, text) DataFrame — the
    DF-level core of :func:`doc_shingle_arrays`, reused by the streaming
    near-dup operator on micro-batch DataFrames."""
    w = F.filter(
        F.split(normalize_text(F.col("text"), trim=False), WS_SPLIT),
        lambda t: t != "",
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


def doc_shingle_arrays(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """(doc_id, sh_arr: array<string>) — the DISTINCT n-token shingles of
    each document as one array row. Zero shuffle on the scale path:
    per-doc array work only (see ``ensure_parallelism`` — an Exchange is
    added ONLY when the scan under-splits a tiny local file).

    Each document is one row, so shingles are built array-natively with
    zip_with over shifted slices of the token array — ~2x faster than a
    posexplode + lead()-window formulation (and that one shuffles every
    token on doc_id first). Shifted zips pad with null past the shorter
    end; nulls mark incomplete trailing grams and are filtered before
    distinct.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = ensure_parallelism(
        docs,
        spark.sparkContext.defaultParallelism,
        cache_key=corpus_key(sf_dir, "documents"),
    )
    return shingle_arrays_for(docs, n)


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


def _gram_hashes_subquery(n: int = 3, pred: str = "TRUE") -> str:
    """Self-contained DuckDB subquery: DISTINCT (doc_id, gh) rolling
    n-gram hashes of the documents matching ``pred`` — the twin of
    :func:`gram_hash_arrays_arrow` (portable md5 family; identical
    integer arithmetic, so collisions — ~1e-3 likely per 10^5 docs in
    the 2^31 space — land identically in both engines)."""
    p, c = MERSENNE31, ROLL_C
    roll = "h[i]"
    for j in range(1, n):
        roll = f"(({roll} * {c} + h[i+{j}]) % {p})"
    return f"""(
  SELECT DISTINCT doc_id, {roll} AS gh
  FROM (
    SELECT doc_id,
      list_transform(
        list_filter(regexp_split_to_array({sql_normalize('text')}, '{WS_SPLIT}'),
                    t -> t <> ''),
        t -> {sql_portable_hash64('t')} % {p}) AS h
    FROM documents WHERE {pred}
  ), UNNEST(range(1, len(h) - {n - 2})) AS t(i)
  WHERE len(h) >= {n}
)"""


def _gram_hashes_sql() -> str:
    """``grams`` CTE (n=3, all documents) — the shared oracle front end
    of the jaccard / clusters / curated-corpus / minhash twins."""
    return f"grams AS {_gram_hashes_subquery(3)}"


_NGRAM_JACCARD_ORACLE = f"""
WITH {_gram_hashes_sql()},
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isect
  FROM grams a JOIN grams b ON a.gh = b.gh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, isect,
  CAST(isect AS DOUBLE) / (sa.sz + sb.sz - isect) AS jaccard
FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(isect AS DOUBLE) / (sa.sz + sb.sz - isect) >= 0.8
"""


JACCARD_THRESHOLD = 0.8


def dedup_ngram_jaccard(
    spark: SparkSession,
    sf_dir: str,
    prefix_filter: bool | str = False,
    arr: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs: 3-shingle Jaccard >= 0.8 over shingle FINGERPRINTS
    (Broder-style): each shingle is its rolling gram hash in the 2^31
    space, not the gram string — the join shuffles 8-byte longs instead
    of ~25-byte strings and the per-doc build avoids per-gram concats.
    Fingerprint collisions are possible but DETERMINISTIC and mirrored
    exactly by the oracle (same md5-based token hashes, same rolling
    arithmetic — see :func:`_gram_hashes_sql`), so the value-hash gate
    stays exact; semantically a collision perturbs one intersection
    count with probability ~|shingles|^2/2^31 per corpus.

    ``prefix_filter=True`` is the SCALE form (r8): exact PREFIX
    FILTERING (Bayardo et al.'s AllPairs bound) — index only each doc's
    FIRST ``|A| - ceil(t*|A|) + 1`` gram hashes under the global
    ascending hash order; any pair with Jaccard >= t must share a
    prefix gram, so the candidate set provably contains every
    qualifying pair. Each candidate is then verified ONCE via
    ``array_intersect`` on the checkpointed per-doc arrays (distinct
    elements, so its size IS the intersection count; same ints, same
    division -> bit-identical output, oracle unchanged; pytest asserts
    the two forms agree at sf0.01/sf0.1). The ceil is exact integer
    arithmetic — double 0.8 sits above the rational 4/5, and a float
    ceil would shorten the prefix into false negatives at |A| % 5 == 0.

    Measured crossover (same shape as the exact/minhash edge-source
    choice): at the 10x-dup-density stress set the full inverted-index
    self-join emits one row per SHARED GRAM per pair — 113M
    intersection rows — where the prefix plan emits 23.9M
    candidate-gram rows, and with the r9 LENGTH + POSITIONAL filters
    (below) the surviving pairs drop 22.46M -> 8.42M -> fewer still:
    prefix+filters win 4.6 vs 18.7 s quiet-box (4x); at sf0.1's low dup
    density the dedup+verify overhead still exceeds the savings (1.76
    vs 1.51 s interleaved A/B, r9 — the filters narrowed the gap from
    0.94 to 0.25 s but didn't flip it), so full stays the low-density
    choice and the probe threshold is unchanged.

    ``prefix_filter="auto"`` decides by the SAME sampled density probe
    as ``choose_edge_source`` — candidate pairs per doc
    (sum df*(df-1)/2 over gram fingerprints) is exactly the row count
    the full join materializes, and the measured crossover sits on the
    same side of the existing threshold as the edge-source choice (~267
    pairs/doc at sf0.1 -> full wins; ~2,743 at stress -> prefix wins).
    The probe is one ~1.3 s sampled job at stress scale, repaid ~5x by
    the right plan. The DEFAULT stays the plain full form (False): the
    probe is pure overhead for callers that already know their regime —
    ``dedup_clusters``/``curated_corpus`` only take exact edges when
    ``choose_edge_source`` has ALREADY measured the density below the
    same threshold (where full wins), and the registered pair-scores
    suite opts into "auto" because its exact leg must run at every
    density (tagged branch).

    Join-strategy asymmetry (measured): Catalyst's size estimate under
    an explode is the CHILD's, so it happily broadcasts the corpus-wide
    inverted index (~20M rows at stress from a ~1 MB estimate) — fatal
    once per-doc fan-out times corpus size outgrows memory, and it
    blocks AQE's skew split (sort-merge only). The PREFIX form — the
    high-density/scale switch — therefore pins SHUFFLE_MERGE. The FULL
    form deliberately does NOT: it is the documented at-bench-scale
    choice (past the density crossover you switch to prefix or minhash
    edges), and in exactly that regime the local broadcast is the
    fastest plan (hint measured +0.2 s at sf0.1 on this leg and ~+0.3 s
    on each of dedup_clusters/curated_corpus, whose exact edge source
    rides it)."""
    # Materialize the COMPACT array form (one row per doc), not the
    # exploded inverted index: the checkpoint is |docs| rows instead of
    # |docs|*|shingles| rows (~50x fewer at bench scale, measured 2x on
    # the whole operator), |A| comes free as size(gh_arr) with no
    # groupBy shuffle, and each join side re-explodes/re-slices from the
    # checkpoint — explode is cheap narrow compute; the gram build above
    # it is what must not run twice. The checkpoint stays UNSORTED (the
    # full form doesn't care, and the sort is ~0.13 s at sf0.1); the
    # prefix branch sorts on read — its bound needs one global total
    # order shared by every doc, and array_intersect is
    # order-insensitive.
    if prefix_filter == "auto":
        cpd = estimate_candidate_pairs_per_doc(spark, sf_dir)
        prefix_filter = cpd >= EDGE_SOURCE_CPD_THRESHOLD
        log.info(
            "dedup_ngram_jaccard: est candidate pairs/doc %.1f -> %s form",
            cpd,
            "prefix" if prefix_filter else "full",
        )
    elif not isinstance(prefix_filter, bool):
        raise ValueError(
            f"prefix_filter must be bool or 'auto', got {prefix_filter!r}"
        )
    t = JACCARD_THRESHOLD
    # t as an exact rational: double 0.8 is slightly ABOVE 4/5, so every
    # bound below uses integer arithmetic on (t_num, t_den) — float
    # rounding would turn the filters into false negatives
    t_num, t_den = 4, 5
    assert t_num / t_den == t
    # ``arr`` lets a caller supply an ALREADY-MATERIALIZED
    # (doc_id, gh_arr) relation — dedup_pair_scores shares one fused
    # minhash_features_arrow pass across its ngram and minhash legs
    # instead of paying the corpus scan + per-token hash twice (r9)
    if arr is None:
        arr = materialize(doc_gram_hash_arrays(spark, sf_dir, n=3))
    if not prefix_filter:
        # carry |A| on the exploded rows (+4 bytes/row): the AllPairs
        # LENGTH bound (jac >= 4/5 forces 4*max <= 5*min, exact integer
        # arithmetic) prunes size-mismatched pairs' shared-gram rows
        # INSIDE the join, before the pair groupBy — and F.first(sz)
        # inside that groupBy replaces the two post-agg size joins the
        # previous plan paid. Exact (r9 pytest: 256 == 256 pairs at
        # sf0.1) and ~10% faster at sf0.1 (1.39 vs 1.54 s best-of-3).
        sh = arr.select(
            "doc_id", F.size("gh_arr").alias("sz"), F.explode("gh_arr").alias("gh")
        )
        a = sh.alias("a")
        b = sh.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.gh") == F.col("b.gh"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
                & (F.col("a.sz") * t_den >= F.col("b.sz") * t_num)
                & (F.col("b.sz") * t_den >= F.col("a.sz") * t_num),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .agg(
                F.count("*").alias("isect"),
                F.first(F.col("a.sz")).alias("sza"),
                F.first(F.col("b.sz")).alias("szb"),
            )
        )
        jac = F.col("isect").cast("double") / (
            F.col("sza") + F.col("szb") - F.col("isect")
        )
        return inter.select(
            "doc_a", "doc_b", "isect", jac.alias("jaccard")
        ).filter(F.col("jaccard") >= t)
    # prefix length |A| - ceil(t|A|) + 1 (AllPairs): if the two docs
    # share NO gram among these heads, fewer than t|A| of A's grams can
    # be shared at all, so Jaccard < t
    sz = F.size("gh_arr")
    min_overlap = F.floor((sz * t_num + (t_den - 1)) / t_den)
    plen = (sz - min_overlap + 1).cast("int")
    pref = arr.select(
        "doc_id",
        sz.alias("sz"),
        # pos is the gram's 0-based rank in the FULL sorted array (the
        # prefix is its head) — the positional filter below needs it
        F.posexplode(F.slice(F.array_sort("gh_arr"), 1, plen)).alias(
            "pos", "gh"
        ),
    )
    a = pref.alias("a")
    b = pref.alias("b")
    # PPJoin pruning inside the merge join (r9, measured at stress;
    # both bounds in exact integer arithmetic for t = 4/5):
    # - LENGTH filter: jac >= t forces isect <= min(|A|,|B|) and
    #   union >= max, so t*max <= min — kills size-mismatched pairs
    #   (22.46M -> 8.42M candidates, 14.8 -> 8.8 s).
    # - POSITIONAL filter: jac >= t also forces
    #   isect >= alpha = ceil(t/(1+t) * (|A|+|B|)) = ceil(4(a+b)/9),
    #   and for a shared gram at sorted ranks (pa, pb) with NO shared
    #   gram before it, isect <= min(|A|-pa, |B|-pb). Filtering every
    #   match row by its own bound is exact: a qualifying pair always
    #   survives via its FIRST shared prefix gram's row (8.9 -> 4.6 s;
    #   result rows bit-identical, 249,288 = 249,288 at stress).
    # Both prune BEFORE the dedup shuffle and the per-pair O(|A|+|B|)
    # array_intersect verify, which stage profiling showed is ~all the
    # cost. A repartition of the survivors was measured and rejected
    # (+1.7 s — AQE's coalesce is already right here).
    # ceil(4(a+b)/9) via integer div — `div` keeps it exact at any size
    alpha = F.expr(
        f"(((a.sz + b.sz) * {t_num}) + {t_num + t_den - 1}) div {t_num + t_den}"
    )
    cand = (
        a.hint("SHUFFLE_MERGE")
        .join(
            b,
            (F.col("a.gh") == F.col("b.gh"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.sz") * t_den >= F.col("b.sz") * t_num)
            & (F.col("b.sz") * t_den >= F.col("a.sz") * t_num)
            & (
                F.least(
                    F.col("a.sz") - F.col("a.pos"),
                    F.col("b.sz") - F.col("b.pos"),
                )
                >= alpha
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ga = arr.select(F.col("doc_id").alias("doc_a"), F.col("gh_arr").alias("ga"))
    gb = arr.select(F.col("doc_id").alias("doc_b"), F.col("gh_arr").alias("gb"))
    # cast to long: the full form's F.count emits LongType, and with
    # prefix_filter='auto' the output schema must not vary with the
    # sampled corpus density (r8 advice)
    isect = F.size(F.array_intersect("ga", "gb")).cast("long")
    jac = isect.cast("double") / (
        F.size("ga") + F.size("gb") - isect
    )
    return (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            isect.alias("isect"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t)
    )


# -- MinHash + LSH (the scale path) ---------------------------------------

NUM_HASHES = 32  # signature length k
BANDS = 8  # b bands of r = k/b rows; P(collide) = 1-(1-j^r)^b


def _token_hash_expr(fast_hash: bool) -> Column:
    """array<bigint> of per-token base hashes (mod P) for the ``text``
    column — the shared front half of the gram/signature pipelines."""
    w = F.filter(
        F.split(normalize_text(F.col("text"), trim=False), WS_SPLIT),
        lambda t: t != "",
    )
    if fast_hash:
        base = lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE31))  # noqa: E731
    else:
        base = lambda s: portable_hash64(s) % MERSENNE31  # noqa: E731
    return F.transform(w, base)


def gram_hash_arrays_for(
    docs: DataFrame, n: int = 3, fast_hash: bool = False
) -> DataFrame:
    """(doc_id, gh_arr: array<bigint>) — DISTINCT rolling hashes of each
    doc's n-token shingles, built WITHOUT materializing gram strings:
    hash each TOKEN once (md5 portable / xxhash64 fast), then combine
    with the exact integer polynomial ``((h1*C + h2) % P) * C + h3) % P``
    via the same shifted zip_with chain as the string shingles. Skips
    both the per-gram string concat and the per-gram md5 of a ~25-byte
    string — the signature pipeline's two biggest CPU items. All
    operands stay under 2^52 (h < 2^31, C < 2^20), so the arithmetic is
    exact in both Spark longs and DuckDB BIGINTs and the oracle
    reproduces identical gram hashes (null padding past the shorter
    slice propagates through the arithmetic and is filtered, same as
    the string form)."""
    th = _token_hash_expr(fast_hash)
    g = th
    for j in range(1, n):
        shifted = F.slice(th, j + 1, F.greatest(F.size(th) - j, F.lit(0)))
        g = F.zip_with(
            g, shifted, lambda a, b: (a * ROLL_C + b) % MERSENNE31
        )
    gh_arr = F.array_distinct(F.filter(g, lambda x: x.isNotNull()))
    return docs.select("doc_id", gh_arr.alias("gh_arr"))

# Fixed affine hash family over the Mersenne prime: h_i(x) = (A_i*x + B_i)
# mod P. Literal coefficients are embedded in BOTH the Spark expressions
# and the oracle SQL, so the two engines compute identical signatures.
_rng = np.random.RandomState(1337)
MINHASH_A = [int(v) for v in _rng.randint(1, MERSENNE31, NUM_HASHES, dtype=np.int64)]
MINHASH_B = [int(v) for v in _rng.randint(0, MERSENNE31, NUM_HASHES, dtype=np.int64)]


def minhash_signatures_for(gh: DataFrame) -> DataFrame:
    """Signatures for a (doc_id, gh_arr) gram-hash DataFrame (see
    :func:`gram_hash_arrays_for`) — the DF-level core of
    :func:`minhash_signatures` (streaming micro-batches use this
    directly)."""
    # single-traversal fold: one pass over the hash array updating all k
    # mins via zip_with/least — ~15% faster than k separate
    # array_min(transform(...)) passes (same arithmetic, 1/k the
    # traversals), and bit-identical (verified)
    init = F.array(*[F.lit(MERSENNE31).cast("long")] * NUM_HASHES)
    remaps = lambda h: F.array(  # noqa: E731
        *[(F.lit(a) * h + F.lit(b)) % MERSENNE31 for a, b in zip(MINHASH_A, MINHASH_B)]
    )
    sig = F.aggregate(
        F.col("gh_arr"),
        init,
        lambda acc, h: F.zip_with(acc, remaps(h), lambda x, y: F.least(x, y)),
    )
    return (
        gh.filter(F.size("gh_arr") > 0).select("doc_id", sig.alias("sig"))
    )


def minhash_signatures_arrow(th_df: DataFrame, n: int = 3) -> DataFrame:
    """Signatures from a (doc_id, th_arr) token-hash DataFrame via ONE
    vectorized Arrow kernel — bit-identical to the higher-order-function
    form (asserted in tests), ~20x less CPU.

    Why this exists: Spark's array lambdas (``transform``/``zip_with``/
    ``aggregate``) are CodegenFallback — every element op is an
    interpreted expression eval (~0.5 us measured). The rolling-gram
    chain plus the k-min fold is ~(n-1 + k) ops per gram; at 50k docs x
    ~300 grams x (2+32) ops that interpreted ~380 CPU-seconds on the sf1
    stress set. The same integer arithmetic in numpy over the Arrow
    batch (flat gram array + segment reduceat) is ~100x fewer cycles per
    op. Exactness: h < 2^31 and C < 2^20 keep every intermediate under
    2^62, so int64 numpy == Spark long == DuckDB BIGINT — the oracle
    still reproduces signatures exactly. ``array_distinct`` is skipped
    on purpose: duplicate grams cannot change a minimum.

    Scale shape: mapInPandas is per-partition streaming over Arrow
    batches — no shuffle, no driver collection; memory is O(batch
    grams), bounded by arrow.maxRecordsPerBatch."""
    import numpy as np
    import pandas as pd

    a_arr, b_arr = np.array(MINHASH_A, np.int64), np.array(MINHASH_B, np.int64)

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            vals = pdf["th_arr"].to_numpy()
            lens = np.fromiter((len(v) for v in vals), np.int64, len(vals))
            gcounts = np.maximum(lens - (n - 1), 0)
            keep = gcounts > 0
            if not keep.any():
                continue
            flat = np.concatenate([np.asarray(v, np.int64) for v in vals])
            offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
            gk = gcounts[keep]
            gstarts = np.concatenate(([0], np.cumsum(gk)))[:-1]
            # flat indices of each doc's gram windows (boundary-safe)
            idx = np.repeat(offs[keep], gk) + (
                np.arange(int(gk.sum()), dtype=np.int64) - np.repeat(gstarts, gk)
            )
            g = flat[idx]
            for j in range(1, n):
                g = (g * ROLL_C + flat[idx + j]) % MERSENNE31
            sig = np.empty((len(gk), NUM_HASHES), np.int64)
            for i in range(NUM_HASHES):
                sig[:, i] = np.minimum.reduceat(
                    (a_arr[i] * g + b_arr[i]) % MERSENNE31, gstarts
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy()[keep], "sig": list(sig)}
            )

    return th_df.mapInPandas(kernel, "doc_id long, sig array<long>")


def gram_hash_arrays_arrow(th_df: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, gh_arr) DISTINCT rolling gram hashes from a (doc_id,
    th_arr) token-hash DataFrame — the vectorized twin of
    :func:`gram_hash_arrays_for` (same numpy segment arithmetic as
    :func:`minhash_signatures_arrow`; set-equal arrays, sorted order).
    Docs with fewer than ``n`` tokens produce no row, matching the
    downstream size>0 semantics."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            vals = pdf["th_arr"].to_numpy()
            lens = np.fromiter((len(v) for v in vals), np.int64, len(vals))
            gcounts = np.maximum(lens - (n - 1), 0)
            keep = gcounts > 0
            if not keep.any():
                continue
            flat = np.concatenate([np.asarray(v, np.int64) for v in vals])
            offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
            gk = gcounts[keep]
            gstarts = np.concatenate(([0], np.cumsum(gk)))[:-1]
            idx = np.repeat(offs[keep], gk) + (
                np.arange(int(gk.sum()), dtype=np.int64) - np.repeat(gstarts, gk)
            )
            g = flat[idx]
            for j in range(1, n):
                g = (g * ROLL_C + flat[idx + j]) % MERSENNE31
            # per-segment distinct: stable (segment, value) sort, then
            # first-in-run mask — no Python loop over docs
            seg = np.repeat(np.arange(len(gk), dtype=np.int64), gk)
            order = np.lexsort((g, seg))
            gs, ss = g[order], seg[order]
            first = np.ones(len(gs), bool)
            first[1:] = (gs[1:] != gs[:-1]) | (ss[1:] != ss[:-1])
            gu, su = gs[first], ss[first]
            counts = np.bincount(su, minlength=len(gk))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[keep],
                    "gh_arr": np.split(gu, np.cumsum(counts)[:-1]),
                }
            )

    return th_df.mapInPandas(kernel, "doc_id long, gh_arr array<long>")


def minhash_features_arrow(th_df: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sig, gh_arr) in ONE kernel pass — the fusion of
    :func:`minhash_signatures_arrow` and :func:`gram_hash_arrays_arrow`
    (identical arithmetic on the shared rolling-gram array; per-column
    equality to the two single-purpose kernels is pytest-gated).

    Why: the banded-plus-verified edge plan needs BOTH the signatures
    (band candidates) and the distinct gram arrays (exact Jaccard
    verification). Materializing them separately runs the JVM
    tokenize + per-token hash expression AND the gram build twice over
    the full corpus — measured ~2.9 s of the 6.5 s
    ``dedup_clusters(edge_source="minhash")`` wall at the sf1 stress
    set. One pass halves the dominant corpus-side stage.
    """
    import numpy as np
    import pandas as pd

    a_arr, b_arr = np.array(MINHASH_A, np.int64), np.array(MINHASH_B, np.int64)

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            vals = pdf["th_arr"].to_numpy()
            lens = np.fromiter((len(v) for v in vals), np.int64, len(vals))
            gcounts = np.maximum(lens - (n - 1), 0)
            keep = gcounts > 0
            if not keep.any():
                continue
            flat = np.concatenate([np.asarray(v, np.int64) for v in vals])
            offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
            gk = gcounts[keep]
            gstarts = np.concatenate(([0], np.cumsum(gk)))[:-1]
            idx = np.repeat(offs[keep], gk) + (
                np.arange(int(gk.sum()), dtype=np.int64) - np.repeat(gstarts, gk)
            )
            g = flat[idx]
            for j in range(1, n):
                g = (g * ROLL_C + flat[idx + j]) % MERSENNE31
            # signatures: k per-segment minima over the raw gram stream
            sig = np.empty((len(gk), NUM_HASHES), np.int64)
            for i in range(NUM_HASHES):
                sig[:, i] = np.minimum.reduceat(
                    (a_arr[i] * g + b_arr[i]) % MERSENNE31, gstarts
                )
            # distinct gram arrays: stable (segment, value) sort + run mask
            seg = np.repeat(np.arange(len(gk), dtype=np.int64), gk)
            order = np.lexsort((g, seg))
            gs, ss = g[order], seg[order]
            first = np.ones(len(gs), bool)
            first[1:] = (gs[1:] != gs[:-1]) | (ss[1:] != ss[:-1])
            gu, su = gs[first], ss[first]
            counts = np.bincount(su, minlength=len(gk))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[keep],
                    "sig": list(sig),
                    "gh_arr": np.split(gu, np.cumsum(counts)[:-1]),
                }
            )

    return th_df.mapInPandas(
        kernel, "doc_id long, sig array<long>, gh_arr array<long>"
    )


def doc_text_features_arrow(
    docs: DataFrame, n: int = 3, want_sig: bool = True, want_arr: bool = True
) -> DataFrame:
    """Fused text -> minhash/gram features in ONE Python pass (r17).

    The r16 shape (``_token_hash_expr`` front half + th_arr kernel)
    evaluated md5 + hex parse PER TOKEN OCCURRENCE in the JVM — the
    dominant CPU of every md5-family dedup stage (curated_corpus's
    gram-checkpoint stage profiled 14.7 CPU-s at sf0.1, most of it the
    per-occurrence md5). Here the whole front half runs inside the same
    ``mapInPandas`` task that builds the grams: the normalize/tokenize
    chain is the C-level Python twin the engine-equivalence property
    tests pin (PY_NORMALIZE rule order; post-ASCII-fold tokens make
    ``str.split()`` the WS-class split — the proven simhash-kernel
    replica), and each DISTINCT token is md5-hashed ONCE per task
    (vocabulary cache — corpus vocabulary is tiny next to occurrences).

    Exactness: ``int(md5(utf8)[:15 hex], 16)`` IS
    ``conv(substring(md5(w),1,15),16,10)`` (:func:`portable_hash64`),
    mod the same prime; the rolling-gram / affine-min numpy machinery
    is byte-for-byte the th_arr kernels'. Bit-equality to the r16 path
    is pytest-gated and every downstream registered query re-checks
    against the DuckDB oracle.

    NULL or sub-``n``-token docs produce no output row (the th_arr
    kernels' ``gcounts <= 0`` drop, made explicit — a NULL text only
    ever reached the old kernels in theory, where it would raise)."""
    import string as _string

    import numpy as np
    import pandas as pd

    ws_chars = " \t\n\x0b\f\r\x1c\x1d\x1e\x1f"
    punct_del = {ord(c): None for c in _string.punctuation}
    a_arr = np.array(MINHASH_A, np.int64) if want_sig else None
    b_arr = np.array(MINHASH_B, np.int64) if want_sig else None
    if not (want_sig or want_arr):
        raise ValueError("need at least one of want_sig/want_arr")

    def kernel(batches):
        import hashlib

        hash_cache: dict[str, int] = {}

        def h64(w: str) -> int:
            v = hash_cache.get(w)
            if v is None:
                v = (
                    int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)
                    % MERSENNE31
                )
                hash_cache[w] = v
            return v

        for pdf in batches:
            if pdf.empty:
                continue
            ids: list[int] = []
            ths: list[np.ndarray] = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                if t is None:
                    continue
                norm = (
                    t.translate(punct_del)
                    .lower()
                    .encode("ascii", "ignore")
                    .decode("ascii")
                    .strip(ws_chars)
                )
                toks = norm.split()
                if len(toks) < n:
                    continue  # no grams -> no row (gcounts<=0 parity)
                ids.append(doc_id)
                ths.append(
                    np.fromiter((h64(w) for w in toks), np.int64, len(toks))
                )
            if not ids:
                continue
            # shared rolling-gram machinery (identical to the th_arr
            # kernels above; every doc here has >= 1 gram)
            lens = np.fromiter((len(v) for v in ths), np.int64, len(ths))
            gk = lens - (n - 1)
            flat = np.concatenate(ths)
            offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
            gstarts = np.concatenate(([0], np.cumsum(gk)))[:-1]
            idx = np.repeat(offs, gk) + (
                np.arange(int(gk.sum()), dtype=np.int64) - np.repeat(gstarts, gk)
            )
            g = flat[idx]
            for j in range(1, n):
                g = (g * ROLL_C + flat[idx + j]) % MERSENNE31
            out = {"doc_id": pd.Series(ids, dtype="int64")}
            if want_sig:
                sig = np.empty((len(gk), NUM_HASHES), np.int64)
                for i in range(NUM_HASHES):
                    sig[:, i] = np.minimum.reduceat(
                        (a_arr[i] * g + b_arr[i]) % MERSENNE31, gstarts
                    )
                out["sig"] = list(sig)
            if want_arr:
                seg = np.repeat(np.arange(len(gk), dtype=np.int64), gk)
                order = np.lexsort((g, seg))
                gs, ss = g[order], seg[order]
                first = np.ones(len(gs), bool)
                first[1:] = (gs[1:] != gs[:-1]) | (ss[1:] != ss[:-1])
                gu, su = gs[first], ss[first]
                counts = np.bincount(su, minlength=len(gk))
                out["gh_arr"] = np.split(gu, np.cumsum(counts)[:-1])
            yield pd.DataFrame(out)

    fields = ["doc_id long"]
    if want_sig:
        fields.append("sig array<long>")
    if want_arr:
        fields.append("gh_arr array<long>")
    return docs.select("doc_id", "text").mapInPandas(
        kernel, ", ".join(fields)
    )


def doc_minhash_features(
    spark: SparkSession, sf_dir: str, n: int = 3, fast_hash: bool = False
) -> DataFrame:
    """(doc_id, sig, gh_arr) per document — one corpus scan, one Arrow
    pass (see :func:`minhash_features_arrow`). The portable-md5 family
    routes through the fused text kernel (r17,
    :func:`doc_text_features_arrow` — md5 per DISTINCT token per task);
    ``fast_hash`` keeps the JVM xxhash64 front half, which has no
    Python twin."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = ensure_parallelism(
        docs,
        spark.sparkContext.defaultParallelism,
        cache_key=corpus_key(sf_dir, "documents"),
    )
    if fast_hash:
        return minhash_features_arrow(
            docs.select("doc_id", _token_hash_expr(True).alias("th_arr")), n
        )
    return doc_text_features_arrow(docs, n)


def doc_gram_hash_arrays(
    spark: SparkSession, sf_dir: str, n: int = 3, fast_hash: bool = False
) -> DataFrame:
    """(doc_id, gh_arr) DISTINCT shingle fingerprints per document — the
    hashed replacement for :func:`doc_shingle_arrays` on every dedup
    path (the string form remains for operators whose semantics need the
    literal grams, e.g. decontamination overlap reporting)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = ensure_parallelism(
        docs,
        spark.sparkContext.defaultParallelism,
        cache_key=corpus_key(sf_dir, "documents"),
    )
    if fast_hash:
        return gram_hash_arrays_arrow(
            docs.select("doc_id", _token_hash_expr(True).alias("th_arr")), n
        )
    # r17: portable-md5 family runs the fused text kernel (md5 per
    # DISTINCT token per task instead of per occurrence in the JVM)
    return doc_text_features_arrow(docs, n, want_sig=False)


def minhash_signatures(
    spark: SparkSession, sf_dir: str, fast_hash: bool = False
) -> DataFrame:
    """(doc_id, sig: array<bigint>[k]) — k independent min-hashes per doc.

    ZERO-shuffle: each document is one row holding its token-hash array
    (JVM-side md5/xxhash64 per token), and the rolling-gram combine plus
    the k mins run in ONE vectorized Arrow kernel over the scan's own
    partitions (:func:`minhash_signatures_arrow` — numpy segment
    arithmetic, bit-identical to the higher-order-function form but ~20x
    less CPU; the HOF form :func:`minhash_signatures_for` stays as the
    cross-check reference). No explode, no groupBy: at 100 TB the
    signature stage adds no Exchange at all, where a (doc_id, shingle)-
    exploded groupBy formulation would shuffle k longs per doc. Empty
    gram arrays (docs shorter than n tokens) are dropped, matching the
    exploded/grouped semantics. (A_i*h + B_i stays under 2^62: both
    operands < 2^31.)

    ``fast_hash=True`` swaps the portable md5 base hash for Spark's
    xxhash64 — ~30% faster signatures, same statistical quality, but NOT
    reproducible in DuckDB. Production/bench plans use it; the default
    stays the portable family so the registered query remains fully
    value-hash-checked by the oracle. Candidate sets agree for true
    near-dups either way (asserted in tests).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = ensure_parallelism(
        docs,
        spark.sparkContext.defaultParallelism,
        cache_key=corpus_key(sf_dir, "documents"),
    )
    if fast_hash:
        return minhash_signatures_arrow(
            docs.select("doc_id", _token_hash_expr(True).alias("th_arr")),
            n=3,
        )
    # r17: portable-md5 family runs the fused text kernel (md5 per
    # DISTINCT token per task instead of per occurrence in the JVM)
    return doc_text_features_arrow(docs, n=3, want_arr=False)


def _minhash_oracle() -> str:
    """Full SQL replica: token hashes, rolling gram hashes, signatures,
    band-collision candidates, estimated Jaccard — identical integer
    arithmetic in identical order, so DuckDB recomputes the exact
    signatures. All-pairs form (fine at oracle scale; the Spark plan is
    the banded join)."""
    p = MERSENNE31
    c = ROLL_C
    r = NUM_HASHES // BANDS
    mins = ",\n    ".join(
        f"min(({a} * gh + {b}) % {p}) AS s{i}"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    band_pred = " OR ".join(
        "("
        + " AND ".join(
            f"a.s{band * r + j} = b.s{band * r + j}" for j in range(r)
        )
        + ")"
        for band in range(BANDS)
    )
    agree = " + ".join(
        f"CASE WHEN a.s{i} = b.s{i} THEN 1 ELSE 0 END" for i in range(NUM_HASHES)
    )
    return f"""
WITH {_gram_hashes_sql()},
sig AS (
  SELECT doc_id,
    {mins}
  FROM grams GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  ({agree}) / {float(NUM_HASHES)} AS est_jaccard
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE ({band_pred})
  AND ({agree}) / {float(NUM_HASHES)} >= 0.7
"""


def minhash_band_rows(sig: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key) — the exploded LSH band rows of a
    (doc_id, sig) DataFrame; band_key is the struct of the band's r
    signature positions (exact equality join key)."""
    r = NUM_HASHES // BANDS
    return sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        *[
                            F.col("sig")[band * r + j].alias(f"k{j}")
                            for j in range(r)
                        ]
                    )
                    for band in range(BANDS)
                ]
            )
        ).alias("band_id", "band_key"),
    )


def minhash_band_candidates(sig: DataFrame) -> DataFrame:
    """Distinct (doc_a, doc_b) band-collision candidate pairs from a
    (doc_id, sig) signature DataFrame — the shared candidate generator
    for ``dedup_minhash`` and the clusters' minhash edge source. Pass a
    MATERIALIZED sig or the signature pipeline runs once per join side.
    """
    bands = minhash_band_rows(sig)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def dedup_minhash(
    spark: SparkSession,
    sf_dir: str,
    fast_hash: bool = False,
    sig: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup candidates, verified by signature similarity.

    Pipeline: signatures -> band keys -> explode bands -> self-join on
    (band_id, band_key) -> distinct candidate pairs -> estimated Jaccard =
    fraction of agreeing signature positions; keep >= 0.7.

    At 100 TB this is THE dedup plan: per-doc state is k=32 longs, the
    band join only touches colliding buckets, and AQE splits any hot
    bucket. Recall vs the exact operator is asserted in unit tests, and
    the portable hash family makes the WHOLE result (not just row counts)
    oracle-checked: the DuckDB twin recomputes identical signatures and
    applies the same band-collision predicate over all pairs.

    The band self-join carries (doc_id, band_id, band_key) ONLY — the
    k-long signature (256 B/row) re-joins onto the deduped candidate
    pairs afterwards. That trades one extra shuffle of the candidate set
    (tiny: band collisions only) for a 4x slimmer band exchange, the
    same id-only shape as the embedding dedup/ANN band joins. The band
    key is the STRUCT of the band's r signature values (exact equality —
    a hashed key could admit false-positive candidates the oracle's
    predicate would not). The estimated Jaccard is zip_with agreement
    over the two re-joined arrays.
    """
    # band sides + both signature re-joins read the signatures:
    # materialize once or the whole pipeline runs four times. ``sig``
    # lets a caller supply an already-materialized (doc_id, sig)
    # relation (dedup_pair_scores' shared fused-features pass, r9).
    if sig is None:
        sig = materialize(minhash_signatures(spark, sf_dir, fast_hash=fast_hash))
    # repartition the candidate set before the signature re-joins (same
    # shape as near_dup_edges_minhash_verified): AQE coalesces the
    # ~10 MB candidate shuffle to 2 partitions by BYTES, but the
    # zip_with agreement fold is interpreted per-element CPU — measured
    # 2.48 -> 1.96 s at sf1 stress (two 1 s two-task stages -> 32-way),
    # noise-level at sf0.1
    cand = (
        minhash_band_candidates(sig)
        .repartition(spark.sparkContext.defaultParallelism)
        .join(
            sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")),
            "doc_a",
        )
        .join(
            sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")),
            "doc_b",
        )
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

SIMHASH_BITS = 60  # bits of the portable 60-bit token hash
_CHUNK_BITS = 15  # band width for the Hamming-distance join (4 chunks)


def simhash_fingerprints(
    spark: SparkSession, sf_dir: str, engine: str = "arrow"
) -> DataFrame:
    """60-bit SimHash per doc from token-frequency-weighted bit votes.

    For each bit j: vote = sum over distinct tokens of (+cnt if bit j of
    portable_hash64(token) set else -cnt); bit j of the fingerprint =
    vote > 0.

    ``engine="arrow"`` (default, r8): ZERO-shuffle — one ``mapInPandas``
    pass per doc runs the proven C-level normalize chain, a token
    Counter, the md5 hash per DISTINCT word (cached across the batch's
    docs — the corpus vocabulary is tiny next to token occurrences) and
    the 60 votes as one numpy sign-matrix product. Replaces the
    tokenize-explode + (doc, word) groupBy + 60-column doc groupBy
    pipeline (two corpus-scale shuffles). Votes are exact integer sums
    (order-free), the hash is ``int(md5[:15], 16)`` — identical bytes
    hashed (tokens are pure ASCII after the fold) — so fingerprints are
    bit-equal to the expression form (pytest-gated).

    ``engine="expr"`` is the executable spec the SQL oracle mirrors:
    all 60 votes as one wide aggregate — single shuffle on doc_id.
    """
    if engine not in ("arrow", "expr"):
        raise ValueError(f"engine must be 'arrow' or 'expr', got {engine!r}")
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        spark.sparkContext.defaultParallelism,
        cache_key=corpus_key(sf_dir, "documents"),
    )
    if engine == "arrow":
        import string as _string

        ws_chars = " \t\n\x0b\f\r\x1c\x1d\x1e\x1f"
        punct_del = {ord(c): None for c in _string.punctuation}
        n_bits = SIMHASH_BITS

        def kernel(batches):
            import hashlib
            from collections import Counter

            import pandas as pd

            hash_cache: dict[str, int] = {}
            shifts = np.arange(n_bits, dtype=np.int64)

            def h64(w: str) -> int:
                v = hash_cache.get(w)
                if v is None:
                    v = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)
                    hash_cache[w] = v
                return v

            for pdf in batches:
                ids, fps = [], []
                for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                    if t is None:
                        continue  # expr parity: explode(split(NULL))
                        # emits no (doc, word) rows -> no fingerprint
                    norm = (
                        t.translate(punct_del)
                        .lower()
                        .encode("ascii", "ignore")
                        .decode("ascii")
                        .strip(ws_chars)
                    )
                    toks = norm.split()  # pure ASCII == the WS-class split
                    if not toks:
                        continue  # no (doc, word) rows -> no fingerprint
                    cnt = Counter(toks)
                    H = np.fromiter(
                        (h64(w) for w in cnt), dtype=np.int64, count=len(cnt)
                    )
                    C = np.fromiter(
                        cnt.values(), dtype=np.int64, count=len(cnt)
                    )
                    bits = (H[:, None] >> shifts) & 1  # (n_words, 60)
                    votes = ((2 * bits - 1) * C[:, None]).sum(axis=0)
                    fp = int(((votes > 0).astype(np.int64) << shifts).sum())
                    ids.append(doc_id)
                    fps.append(fp)
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(ids, dtype="int64"),
                        "simhash": pd.Series(fps, dtype="int64"),
                    }
                )

        return docs.mapInPandas(kernel, "doc_id long, simhash long")
    toks = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(normalize_text(F.col("text"), trim=False), WS_SPLIT)
            ).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
        .withColumn("th", portable_hash64(F.col("word")))
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


def _simhash_oracle() -> str:
    """Full SQL replica: fingerprints from the same portable hash, then
    all-pairs Hamming <= 3 (the Spark plan is the chunk-banded join; the
    result sets are identical by the pigeonhole guarantee)."""
    votes = ",\n    ".join(
        f"SUM(CASE WHEN (th >> {j}) & 1 = 1 THEN cnt ELSE -cnt END) AS v{j}"
        for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"CASE WHEN v{j} > 0 THEN (CAST(1 AS BIGINT) << {j}) ELSE 0 END"
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, word, count(*) AS cnt FROM (
    SELECT doc_id,
      unnest(regexp_split_to_array({sql_normalize('text')}, '{WS_SPLIT}')) AS word
    FROM documents
  ) WHERE word <> '' GROUP BY doc_id, word
),
hashed AS (
  SELECT doc_id, cnt, {sql_portable_hash64('word')} AS th FROM toks
),
votes AS (
  SELECT doc_id,
    {votes}
  FROM hashed GROUP BY doc_id
),
fp AS (SELECT doc_id, {fp} AS simhash FROM votes)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= 3.

    Banding: split the 60-bit fingerprint into 4 chunks of 15 bits; any
    pair within distance 3 agrees on >= 1 chunk (pigeonhole), so the join
    key is (chunk_id, chunk_value) — never all-pairs. The portable hash
    family makes the fingerprints (and hence the full result) identical
    in the DuckDB oracle."""
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

MAX_CC_ROUNDS = 64  # pointer doubling: rounds needed ~ log2(diameter)
# Frontier size at or below which a connected-components round's
# label-lookup side is broadcast (<= 2x this many rows of two longs,
# ~32 MB worst case) — late rounds become map-side joins instead of
# full-width shuffles. Above it the round falls back to the shuffle
# join, still frontier-restricted.
FRONTIER_BROADCAST_MAX = 1_000_000
# Edge rows per shuffle partition inside the CC loop (two longs a row:
# ~4 MB at this count) — the loop clamps its shuffle width to
# ceil(n_edges / this), capped at the session width, so small graphs
# run narrow (fewer scheduler round trips per round) and 100 TB graphs
# keep the session's full width.
CC_EDGES_PER_PARTITION = 250_000
# Edge count at or below which connected components runs as a DRIVER
# union-find instead of the distributed fixpoint loop (r16): below one
# shuffle partition's worth of edges the loop is pure scheduler latency
# — each of its ~4 jobs/round moves hundreds of rows — while a collect
# of <= this many (16-byte) edge rows is a few MB and path-halving
# union-find over them is a few ms. Same graph-adaptive discipline as
# the loop-width clamp above: at 100 TB edge counts the fast path never
# fires. Exactness is pinned by tests/test_connected_components.py,
# which checks BOTH paths against the same reference union-find.
# Hard ceiling on the env override (r17 VERDICT task): the fast path
# collect()s the edge list into driver memory, so an operator-set
# SPARK_GRAFT_CC_DRIVER_MAX_EDGES could otherwise point a query path at
# an unbounded driver collect. 2M edges is ~32 MB of raw longs
# (hundreds of MB as driver Rows) and already past where the
# distributed loop wins; larger graphs always take the loop.
CC_DRIVER_MAX_EDGES_CEILING = 2_000_000
CC_DRIVER_MAX_EDGES = min(
    CC_DRIVER_MAX_EDGES_CEILING,
    int(
        os.environ.get(
            "SPARK_GRAFT_CC_DRIVER_MAX_EDGES", str(CC_EDGES_PER_PARTITION)
        )
    ),
)

# One cloned narrow session per (application, width), reused across CC
# calls: newSession() allocates JVM session state that is never
# explicitly releasable, so a fresh clone per call would leak one per
# invocation (2nd review pass). Width values are bounded by the session
# width, so this dict stays a handful of entries. Keys are application
# ids (strings — an id() key could pin a stopped context or be REUSED
# after GC for a different one); the lock closes the check-then-set
# race two concurrent CC calls would otherwise hit, each leaking a
# clone (3rd review pass).
_NARROW_SESSIONS: dict = {}
_NARROW_SESSIONS_LOCK = threading.Lock()


def _narrow_session(spark, width: int):
    """The shared clamped-width clone of ``spark`` (own SQLConf, shared
    context/blocks). Builder-level confs (AQE, timezone) are inherited
    from the context conf; the runtime confs the engine sets after
    session start (sources/tables.py) are re-mirrored on EVERY use —
    mirroring only at creation would freeze whatever the first caller
    had set (3rd review pass)."""
    key = (spark.sparkContext.applicationId, width)
    with _NARROW_SESSIONS_LOCK:
        # r16 ADVICE fix: evict clones whose SparkContext is stopped — a
        # long-lived driver creating contexts serially would otherwise
        # pin one session per dead application forever
        for k in [
            k
            for k, s in _NARROW_SESSIONS.items()
            if s.sparkContext._jsc is None
            or s.sparkContext._jsc.sc().isStopped()
        ]:
            del _NARROW_SESSIONS[k]
        narrow = _NARROW_SESSIONS.get(key)
        if narrow is None:
            narrow = spark.newSession()
            narrow.conf.set("spark.sql.shuffle.partitions", str(width))
            _NARROW_SESSIONS[key] = narrow
        for k in ("spark.sql.session.timeZone",
                  "spark.sql.legacy.parquet.nanosAsLong"):
            try:
                narrow.conf.set(k, spark.conf.get(k))
            except Exception:  # noqa: BLE001 - key absent in this build
                pass
    return narrow


def near_dup_edges_minhash_verified(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.8,
    fast_hash: bool = False,
) -> DataFrame:
    """(doc_a, doc_b) near-dup edges, the 100 TB shape: minhash band
    collisions generate candidates (bounded shuffle — k longs per doc),
    then the EXACT shingle Jaccard verifies each candidate with a
    per-pair ``array_intersect`` on the two docs' shingle arrays — no
    inverted-index self-join anywhere, so the hot-shingle quadratic
    blowup of the exact edge source can't happen. Recall equals the band
    recall at the threshold (8 bands x 4 rows: >98.5% at j=0.8, ~1.0 for
    the near-identical copies dedup actually targets); precision is
    exact.

    Round-7 measured fixes (this edge leg 4.7 -> 3.0 s best-of-3 at the
    sf1 stress set; the full minhash clustering 7.4 -> ~6.5 s):
    signatures + gram arrays come from ONE fused corpus pass
    (:func:`minhash_features_arrow` — separate materializes ran the
    tokenize/hash expression twice, ~0.9 s), and the candidate set is
    repartitioned before the verification join (~1.6 s): when the
    payload side broadcasts, no exchange re-spreads the AQE-coalesced
    band-join output, so the per-pair ``array_intersect`` was running
    on 2 tasks; the id-only repartition costs 16 bytes/pair."""
    feats = materialize(
        doc_minhash_features(spark, sf_dir, n=3, fast_hash=fast_hash)
    )
    cand = minhash_band_candidates(feats.select("doc_id", "sig")).repartition(
        spark.sparkContext.defaultParallelism
    )
    a = feats.select(F.col("doc_id").alias("doc_a"), F.col("gh_arr").alias("sh_a"))
    b = feats.select(F.col("doc_id").alias("doc_b"), F.col("gh_arr").alias("sh_b"))
    isect = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = isect.cast("double") / (F.size("sh_a") + F.size("sh_b") - isect)
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b")
    )


# -- adaptive edge-source selection (cost-based exact vs minhash) ---------

# Crossover threshold for choose_edge_source, in estimated candidate
# pairs per document. Set from measurement (r8): cpd ~28 at sf0.01 and
# ~267 at sf0.1 — densities where the exact shingle self-join is the
# faster plan — vs ~2,743 at the 10x-dup-clique stress set, where the
# exact join goes quadratic in the clique size. The r9 length filter
# narrowed the stress-side gap (exact pairs now ~7.3 s vs ~19 s before;
# minhash-verified edges still win there, 5.2 s banked for the whole
# clustering) without moving the crossover's sign at either measured
# density, so the threshold stands. 1,000 sits at the geometric middle
# of the measured gap; both real workloads clear it by >3x on their own
# side.
EDGE_SOURCE_CPD_THRESHOLD = 1000.0


def estimate_candidate_pairs_per_doc(
    spark: SparkSession,
    sf_dir: str,
    sample_target: int = 2000,
    seed: int = 42,
) -> float:
    """Sampled estimate of the exact shingle self-join's output size,
    per document: E[candidate pairs] / |docs|, where candidate pairs =
    sum over gram fingerprints of df*(df-1)/2 — the exact quantity the
    inverted-index join materializes and the reason that plan is
    quadratic in dup-clique size.

    Estimator: sample each doc independently with probability ``p``
    (sized so ~``sample_target`` docs survive), build the sampled grams
    with the cheap xxhash64 family (probe-internal — no oracle needs to
    mirror it), and scale the sampled collision mass by 1/p^2: a pair
    survives doc-sampling with probability exactly p^2, so
    sum(df_s*(df_s-1)) / p^2 is unbiased for sum(df*(df-1)). One small
    job over ~sample_target docs — measured ~1.3 s against the 50k-doc
    stress corpus, vs the ~15 s the right plan choice saves there — and
    cached per (corpus fingerprint, sample_target, seed) for the session
    (r9; r10 folded the documents.parquet mtime/size into the key so an
    in-place regeneration re-probes instead of serving a stale density):
    every caller after the first gets a dict lookup.
    """
    from gcp_map_reduce_spark.plans.probes import cached_probe, corpus_key

    return cached_probe(
        ("cpd", corpus_key(sf_dir, "documents"), sample_target, seed),
        lambda: _estimate_candidate_pairs_per_doc(
            spark, sf_dir, sample_target, seed
        ),
    )


def _estimate_candidate_pairs_per_doc(
    spark: SparkSession, sf_dir: str, sample_target: int, seed: int
) -> float:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    if n == 0:
        return 0.0
    p = min(1.0, sample_target / n)
    sample = docs.sample(fraction=p, seed=seed) if p < 1.0 else docs
    grams = gram_hash_arrays_for(sample, n=3, fast_hash=True).select(
        F.explode("gh_arr").alias("gh")
    )
    row = (
        grams.groupBy("gh")
        .agg(F.count("*").alias("df"))
        .agg(F.sum(F.expr("df * (df - 1)")).alias("m"))
        .collect()[0]
    )
    est_pairs = (row["m"] or 0) / (2.0 * p * p)
    return est_pairs / n


def choose_edge_source(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = EDGE_SOURCE_CPD_THRESHOLD,
    sample_target: int = 2000,
    seed: int = 42,
) -> str:
    """Cost-based exact-vs-minhash decision for the near-dup pair graph
    (the one plan choice the engine previously left to the caller):
    probe the corpus's candidate-pair density and return ``"exact"``
    below ``threshold`` (full-recall inverted-index join, the faster
    plan at low dup density) or ``"minhash"`` above it (banded
    candidates + exact verify, the bounded-shuffle plan that holds when
    dup cliques or sheer corpus size make the exact join quadratic).
    Pass ``edge_source="auto"`` / ``near_dup_source="auto"`` to
    :func:`dedup_clusters` / ``curated_corpus`` to apply it in place.
    """
    cpd = estimate_candidate_pairs_per_doc(
        spark, sf_dir, sample_target=sample_target, seed=seed
    )
    choice = "exact" if cpd < threshold else "minhash"
    log.info(
        "choose_edge_source: est candidate pairs/doc %.1f (threshold %.0f) -> %s",
        cpd,
        threshold,
        choice,
    )
    return choice


_CLUSTERS_ORACLE = f"""
WITH RECURSIVE {_gram_hashes_sql()},
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isect
  FROM grams a JOIN grams b ON a.gh = b.gh AND a.doc_id < b.doc_id
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
"""


def dedup_clusters(
    spark: SparkSession,
    sf_dir: str,
    edge_source: str = "auto",
    fast_hash: bool = False,
) -> DataFrame:
    """Connected components over the near-dup pair graph: every document
    in any >= 0.8-Jaccard pair gets a cluster id (the component's minimum
    doc_id) — the dedup ENDGAME: keep cluster_id == doc_id, drop the rest.

    ``edge_source`` picks where the pair graph comes from:

    - ``"auto"`` (default, r9): :func:`choose_edge_source` probes the
      corpus's candidate-pair density (sampled, ~1 small job, CACHED
      per sf_dir for the session) and picks between the two — the
      cost-based form of the SCALING.md crossover table, now cheap
      enough to be the default (the r8 auto-default was reverted only
      for the +0.3-0.5 s uncached probe cost per bench query);
    - ``"exact"`` (what the recursive-CTE oracle checks): the exact
      shingle inverted-index self-join (``dedup_ngram_jaccard``) —
      full recall, but quadratic in the hottest shingle's doc frequency;
    - ``"minhash"`` (the 100 TB plan): minhash band-collision candidates
      exactly verified per pair (``near_dup_edges_minhash_verified``) —
      bounded shuffle, recall = band recall (~1.0 for true copies).
      ``tests/test_dedup.py`` asserts both sources produce IDENTICAL
      clusterings at oracle scale.

    Recall caveat on the default (r9 advice): above the density
    threshold ``"auto"`` trades EXACT recall for bounded shuffle — a
    borderline pair (jaccard barely >= 0.8) can miss every minhash band
    and drop its edge, so the default output is band-recall, not the
    exact edge set, precisely when the corpus is dup-heavy. Equality of
    the two sources is asserted at oracle scale only. Callers for whom
    a missed borderline edge is a correctness bug (legal-hold dedup,
    eval-set decontamination) should pass ``edge_source="exact"`` and
    pay the quadratic worst case knowingly.

    Spark side is min-label propagation WITH pointer doubling: each round
    a node's label drops to the minimum of (its label, its neighbors'
    labels, its label's label). The label-chasing term halves chain depth
    every round, so convergence is O(log diameter) — a 10^6-document
    near-dup chain needs ~20 rounds, not 10^6 (plain neighbor-min is
    O(diameter) and would silently split long template chains if capped).
    The loop runs to an observed fixpoint (changed == 0; the driver sees
    only a scalar change count per round) and RAISES if MAX_CC_ROUNDS is
    hit — never returns a silently-unconverged clustering. The DuckDB
    oracle computes the same components via a recursive-CTE transitive
    closure — engine-independent agreement on an iterative algorithm's
    fixpoint. reach_size doubles as the component size.
    """
    if edge_source == "auto":
        edge_source = choose_edge_source(spark, sf_dir)
    if edge_source == "exact":
        edge_df = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    elif edge_source == "minhash":
        edge_df = near_dup_edges_minhash_verified(
            spark, sf_dir, fast_hash=fast_hash
        )
    else:
        raise ValueError(f"unknown edge_source: {edge_source!r}")
    return connected_components(edge_df).select(
        F.col("node").alias("doc_id"), "cluster_id", "reach_size"
    )


def connected_components(pairs: DataFrame) -> DataFrame:
    """Generic distributed connected components over an undirected edge
    list — (node, cluster_id, reach_size) for every node appearing in any
    pair. ``pairs`` is any DataFrame whose FIRST TWO columns are the edge
    endpoints (orderable, same type); cluster_id is the component's
    minimum node. This is the engine's reusable graph-clustering core
    (``dedup_clusters`` is it applied to near-dup pairs).

    Algorithm: min-label propagation WITH pointer doubling — see
    :func:`dedup_clusters` for the full complexity/termination notes.

    Frontier-restricted rounds (r15, verdict task 2): after the first
    full fold, each round's label-lookup side is restricted to the
    labels of (a) nodes whose label CHANGED last round and (b) those
    nodes' new label targets. That restriction is exact, not a
    heuristic — labels only decrease, so an unchanged neighbor's label
    was already folded in the round it last changed, and the chase term
    ``label(label(s))`` was folded at the round ``s`` acquired its
    current label (the target is a lookup key of that round by (b)) or
    when the target itself last changed (a). An empty frontier is
    therefore a global fixpoint. The payoff is scheduler-latency
    exposure, the suite's worst (r14 bank-flag adjudication in
    SCALING.md): the frontier shrinks geometrically, so the lookup side
    drops under the broadcast threshold after round 1 and the tail
    rounds run as broadcast joins — tiny shuffles, tasks in the
    hundreds-of-rows — instead of full-width shuffle rounds.
    """
    a, b = pairs.columns[:2]
    pairs = materialize(
        pairs.select(F.col(a).alias("doc_a"), F.col(b).alias("doc_b"))
    )
    # Driver fast path (r16): a graph under one shuffle partition's
    # worth of edges spends the loop's wall entirely on scheduler
    # latency (~4 jobs per round x 3+ rounds of hundred-row stages,
    # measured ~0.5-0.8 s at bench scale) — collect the materialized
    # pair list once and run path-halving union-find instead. The pair
    # count is known for free conceptually, but the loop needs it
    # anyway for its width clamp; both paths share the one count job.
    n_pairs = pairs.count()
    # mixed-width endpoint columns (e.g. doc_a int, doc_b long) take the
    # loop path, whose union widens both sides naturally — _cc_driver
    # builds its output schema from column 0 alone and would coerce or
    # fail on values drawn from a wider column 1 (r16 ADVICE fix)
    if 2 * n_pairs <= CC_DRIVER_MAX_EDGES and (
        pairs.schema[0].dataType == pairs.schema[1].dataType
    ):
        return _cc_driver(pairs)
    fwd = pairs.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
    rev = pairs.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d"))
    edges = materialize(fwd.union(rev))
    # Size the LOOP's shuffle width to the graph, not the session: AQE's
    # coalescer keeps parallelismFirst, so a 1k-edge label table still
    # shuffles across the full session width and every one of the loop's
    # ~5 stages/round pays a full-width scheduler round trip — the
    # measured wall variance of this operator under load (SCALING.md r15
    # adjudication). At 100 TB edge counts the clamp is a no-op and the
    # session width stands. The narrow width lives in a CLONED session
    # (newSession: own SQLConf, shared SparkContext and block manager),
    # never a set/restore on the caller's — mutating the shared conf
    # would race concurrent queries and nested CC calls (review catch).
    # The materialized edge blocks cross sessions via a global temp
    # view (dropped in the finally).
    spark = pairs.sparkSession
    # edges is fwd UNION ALL rev of the counted pair list — exactly
    # 2 x n_pairs rows; no second count job (r16)
    n_edges = 2 * n_pairs
    session_width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # width bucketed to the next power of two (r16 ADVICE fix): the
    # clone cache below is keyed on (application, width), so raw widths
    # could accumulate up to session-width distinct never-released
    # clones on a driver processing many graph sizes; pow2 tiers bound
    # it at ~log2(session width) entries. Rounding UP only — never past
    # the session width — so no graph gets fewer partitions than the
    # clamp intended, and partition count does not affect results.
    raw_width = max(1, -(-n_edges // CC_EDGES_PER_PARTITION))
    loop_width = min(session_width, 1 << (raw_width - 1).bit_length())
    small_graph = n_edges <= FRONTIER_BROADCAST_MAX
    if loop_width >= session_width:
        return _cc_loop(edges, small_graph)
    import uuid

    view = f"cc_edges_{uuid.uuid4().hex}"
    out_view = f"cc_out_{uuid.uuid4().hex}"
    narrow = _narrow_session(spark, loop_width)
    edges.createOrReplaceGlobalTempView(view)
    try:
        # coalesce (no shuffle: blocks are already materialized) so
        # per-round map sides read loop_width blocks, not the
        # session-width block count the first materialize produced
        edges = materialize(
            narrow.table(f"global_temp.{view}").coalesce(loop_width)
        )
        out = _cc_loop(edges, small_graph)
        # REBIND the (already materialized) result to the CALLER's
        # session via a global temp view round-trip: a DataFrame left
        # bound to the clone would silently run every downstream op
        # the caller adds (views, orderBys, unions) under the clone's
        # catalog and narrow width (2nd review pass). The extra
        # materialize is over the final labels table — small.
        out.createOrReplaceGlobalTempView(out_view)
        return materialize(spark.table(f"global_temp.{out_view}"))
    finally:
        spark.catalog.dropGlobalTempView(view)
        spark.catalog.dropGlobalTempView(out_view)


def _cc_driver(pairs: DataFrame) -> DataFrame:
    """Single-machine tail of :func:`connected_components` for graphs
    under ``CC_DRIVER_MAX_EDGES``: collect the (already materialized,
    driver-sized) pair list, label components with path-halving
    union-find rooted at each component's MINIMUM node (identical
    semantics to the distributed loop's min-label fixpoint — both are
    pinned against the same reference in
    tests/test_connected_components.py), and return the labels as one
    Arrow local relation (single record batch, no python-worker
    round-trips — the ``_ids_df`` lesson from the ANN tombstone path)."""
    import pandas as pd
    from pyspark.sql import types as T

    spark = pairs.sparkSession
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for row in pairs.collect():
        ra, rb = find(row[0]), find(row[1])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    labels = {x: find(x) for x in parent}
    sizes: dict = {}
    for root in labels.values():
        sizes[root] = sizes.get(root, 0) + 1
    nodes = list(labels)
    node_dt = pairs.schema[0].dataType
    schema = T.StructType(
        [
            T.StructField("node", node_dt),
            T.StructField("cluster_id", node_dt),
            T.StructField("reach_size", T.LongType()),
        ]
    )
    pdf = pd.DataFrame(
        {
            "node": nodes,
            "cluster_id": [labels[n] for n in nodes],
            "reach_size": [sizes[labels[n]] for n in nodes],
        }
    )
    log.info("connected_components: driver union-find over %d nodes", len(nodes))
    return spark.createDataFrame(pdf, schema=schema)


def _cc_loop(edges: DataFrame, small_graph: bool) -> DataFrame:
    """The pointer-doubling fixpoint loop of :func:`connected_components`
    (split out so the shuffle-width clamp wraps it in one try/finally).
    The returned DataFrame is materialized: its plan must execute under
    the loop's clamped shuffle width, not whatever the session conf says
    when the caller finally collects."""
    labels = edges.groupBy("s").agg(F.min("d").alias("label"))
    labels = materialize(
        labels.select("s", F.least(F.col("s"), F.col("label")).alias("label"))
    )
    frontier = labels  # round 1 folds EVERY label (the induction base)
    n_frontier = None  # unknown until the first round's change count
    rounds = 0
    while True:
        if rounds >= MAX_CC_ROUNDS:
            raise RuntimeError(
                f"connected_components did not converge in {MAX_CC_ROUNDS} rounds"
            )
        rounds += 1
        if n_frontier is None:
            lookup = labels.select(F.col("s").alias("ls"), "label")
            if small_graph:
                # label table rows <= edge rows: driver-sized, so even
                # the full first fold can run as a map-side join
                lookup = F.broadcast(lookup)
        else:
            # changed nodes + their new label targets — the only keys
            # whose labels can carry information not already folded
            keys = (
                frontier.select("s")
                .union(frontier.select(F.col("label").alias("s")))
                .distinct()
            )
            if n_frontier <= FRONTIER_BROADCAST_MAX:
                keys = F.broadcast(keys)
            lookup = labels.join(keys, "s").select(
                F.col("s").alias("ls"), "label"
            )
            if n_frontier <= FRONTIER_BROADCAST_MAX:
                # the lookup side is <= 2x frontier rows of two longs:
                # broadcasting it makes the wide join below map-side
                lookup = F.broadcast(lookup)
        # pointer doubling folded INTO the neighbor-min join: augmenting
        # the edge list with each node's (s -> label(s)) pseudo-edge makes
        # the neighbor-label min also cover label(label(s)) — one join +
        # one groupBy per round instead of separate neighbor and
        # label-chase joins (the union itself is shuffle-free)
        aug = edges.union(labels.select("s", F.col("label").alias("d")))
        neigh = (
            aug.select(F.col("s").alias("ns"), F.col("d").alias("nd"))
            .join(lookup, F.col("nd") == F.col("ls"))
            .groupBy("ns")
            .agg(F.min("label").alias("nlabel"))
        )
        new_label = F.least(
            F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
        )
        # change flag computed in the SAME pass (old label is already a
        # column here) — a separate updated-vs-old join per round would
        # double the per-round shuffle count
        updated = materialize(
            labels.join(neigh, labels.s == neigh.ns, "left").select(
                F.col("s"),
                new_label.alias("label"),
                (new_label < F.col("label")).alias("changed"),
            )
        )
        frontier = updated.filter("changed").select("s", "label")
        n_frontier = frontier.count()
        labels = updated.select("s", "label")
        if n_frontier == 0:
            break
    log.info("connected_components converged in %d rounds", rounds)
    comp = labels.select("s", F.col("label").alias("cluster_id"))
    sizes = comp.groupBy("cluster_id").agg(F.count("*").alias("reach_size"))
    return materialize(
        comp.join(sizes, "cluster_id")
        .select(F.col("s").alias("node"), "cluster_id", "reach_size")
    )


def dedup_clusters_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB clustering plan, registered in its own right: connected
    components over minhash-candidate edges (exactly verified per pair —
    ``near_dup_edges_minhash_verified``), checked against the SAME
    recursive-CTE oracle as ``dedup_clusters`` — the driver proves the
    scale path and the exact path agree on the full clustering, not just
    that the scale path runs."""
    return dedup_clusters(spark, sf_dir, edge_source="minhash")


# -- registered suites -----------------------------------------------------
#
# The pairwise near-dup operators and the two clustering edge sources stay
# as library API above; the driver-facing registrations consolidate them
# into tagged unions so the whole dedup ladder fits two rows of the
# driver's bounded (~50-query) correctness window. Every branch remains
# fully oracle-checked via its UNION ALL twin in the SQL.


@query(
    "dedup_pair_scores",
    oracle=f"""
SELECT 'ngram_jaccard' AS method, doc_a, doc_b, jaccard AS score
FROM ({_NGRAM_JACCARD_ORACLE})
UNION ALL
SELECT 'minhash', doc_a, doc_b, est_jaccard FROM ({_minhash_oracle()})
UNION ALL
SELECT 'simhash', doc_a, doc_b, CAST(hamming AS DOUBLE)
FROM ({_simhash_oracle()})
""",
)
def dedup_pair_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three pairwise near-dup detectors in one tagged union:
    exact shingle Jaccard (>= 0.8), MinHash-LSH estimated Jaccard
    (>= 0.7), and SimHash Hamming distance (<= 3, score = distance).
    Branches are independent single-responsibility plans (each banded /
    inverted-index shaped, never all-pairs); the union is a shuffle-free
    concatenation."""

    def norm(df: DataFrame, method: str, score) -> DataFrame:
        return df.select(
            F.lit(method).alias("method"),
            "doc_a",
            "doc_b",
            score.cast("double").alias("score"),
        )

    # one fused corpus pass (scan + per-token md5 + gram/signature
    # kernel) feeds BOTH the ngram and the minhash legs — separate
    # doc_gram_hash_arrays / minhash_signatures materializes paid the
    # scan and the JVM per-token hash twice (r9; the multi-consumer-
    # recompute class from the r8 audit, one level up). SimHash keeps
    # its own scan: its kernel hashes distinct WORDS, not gram arrays.
    feats = materialize(doc_minhash_features(spark, sf_dir))
    return (
        # "auto": this leg must run at EVERY density (tagged branch), so
        # the sampled probe picks full vs prefix-filtered per corpus —
        # both bit-identical (see dedup_ngram_jaccard's crossover notes)
        norm(
            dedup_ngram_jaccard(
                spark,
                sf_dir,
                prefix_filter="auto",
                arr=feats.select("doc_id", "gh_arr"),
            ),
            "ngram_jaccard",
            F.col("jaccard"),
        )
        .unionByName(
            norm(
                dedup_minhash(
                    spark, sf_dir, sig=feats.select("doc_id", "sig")
                ),
                "minhash",
                F.col("est_jaccard"),
            )
        )
        .unionByName(
            norm(dedup_simhash(spark, sf_dir), "simhash", F.col("hamming"))
        )
    )


@query(
    "dedup_clusters",
    oracle=f"""
WITH clusters AS ({_CLUSTERS_ORACLE})
SELECT 'exact' AS edge_source, doc_id, cluster_id, reach_size FROM clusters
UNION ALL
SELECT 'minhash', doc_id, cluster_id, reach_size FROM clusters
""",
)
def dedup_clusters_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components clustering from BOTH edge sources, tagged:
    the exact shingle self-join graph and the 100 TB minhash-verified
    candidate graph. The oracle emits the same recursive-CTE closure for
    both tags — the driver thereby proves the scale path and the exact
    path agree on the full clustering, not just that the scale path
    runs."""
    exact = dedup_clusters(spark, sf_dir, edge_source="exact")
    mh = dedup_clusters_minhash(spark, sf_dir)
    return exact.select(F.lit("exact").alias("edge_source"), "*").unionByName(
        mh.select(F.lit("minhash").alias("edge_source"), "*")
    )
