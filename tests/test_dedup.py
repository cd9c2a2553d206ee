"""Semantic tests for the non-oracle dedup operators: MinHash-LSH and
SimHash are approximations — verify them against the exact n-gram Jaccard
operator (which IS oracle-checked) instead of an SQL oracle."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def _pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_minhash_recall_vs_exact(spark):
    from gcp_map_reduce_spark.operators.dedup import (
        dedup_minhash,
        dedup_ngram_jaccard,
    )

    exact = _pairs(dedup_ngram_jaccard(spark, SF_ORACLE))  # jaccard >= 0.8
    approx = _pairs(dedup_minhash(spark, SF_ORACLE))  # est_jaccard >= 0.7
    assert exact, "fixture should contain planted near-duplicates"
    # With b=8,r=4 bands, P(candidate | j>=0.8) ~ 1-(1-0.8^4)^8 ~ 0.988 per
    # pair; the planted dups are j~0.99 where recall is ~1. Require >= 90%.
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, (recall, len(exact), len(approx))


def test_simhash_engines_bit_identical(spark):
    """The Arrow fingerprint kernel (cached md5 per distinct word +
    numpy sign votes) must produce bit-equal 60-bit fingerprints to the
    60-column aggregate spec for every doc — votes are exact integer
    sums, so any divergence is a normalize/hash parity bug."""
    from gcp_map_reduce_spark.operators.dedup import simhash_fingerprints

    a = {
        r.doc_id: r.simhash
        for r in simhash_fingerprints(spark, SF_ORACLE, engine="expr").collect()
    }
    b = {
        r.doc_id: r.simhash
        for r in simhash_fingerprints(spark, SF_ORACLE, engine="arrow").collect()
    }
    assert a and a == b


def test_ngram_jaccard_prefix_filter_is_exact(spark):
    """The AllPairs prefix-filtered plan must return the IDENTICAL rows
    (pairs, isect, jaccard doubles) as the full inverted-index self-join
    — prefix filtering is a candidate-pruning bound, never a semantics
    change. Which form runs is the measured dup-density crossover in the
    docstring."""
    from gcp_map_reduce_spark.operators.dedup import dedup_ngram_jaccard

    full = dedup_ngram_jaccard(spark, SF_ORACLE, prefix_filter=False)
    pref = dedup_ngram_jaccard(spark, SF_ORACLE, prefix_filter=True)
    # schema must not vary with the prefix_filter='auto' density probe:
    # direct callers writing parquet / unioning results would hit drift
    # if the prefix branch emitted isect as int (r8 advice). Nullability
    # legitimately differs (count(*) is non-null, size(intersect) is
    # nullable) and affects neither parquet nor unions — pin name+type.
    shape = lambda df: [(f.name, f.dataType) for f in df.schema]  # noqa: E731
    assert shape(full) == shape(pref), (full.schema, pref.schema)
    assert full.count() > 0
    assert full.exceptAll(pref).count() == 0
    assert pref.exceptAll(full).count() == 0


def test_simhash_finds_planted_dups(spark):
    from gcp_map_reduce_spark.operators.dedup import (
        dedup_ngram_jaccard,
        dedup_simhash,
    )

    exact = _pairs(dedup_ngram_jaccard(spark, SF_ORACLE))
    sim = _pairs(dedup_simhash(spark, SF_ORACLE))
    assert exact
    # SimHash at hamming<=3 is conservative; it should still find a
    # meaningful share of the ~0.99-jaccard planted dups and not explode.
    assert len(sim & exact) >= max(1, len(exact) // 3), (len(sim & exact), len(exact))


def test_minhash_signatures_shape(spark):
    from gcp_map_reduce_spark.operators.dedup import NUM_HASHES, minhash_signatures

    sig = minhash_signatures(spark, "/root/testdata/sf0.001")
    assert sig.columns == ["doc_id", "sig"]
    row = sig.limit(1).collect()[0]
    assert len(row["sig"]) == NUM_HASHES
    assert all(isinstance(h, int) for h in row["sig"])


def test_minhash_arrow_kernel_bit_identical_to_hof(spark):
    """The vectorized Arrow signature kernel must reproduce the
    higher-order-function reference EXACTLY (same rolling-gram + affine
    min arithmetic in numpy int64) — the oracle's value-hash gate rides
    on this equivalence."""
    from gcp_map_reduce_spark.operators.dedup import (
        gram_hash_arrays_for,
        minhash_signatures,
        minhash_signatures_for,
    )
    from gcp_map_reduce_spark.sources.tables import load_table

    d = "/root/testdata/sf0.01"
    docs = load_table(spark, d, "documents").select("doc_id", "text")
    for fast in (False, True):
        ref = minhash_signatures_for(
            gram_hash_arrays_for(docs, n=3, fast_hash=fast)
        )
        got = minhash_signatures(spark, d, fast_hash=fast)
        assert ref.exceptAll(got).count() == 0
        assert got.exceptAll(ref).count() == 0


def test_minhash_fused_features_kernel_matches_single_kernels(spark):
    """The fused (sig, gh_arr) kernel powering the verified-edge plan
    must reproduce the two single-purpose kernels column-for-column —
    one corpus pass replaces two, and this gate is what makes the fusion
    safe to keep."""
    from gcp_map_reduce_spark.operators.dedup import (
        doc_gram_hash_arrays,
        doc_minhash_features,
        minhash_signatures,
    )

    d = "/root/testdata/sf0.01"
    for fast in (False, True):
        feats = {
            r.doc_id: (tuple(r.sig), tuple(r.gh_arr))
            for r in doc_minhash_features(spark, d, fast_hash=fast).collect()
        }
        sig = {
            r.doc_id: tuple(r.sig)
            for r in minhash_signatures(spark, d, fast_hash=fast).collect()
        }
        arrs = {
            r.doc_id: tuple(r.gh_arr)
            for r in doc_gram_hash_arrays(spark, d, fast_hash=fast).collect()
        }
        assert feats and set(feats) == set(sig) == set(arrs)
        for k, (s, g) in feats.items():
            assert s == sig[k] and g == arrs[k], k


def test_minhash_fast_hash_mode_agrees_on_pairs(spark):
    from gcp_map_reduce_spark.operators.dedup import dedup_minhash

    # the bench/production path (xxhash64) and the oracle-portable path
    # (md5) are different hash families, so est_jaccard values differ in
    # the tail — but the near-dup PAIR SET they surface must agree on the
    # planted ~0.99-jaccard duplicates
    portable = _pairs(dedup_minhash(spark, SF_ORACLE))
    fast = _pairs(dedup_minhash(spark, SF_ORACLE, fast_hash=True))
    assert portable
    agree = len(portable & fast) / len(portable)
    assert agree >= 0.9, (agree, len(portable), len(fast))


def test_minhash_edge_source_matches_exact_clustering(spark):
    from gcp_map_reduce_spark.operators.dedup import (
        dedup_clusters,
        dedup_ngram_jaccard,
        near_dup_edges_minhash_verified,
    )

    # the scale-path edge set must equal the exact one here (planted dups
    # are j~0.99 where band recall is ~1; precision is exact by the
    # per-pair verification)
    exact_edges = _pairs(dedup_ngram_jaccard(spark, SF_ORACLE))
    mh_edges = _pairs(near_dup_edges_minhash_verified(spark, SF_ORACLE))
    assert mh_edges == exact_edges, (
        exact_edges - mh_edges,
        mh_edges - exact_edges,
    )

    # and therefore the clusterings are identical
    def clustering(edge_source):
        return {
            (r["doc_id"], r["cluster_id"], r["reach_size"])
            for r in dedup_clusters(
                spark, SF_ORACLE, edge_source=edge_source
            ).collect()
        }

    assert clustering("minhash") == clustering("exact")


def test_curated_corpus_minhash_source_matches_exact(spark):
    from gcp_map_reduce_spark.operators.pipeline import curated_corpus

    exact = {
        tuple(r) for r in curated_corpus(spark, SF_ORACLE).collect()
    }
    minhash = {
        tuple(r)
        for r in curated_corpus(
            spark, SF_ORACLE, near_dup_source="minhash", fast_hash=True
        ).collect()
    }
    assert exact
    assert minhash == exact


def test_dedup_clusters_invariants(spark):
    from gcp_map_reduce_spark.operators.dedup import (
        dedup_clusters,
        dedup_ngram_jaccard,
    )

    rows = dedup_clusters(spark, "/root/testdata/sf0.01").collect()
    assert rows
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, members in by_cluster.items():
        # the cluster id IS the minimum member (canonical keeper)
        assert cid == min(members)
        assert len(members) >= 2  # singletons have no near-dup pair
    # node set == docs appearing in at least one pair
    pairs = dedup_ngram_jaccard(spark, "/root/testdata/sf0.01").collect()
    in_pairs = {r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs}
    assert {r["doc_id"] for r in rows} == in_pairs


def test_choose_edge_source_probe_and_decision(spark, tmp_path):
    """The adaptive edge-source chooser must (a) estimate the exact
    plan's candidate-pair density within a reasonable band of the true
    value, and (b) flip exact -> minhash between natural-density and
    dup-clique-density corpora."""
    from pyspark.sql import functions as F

    from gcp_map_reduce_spark.operators.dedup import (
        choose_edge_source,
        estimate_candidate_pairs_per_doc,
        gram_hash_arrays_for,
    )
    from tests.conftest import SF_ORACLE

    # (a) full-sample probe (p = 1) equals the true collision mass
    docs = spark.read.parquet(SF_ORACLE + "/documents.parquet").select(
        "doc_id", "text"
    )
    true_pairs = (
        gram_hash_arrays_for(docs, n=3, fast_hash=True)
        .select(F.explode("gh_arr").alias("gh"))
        .groupBy("gh")
        .agg(F.count("*").alias("df"))
        .agg(F.sum(F.expr("df * (df - 1) / 2")).alias("m"))
        .collect()[0]["m"]
    )
    n = docs.count()
    est = estimate_candidate_pairs_per_doc(spark, SF_ORACLE, sample_target=n)
    assert abs(est - true_pairs / n) < 1e-6, (est, true_pairs / n)

    # (b) natural density -> exact
    assert choose_edge_source(spark, SF_ORACLE) == "exact"

    # dense dup cliques (50 base texts x 60 byte-identical copies) -> the
    # exact join's per-doc candidate mass blows past the threshold
    base = [
        " ".join(f"tok{b}w{i}" for i in range(100)) for b in range(50)
    ]
    dense = spark.createDataFrame(
        [(b * 60 + c, base[b]) for b in range(50) for c in range(60)],
        "doc_id bigint, text string",
    )
    dense_dir = str(tmp_path / "dense")
    dense.write.parquet(dense_dir + "/documents.parquet")
    assert choose_edge_source(spark, dense_dir) == "minhash"


def test_fused_text_kernel_bit_equal_to_expr_front_half(spark):
    """r17: the fused text->features kernel (normalize+tokenize+md5 in
    Python, md5 per DISTINCT token) must be BIT-identical to the r16
    shape (JVM _token_hash_expr front half + th_arr kernel) — same
    rows, same sig vectors, same sorted gram arrays."""
    from gcp_map_reduce_spark.operators.dedup import (
        _token_hash_expr,
        doc_text_features_arrow,
        minhash_features_arrow,
    )
    from gcp_map_reduce_spark.sources.tables import load_table
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    old = minhash_features_arrow(
        docs.select("doc_id", _token_hash_expr(False).alias("th_arr")), 3
    )
    new = doc_text_features_arrow(docs, 3)
    a = {r["doc_id"]: (list(r["sig"]), list(r["gh_arr"])) for r in old.collect()}
    b = {r["doc_id"]: (list(r["sig"]), list(r["gh_arr"])) for r in new.collect()}
    assert a == b and len(a) > 0


def test_fused_text_kernel_drops_null_and_short_docs(spark, tmp_path):
    from gcp_map_reduce_spark.operators.dedup import doc_text_features_arrow

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, None), (2, "one two"), (3, "")],
        "doc_id bigint, text string",
    )
    rows = doc_text_features_arrow(docs, 3).collect()
    assert [r["doc_id"] for r in rows] == [0]
