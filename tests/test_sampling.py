"""Semantic tests for deterministic sampling/mixing/sharding (the oracle
covers exact values; these cover the properties that make the operators
trustworthy at scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_mixture_is_repartition_invariant(spark):
    from gcp_map_reduce_spark.operators.sampling import corpus_mixture

    base = {r["doc_id"] for r in corpus_mixture(spark, SF_ORACLE).collect()}
    assert base
    # df.sample() would change under a different partitioning; the hash
    # gate must not
    reparted = {
        r["doc_id"]
        for r in corpus_mixture(spark, SF_ORACLE)
        .repartition(7, "lang")
        .collect()
    }
    assert reparted == base


def test_mixture_rates_are_respected(spark):
    from gcp_map_reduce_spark.operators.sampling import (
        MIXTURE_PERMILLE,
        corpus_mixture,
    )
    from gcp_map_reduce_spark.sources.tables import load_table

    total = {
        r["lang"]: r["n"]
        for r in load_table(spark, SF_ORACLE, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    kept = {
        r["lang"]: r["n"]
        for r in corpus_mixture(spark, SF_ORACLE)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, pm in MIXTURE_PERMILLE.items():
        if pm == 1000:
            assert kept.get(lang) == total[lang], lang  # keep-all is exact
        else:
            # hash buckets are uniform: observed rate within a loose
            # binomial band around pm/1000 (small n per lang)
            rate = kept.get(lang, 0) / total[lang]
            assert abs(rate - pm / 1000) < 0.2, (lang, rate, pm)


def test_shards_respect_budget_and_cover_mixture(spark):
    from gcp_map_reduce_spark.operators.sampling import (
        SHARD_TOKEN_BUDGET,
        corpus_mixture,
        corpus_shards,
    )

    shards = corpus_shards(spark, SF_ORACLE).orderBy("shard_id").collect()
    assert shards
    mix = corpus_mixture(spark, SF_ORACLE)
    n_docs = mix.count()
    total_tokens = mix.agg(F.sum("n_tokens")).collect()[0][0]
    assert sum(r["n_docs"] for r in shards) == n_docs
    assert sum(r["shard_tokens"] for r in shards) == total_tokens
    # consecutive doc ranges, no overlap
    for prev, nxt in zip(shards, shards[1:]):
        assert prev["last_doc"] < nxt["first_doc"]
    # every shard except the last holds >= budget tokens only via its one
    # straggler doc: cum_before-based packing means a shard's tokens
    # minus its last doc is < budget
    for r in shards[:-1]:
        assert r["shard_tokens"] >= SHARD_TOKEN_BUDGET * 0.5  # non-degenerate


def test_scalable_cumsum_matches_single_window(spark):
    from gcp_map_reduce_spark.operators.sampling import (
        corpus_shards,
        corpus_shards_simple,
    )

    simple = {
        tuple(r) for r in corpus_shards_simple(spark, SF_ORACLE).collect()
    }
    registered = {tuple(r) for r in corpus_shards(spark, SF_ORACLE).collect()}
    assert registered == simple


def test_stratified_sample_exact_k_and_split_independence(spark):
    from gcp_map_reduce_spark.operators.sampling import (
        STRATA_K,
        corpus_stratified_sample,
    )

    rows = corpus_stratified_sample(spark, SF_ORACLE).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    # exactly K per language (every language has > K docs in the fixture)
    assert all(len(v) == STRATA_K for v in by_lang.values()), {
        k: len(v) for k, v in by_lang.items()
    }
    # all three splits appear — the independently-salted split hash must
    # not collapse the sample into one region
    splits = {r["split"] for r in rows}
    assert splits == {"train", "val", "test"}, splits
    # deterministic across invocations
    again = corpus_stratified_sample(spark, SF_ORACLE).collect()
    assert {(r["doc_id"], r["split"]) for r in rows} == {
        (r["doc_id"], r["split"]) for r in again
    }


def test_pack_sequences_manifest_invariants(spark):
    """Sequence packing must tile the concatenated token stream exactly:
    validated against a trivially-correct Python re-implementation over
    the same mixture sample, plus structural invariants (full sequences,
    contiguous segments, per-doc slice reassembly)."""
    from gcp_map_reduce_spark.operators.sampling import (
        corpus_mixture,
        pack_sequences,
    )

    L = 256
    rows = pack_sequences(spark, SF_ORACLE, seq_len=L).collect()
    mix = sorted(
        (r.doc_id, r.n_tokens)
        for r in corpus_mixture(spark, SF_ORACLE).collect()
        if r.n_tokens > 0
    )

    # Python oracle: lay out docs in doc_id order, cut at multiples of L
    expect = []
    cum = 0
    for doc_id, n in mix:
        start, end = cum, cum + n
        s = start
        while s < end:
            seq_id = s // L
            e = min((seq_id + 1) * L, end)
            expect.append((doc_id, seq_id, s - seq_id * L, s - start, e - s))
            s = e
        cum = end
    got = sorted((r.doc_id, r.seq_id, r.seq_offset, r.doc_offset, r.seg_tokens) for r in rows)
    assert got == sorted(expect)

    # structural: every sequence except the last is exactly full
    total = sum(n for _, n in mix)
    per_seq = {}
    for _, seq_id, _, _, seg in got:
        per_seq[seq_id] = per_seq.get(seq_id, 0) + seg
    last = max(per_seq)
    assert all(v == L for s, v in per_seq.items() if s != last)
    assert per_seq[last] == total - last * L

    # per-doc slices reassemble the doc exactly once
    per_doc = {}
    for doc_id, _, _, _, seg in got:
        per_doc[doc_id] = per_doc.get(doc_id, 0) + seg
    assert per_doc == {d: n for d, n in mix}


def test_weighted_sample_determinism_and_rates(spark):
    """Quality-weighted hash sampling: deterministic across runs and
    repartitionings, keep rate tracks the weight, weight >= 1/rate keeps
    everything, weight 0 drops everything."""
    from pyspark.sql import functions as F

    from gcp_map_reduce_spark.operators.sampling import weighted_sample

    df = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        # three weight tiers: 0, 1, 5 (with base_rate 0.2 -> 0%, 20%, 100%)
        F.when(F.col("id") % 3 == 0, 0.0)
        .when(F.col("id") % 3 == 1, 1.0)
        .otherwise(5.0)
        .alias("w"),
    )
    kept = weighted_sample(df, "doc_id", "w", base_rate=0.2)
    rows = kept.collect()
    by_tier = {0: 0, 1: 0, 2: 0}
    for r in rows:
        by_tier[r.doc_id % 3] += 1
    n_tier = 20_000 // 3
    assert by_tier[0] == 0  # weight 0 never survives
    assert by_tier[2] >= n_tier  # weight*rate >= 1 always survives
    assert 0.15 * n_tier <= by_tier[1] <= 0.25 * n_tier  # ~20%

    again = {r.doc_id for r in weighted_sample(
        df.repartition(17), "doc_id", "w", base_rate=0.2
    ).collect()}
    assert again == {r.doc_id for r in rows}
