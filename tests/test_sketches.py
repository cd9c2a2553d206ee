"""Mergeable HLL sketch rollups: per-group estimates must sit inside the
sketch's error envelope of the exact answers, and the union-of-sketches
global estimate must equal the direct single-pass global estimate —
merging may lose nothing (the property the 100 TB shard-manifest
architecture rests on)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_map_reduce_spark.operators.sketches import (
    HLL_LG_K,
    lang_token_sketches,
    token_stream,
    union_distinct_estimate,
)
from tests.conftest import SF_ORACLE

# lg_k = 14 -> RSE ~ 1.04/sqrt(2^14) ~ 0.8%; 5 sigma with margin
TOL = 0.05


def test_per_lang_estimates_within_error_envelope(spark):
    exact = {
        r.lang: r.n
        for r in token_stream(spark, SF_ORACLE)
        .groupBy("lang")
        .agg(F.countDistinct("word").alias("n"))
        .collect()
    }
    est = {r.lang: r.est for r in lang_token_sketches(spark, SF_ORACLE).collect()}
    assert set(est) == set(exact)
    for lang, n in exact.items():
        assert abs(est[lang] - n) <= max(TOL * n, 3), (lang, est[lang], n)


def test_union_of_sketches_equals_single_pass_global_sketch(spark):
    sketches = lang_token_sketches(spark, SF_ORACLE)
    merged = union_distinct_estimate(sketches)
    direct = float(
        token_stream(spark, SF_ORACLE)
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("word", F.lit(HLL_LG_K))
            ).alias("est")
        )
        .first()
        .est
    )
    # identical sketch parameters + identical input set -> identical
    # registers regardless of grouping, so the estimates must be EQUAL
    assert merged == direct
    exact = token_stream(spark, SF_ORACLE).select("word").distinct().count()
    assert abs(merged - exact) <= max(TOL * exact, 3)


def test_token_rarity_scores_match_python_oracle(spark):
    """Rarity signals vs a trivially-correct Python recomputation over
    the same tokenization (exact integer ratios — equality, not
    tolerance)."""
    from collections import Counter, defaultdict

    from gcp_map_reduce_spark.operators.text_analysis import (
        token_rarity_scores,
    )
    from gcp_map_reduce_spark.functions.text import tokenize
    from gcp_map_reduce_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    toks = [
        (r.doc_id, r.word)
        for r in tokenize(
            docs, text_col="text", out_col="word", keep_cols=["doc_id"]
        ).collect()
    ]
    freq = Counter(w for _, w in toks)
    per_doc = defaultdict(list)
    for d, w in toks:
        per_doc[d].append(freq[w])

    got = {
        r.doc_id: (r.n_tokens, r.mean_token_freq, r.rare_ratio)
        for r in token_rarity_scores(spark, SF_ORACLE).collect()
    }
    assert set(got) == set(per_doc)
    for d, fs in per_doc.items():
        n, mean, rare = got[d]
        assert n == len(fs)
        assert mean == sum(fs) / len(fs)
        assert rare == sum(1 for f in fs if f <= 2) / len(fs)
