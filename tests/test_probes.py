"""Session-scoped probe cache (r9): the density probes behind the
cost-based plan choosers must fire ONCE per (probe, sf_dir, params) and
hand every later caller a dict lookup — the property that makes
``auto`` cheap enough to be the default (the r8 auto-default was
reverted for the +0.3-0.5 s uncached probe cost per bench query)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE


@pytest.fixture(autouse=True)
def _fresh_cache():
    from gcp_map_reduce_spark.plans import probes

    probes.clear()
    yield
    probes.clear()


def test_cached_probe_unit_semantics():
    from gcp_map_reduce_spark.plans.probes import STATS, cached_probe, clear

    calls = []

    def compute():
        calls.append(1)
        return 42.0

    h0, m0 = STATS["hits"], STATS["misses"]
    assert cached_probe(("k", "a"), compute) == 42.0
    assert cached_probe(("k", "a"), compute) == 42.0
    assert cached_probe(("k", "b"), compute) == 42.0
    assert len(calls) == 2  # one per distinct key
    assert STATS["misses"] - m0 == 2 and STATS["hits"] - h0 == 1
    clear()
    assert cached_probe(("k", "a"), compute) == 42.0
    assert len(calls) == 3


def test_candidate_pair_probe_fires_once(spark):
    from gcp_map_reduce_spark.operators.dedup import (
        estimate_candidate_pairs_per_doc,
    )
    from gcp_map_reduce_spark.plans.probes import STATS

    m0, h0 = STATS["misses"], STATS["hits"]
    a = estimate_candidate_pairs_per_doc(spark, SF_ORACLE)
    b = estimate_candidate_pairs_per_doc(spark, SF_ORACLE)
    assert a == b and a > 0
    assert STATS["misses"] - m0 == 1 and STATS["hits"] - h0 == 1
    # different sampling params are a different estimate -> new key
    estimate_candidate_pairs_per_doc(spark, SF_ORACLE, seed=7)
    assert STATS["misses"] - m0 == 2


def test_band_candidate_probe_fires_once_and_custom_relation_bypasses(spark):
    from gcp_map_reduce_spark.operators.similarity import (
        embed_features_arrow,
        estimate_band_candidates_per_vec,
    )
    from gcp_map_reduce_spark.sources.tables import load_table
    from gcp_map_reduce_spark.plans.probes import STATS

    m0, h0 = STATS["misses"], STATS["hits"]
    a = estimate_band_candidates_per_vec(spark, SF_ORACLE)
    b = estimate_band_candidates_per_vec(spark, SF_ORACLE)
    assert a == b
    assert STATS["misses"] - m0 == 1 and STATS["hits"] - h0 == 1
    # caller-supplied sketches have no stable cache key -> bypass
    emb = load_table(spark, SF_ORACLE, "embeddings").limit(50)
    sk = embed_features_arrow(emb).select("vec_id", "sketch")
    estimate_band_candidates_per_vec(spark, SF_ORACLE, sketches=sk)
    assert STATS["misses"] - m0 == 1 and STATS["hits"] - h0 == 1


def test_auto_defaults_share_one_probe_job(spark):
    """dedup_clusters and curated_corpus both default to
    edge_source='auto' (r9); building BOTH plans must run the sampled
    density job at most once."""
    from gcp_map_reduce_spark.operators.dedup import dedup_clusters
    from gcp_map_reduce_spark.operators.pipeline import curated_corpus
    from gcp_map_reduce_spark.plans.probes import STATS

    m0 = STATS["misses"]
    dedup_clusters(spark, SF_ORACLE)  # plan construction triggers probe
    curated_corpus(spark, SF_ORACLE)
    assert STATS["misses"] - m0 == 1
