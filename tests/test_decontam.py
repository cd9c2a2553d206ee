"""Semantic tests for benchmark decontamination (the oracle covers exact
values at sf0.01; these pin the properties)."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def test_decontamination_flags_planted_eval_near_dups(spark):
    from gcp_map_reduce_spark.operators.dedup import dedup_ngram_jaccard
    from gcp_map_reduce_spark.operators.decontam import (
        EVAL_MOD,
        corpus_decontamination,
    )

    flagged = {
        r["train_doc"]: r
        for r in corpus_decontamination(spark, SF_ORACLE).collect()
    }
    # ground truth from the (oracle-checked) exact near-dup operator:
    # every >= 0.8-jaccard train/eval pair means the train doc shares
    # 5-grams with the eval doc and MUST be flagged
    pairs = dedup_ngram_jaccard(spark, SF_ORACLE).collect()
    expected = set()
    for r in pairs:
        a_eval, b_eval = r["doc_a"] % EVAL_MOD == 0, r["doc_b"] % EVAL_MOD == 0
        if a_eval != b_eval:  # one side in eval, other in train
            expected.add(r["doc_b"] if a_eval else r["doc_a"])
    assert expected, "fixture should contain a train/eval near-dup pair"
    assert expected <= set(flagged), (expected, set(flagged))
    for doc in expected:
        assert flagged[doc]["n_shared_shingles"] > 0
        assert flagged[doc]["sample_eval_doc"] % EVAL_MOD == 0


def test_decontamination_broadcasts_eval_side(spark):
    import contextlib
    import io

    from gcp_map_reduce_spark.operators.decontam import corpus_decontamination

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        corpus_decontamination(spark, SF_ORACLE).explain("formatted")
    plan = buf.getvalue()
    # the tiny eval shingle set must be the broadcast side; the train
    # corpus must not shuffle for the membership join
    assert "BroadcastHashJoin" in plan
