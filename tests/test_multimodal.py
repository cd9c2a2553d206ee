"""Unit tests for the multimodal binary-column plumbing (no SQL oracle for
the pandas feature path — verify against direct Python computation)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def test_fake_features_match_python_ground_truth(spark):
    from gcp_map_reduce_spark.operators.multimodal import multimodal_features
    from gcp_map_reduce_spark.sources.tables import load_table

    feats = {
        r["doc_id"]: r for r in multimodal_features(spark, SF_SMALL).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMALL, "documents").collect()
    }
    assert set(feats) == set(docs)
    for doc_id, text in list(docs.items())[:25]:
        b = text.encode("utf-8")
        row = feats[doc_id]
        assert row["n_bytes"] == len(b)
        assert row["first_byte"] == (b[0] if b else -1)
        assert row["last_byte"] == (b[-1] if b else -1)
        assert row["byte_sum_mod"] == sum(b) % 997
        assert row["mean_byte"] == pytest.approx(sum(b) / len(b) if b else 0.0)


def test_binary_table_schema(spark):
    from gcp_map_reduce_spark.operators.multimodal import build_binary_table

    bt = build_binary_table(spark, SF_SMALL)
    dt = dict(bt.dtypes)
    assert dt["payload"] == "binary"
    assert dt["meta"].startswith("struct<modality:string,n_bytes:int")


def test_decode_media_is_stubbed():
    from gcp_map_reduce_spark.operators.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image")
