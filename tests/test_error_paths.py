"""Error-path contracts: misuse must fail loudly with actionable
messages, not silently compute something else (the reference's
bare-except-to-sentinel-string pattern, scripts/kv_store_server.py:84-87,
is the anti-model)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def test_load_table_unknown_name_lists_known(spark):
    from gcp_map_reduce_spark.sources.tables import load_table

    with pytest.raises(KeyError, match="unknown table.*region"):
        load_table(spark, SF_SMALL, "no_such_table")


def test_registry_rejects_duplicate_names():
    from gcp_map_reduce_spark.plans.registry import query

    with pytest.raises(ValueError, match="duplicate query name"):
        # 'wordcount' is already registered by the catalog import
        from gcp_map_reduce_spark.plans import registry

        registry.load_catalog()

        @query("wordcount")
        def _dup(spark, sf_dir):  # pragma: no cover
            raise AssertionError


def test_dedup_clusters_unknown_edge_source(spark):
    from gcp_map_reduce_spark.operators.dedup import dedup_clusters

    with pytest.raises(ValueError, match="unknown edge_source"):
        dedup_clusters(spark, SF_SMALL, edge_source="bogus")


def test_curated_corpus_unknown_near_dup_source(spark):
    from gcp_map_reduce_spark.operators.pipeline import curated_corpus

    with pytest.raises(ValueError, match="unknown near_dup_source"):
        curated_corpus(spark, SF_SMALL, near_dup_source="bogus")


def test_udf_registry_rejects_duplicates():
    import pyspark.sql.types as T

    from gcp_map_reduce_spark.operators.udf_plugin import (
        GroupedMapUDF,
        register_udf,
    )

    with pytest.raises(ValueError, match="duplicate UDF"):
        register_udf(
            GroupedMapUDF(
                name="wordcount_grouped",  # already registered at import
                schema=T.StructType([]),
                fn=lambda k, p: p,
            )
        )


def test_codec_registry_unknown_modality():
    from gcp_map_reduce_spark.operators.multimodal import decode_media

    with pytest.raises(KeyError, match="no codec registered.*text-as-bytes"):
        decode_media(b"x", "jpeg")


def test_asof_join_rejects_reserved_column_names(spark):
    from gcp_map_reduce_spark.operators.relational_ext import asof_join

    left = spark.createDataFrame([(1, 10, "x")], "k bigint, t bigint, _src string")
    right = spark.createDataFrame([(1, 5, 1.0)], "k bigint, t bigint, v double")
    with pytest.raises(ValueError, match="collide with internal names"):
        asof_join(left, right, by="k", on="t", right_cols=["v"])


def test_asof_join_rejects_shared_column_type_mismatch(spark):
    from gcp_map_reduce_spark.operators.relational_ext import asof_join

    left = spark.createDataFrame([(1, 10)], "k bigint, t bigint")
    right = spark.createDataFrame([(1, "5", 1.0)], "k bigint, t string, v double")
    with pytest.raises(TypeError, match="differ in type"):
        asof_join(left, right, by="k", on="t", right_cols=["v"])
