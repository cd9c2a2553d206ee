"""Roundtrip tests for the format-pluggable IO layer: write then read in
each format must reproduce the data exactly under the declared schema."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_map_reduce_spark.sources.formats import read_any, write_any
from gcp_map_reduce_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def _orders_slice(spark):
    return (
        load_table(spark, SF_ORACLE, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(200)
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, tmp_path, fmt):
    df = _orders_slice(spark)
    path = str(tmp_path / f"rt_{fmt}")
    write_any(df, path, fmt)
    schema = (
        "o_orderkey bigint, o_custkey bigint, "
        "o_orderstatus string, o_totalprice double"
    )
    back = read_any(spark, path, fmt, schema=schema)
    assert back.schema == df.schema
    a = {tuple(r) for r in df.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_partitioned_write_prunes(spark, tmp_path):
    df = _orders_slice(spark)
    path = str(tmp_path / "parted")
    write_any(df, path, "parquet", partition_cols=["o_orderstatus"])
    back = read_any(spark, path, "parquet")
    got = back.filter(F.col("o_orderstatus") == "F")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1].split("\n")[0]
    want = df.filter(F.col("o_orderstatus") == "F").count()
    assert got.count() == want


def test_schema_required_for_csv_json(spark, tmp_path):
    df = _orders_slice(spark)
    path = str(tmp_path / "noschema")
    write_any(df, path, "csv")
    with pytest.raises(ValueError, match="explicit schema"):
        read_any(spark, path, "csv")


def test_orc_predicate_pushdown(spark, tmp_path):
    """ORC is a pushdown-capable columnar format like parquet — a filter
    must reach the ORC scan, not evaluate post-read."""
    df = _orders_slice(spark)
    path = str(tmp_path / "orc_pd")
    write_any(df, path, "orc")
    got = read_any(spark, path, "orc").filter(F.col("o_orderkey") == 1)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "o_orderkey" in plan.split(
        "PushedFilters"
    )[1].split("\n")[0]
