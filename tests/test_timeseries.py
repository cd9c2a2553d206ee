"""Semantic tests for time-series resample/gap-fill (exact values are
oracle-checked; these pin the grid and fill properties)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_resample_grid_is_contiguous_and_filled(spark):
    from gcp_map_reduce_spark.operators.timeseries import events_resample_hourly

    df = events_resample_hourly(spark, SF_ORACLE)
    # spine contiguity: per user, row count == hours between h0 and h1
    span = df.groupBy("user_id").agg(
        F.count("*").alias("rows"),
        (
            (
                F.unix_timestamp(F.max("hour")) - F.unix_timestamp(F.min("hour"))
            )
            / 3600
            + 1
        ).cast("long").alias("expect"),
    )
    assert span.filter(F.col("rows") != F.col("expect")).count() == 0

    one_user = df.orderBy("hour").filter(
        F.col("user_id") == df.select("user_id").first()[0]
    ).collect()
    seen = None
    for r in one_user:
        if r["n_events"] == 0:
            assert r["total_value"] is None
            assert r["filled_value"] == seen  # carried forward (or None)
        else:
            assert r["total_value"] is not None
            assert r["filled_value"] == r["total_value"]
            seen = r["total_value"]

    # fixture sanity: gaps actually exist, so the fill is exercised
    assert df.filter(F.col("n_events") == 0).count() > 0
