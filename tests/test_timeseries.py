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


def test_sliding_window_matches_python_oracle(spark):
    """2h windows sliding by 1h: every event lands in exactly 2 windows;
    counts and decimal-exact totals must match a Python recomputation."""
    from collections import defaultdict
    from decimal import Decimal

    from gcp_map_reduce_spark.operators.timeseries import events_sliding_window
    from gcp_map_reduce_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events").select(
        "ts", "event_type", "value"
    )
    rows = ev.collect()
    expect = defaultdict(lambda: [0, Decimal(0)])
    H = 3600
    for r in rows:
        sec = int(r.ts.timestamp())
        end_slot = sec // H  # last window starting at or before the event
        for start_slot in (end_slot - 1, end_slot):
            key = (start_slot * H, r.event_type)
            expect[key][0] += 1
            expect[key][1] += Decimal(str(r.value)).quantize(Decimal("0.01"))

    got = {}
    for r in events_sliding_window(spark, SF_SMALL).collect():
        assert (r.w_end - r.w_start).total_seconds() == 2 * H
        got[(int(r.w_start.timestamp()), r.event_type)] = (
            r.n,
            Decimal(str(r.total_value)).quantize(Decimal("0.01")),
        )
    assert set(got) == set(expect)
    for k, (n, tot) in expect.items():
        assert got[k] == (n, tot.quantize(Decimal("0.01"))), k
