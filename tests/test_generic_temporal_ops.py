"""Unit tests for the generic temporal operators (asof_join,
with_session_id) on crafted in-memory frames — tie handling, missing
matches, multi-key grouping — plus parity of the rewired demo queries
against their DuckDB oracles (covered again by the suite gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_map_reduce_spark.operators.relational import with_session_id
from gcp_map_reduce_spark.operators.relational_ext import asof_join


def test_asof_join_basic_and_no_match(spark):
    quotes = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 5, 11.0), ("B", 3, 20.0)],
        ["sym", "t", "px"],
    )
    trades = spark.createDataFrame(
        [("A", 0, 100), ("A", 4, 200), ("A", 7, 300), ("B", 3, 400)],
        ["sym", "t", "qty"],
    )
    out = {
        (r.sym, r.t): r.asof_px
        for r in asof_join(
            trades, quotes, by="sym", on="t", right_cols=["px"]
        ).collect()
    }
    assert out[("A", 0)] is None  # no prior quote
    assert out[("A", 4)] == 10.0  # last quote at t=1
    assert out[("A", 7)] == 11.0  # last quote at t=5
    assert out[("B", 3)] == 20.0  # same-instant quote counts


def test_asof_join_tie_prefers_right_row(spark):
    right = spark.createDataFrame([("k", 5, 1.0)], ["k", "t", "v"])
    left = spark.createDataFrame([("k", 5, 9)], ["k", "t", "x"])
    row = asof_join(left, right, by="k", on="t", right_cols=["v"]).first()
    assert row.asof_v == 1.0


def test_asof_join_multi_column_order_and_prefix(spark):
    right = spark.createDataFrame(
        [("k", 5, 1, "r1"), ("k", 5, 3, "r2")], ["k", "t", "seq", "tag"]
    )
    left = spark.createDataFrame([("k", 5, 2, 0)], ["k", "t", "seq", "pad"])
    row = asof_join(
        left, right, by="k", on=["t", "seq"], right_cols=["tag"], prefix="m_"
    ).first()
    # (5, 1) precedes the left row (5, 2); (5, 3) follows it
    assert row.m_tag == "r1"


def test_with_session_id_gaps_and_keys(spark):
    rows = [
        ("u1", 0), ("u1", 100), ("u1", 2000),  # gap > 1800 -> new session
        ("u1", 2100),
        ("u2", 0),
    ]
    df = spark.createDataFrame(rows, ["u", "sec"]).withColumn(
        "ts", F.timestamp_seconds("sec")
    )
    out = with_session_id(df, by="u", ts_col="ts", gap_sec=1800)
    got = {(r.u, r.sec): r.session_id for r in out.collect()}
    assert got == {
        ("u1", 0): 1,
        ("u1", 100): 1,
        ("u1", 2000): 2,
        ("u1", 2100): 2,
        ("u2", 0): 1,
    }


def test_with_session_id_boundary_gap_is_same_session(spark):
    # gap EXACTLY gap_sec stays in the session (strict > starts a new one)
    df = spark.createDataFrame([("u", 0), ("u", 1800)], ["u", "sec"]).withColumn(
        "ts", F.timestamp_seconds("sec")
    )
    out = with_session_id(df, by="u", ts_col="ts", gap_sec=1800)
    assert {r.session_id for r in out.collect()} == {1}


def test_three_sessionizers_agree(spark):
    """Triple parity on real events at sf0.01: the registered single-pass
    fold (user_event_profile), the generic window sessionizer
    (with_session_id -> sessionize_events), and Spark's NATIVE
    F.session_window aggregation must produce identical per-user session
    counts. Three independent formulations of 30-min-gap sessions; any
    off-by-one in gap semantics breaks the agreement."""
    from gcp_map_reduce_spark.operators.relational import sessionize_events
    from gcp_map_reduce_spark.plans import registry
    from gcp_map_reduce_spark.sources.tables import load_table
    from tests.conftest import SF_ORACLE

    registry.load_catalog()

    fold = {
        r.user_id: r.n_sessions
        for r in registry.QUERIES["user_event_profile"](spark, SF_ORACLE).collect()
    }
    windowed = {
        r.user_id: r.n_sessions
        for r in sessionize_events(spark, SF_ORACLE).collect()
    }
    ev = load_table(spark, SF_ORACLE, "events")
    native = {
        r.user_id: r.n
        for r in ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes")
        )
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert fold == windowed
    # session_window closes a session when the NEXT event is >= gap away
    # (half-open [start, last+gap)); the fold/window forms start a new
    # session when the gap is STRICTLY greater. They agree unless an
    # event lands exactly ON the 30-min boundary — assert agreement and
    # thereby that semantics line up on this data.
    assert fold == native
