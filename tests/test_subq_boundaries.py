"""Boundary-data property tests for the subquery decorrelations.

The oracle gate at sf0.01 proves the decorrelated Spark plans agree with
DuckDB on one fixed snapshot — but off-by-ones (q4's strictly-greater
90-day residual, q22's strictly-above-average threshold, q15's exact-tie
max, q21's shipdate ties) can be green on a snapshot that never exercises
the boundary. This fixture CRAFTS the boundaries — rows exactly AT every
threshold, empty groups, ties — writes them as a parquet sf-dir with the
production schemas, and runs the registered suites through the same
compare() gate, so Spark and DuckDB must agree on every edge.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMALL
from tests.oracle_harness import TABLES, compare

TS = lambda s: pd.Timestamp(s)  # noqa: E731


def _write_like(src_dir: str, out_dir: Path, name: str, df: pd.DataFrame) -> None:
    """Write ``df`` with EXACTLY the production table's arrow schema (so
    Spark reads identical types, NTZ and all)."""
    schema = pq.read_schema(f"{src_dir}/{name}.parquet")
    schema = pa.schema([schema.field(i) for i in range(len(schema.names))])
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(table, out_dir / f"{name}.parquet")


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_edge")
    # non-crafted tables: tiny sf0.001 copies (the suites under test do
    # not read them, but the oracle harness registers views for all 10)
    crafted = {"orders", "lineitem", "customer", "supplier", "part"}
    for t in TABLES:
        if t not in crafted:
            shutil.copy(f"{SF_SMALL}/{t}.parquet", out / f"{t}.parquet")

    orders = pd.DataFrame(
        [
            # q4 window [1996-01-01, 1997-01-01): AT the lower bound
            # (included), last instant (included), AT the upper bound
            # (excluded), just before the lower bound (excluded)
            (1, 1, "F", 100.0, TS("1996-01-01 00:00:00"), "1-URGENT"),
            (2, 2, "F", 100.0, TS("1996-12-31 23:59:59"), "2-HIGH"),
            (3, 3, "F", 100.0, TS("1997-01-01 00:00:00"), "2-HIGH"),
            (4, 4, "F", 100.0, TS("1995-12-31 23:59:59"), "3-MEDIUM"),
            # in-window order with NO lineitems (EXISTS must drop it,
            # q13 must still count it for customer 5)
            (5, 5, "F", 100.0, TS("1996-06-01 00:00:00"), "1-URGENT"),
            # q21: non-'F' order (excluded) with two suppliers
            (6, 1, "O", 100.0, TS("1996-06-01 00:00:00"), "2-HIGH"),
            # q21: 'F' order, two suppliers, distinct ship dates -> the
            # strictly-last supplier (20) waits
            (7, 2, "F", 100.0, TS("1996-06-01 00:00:00"), "2-HIGH"),
            # q21: 'F' order, two suppliers, TIED ship dates -> l3
            # residual (>=, other suppkey) kills both
            (8, 3, "F", 100.0, TS("1996-06-01 00:00:00"), "2-HIGH"),
            # q21: 'F' order, single supplier -> EXISTS sibling fails
            (9, 4, "F", 100.0, TS("1996-06-01 00:00:00"), "2-HIGH"),
            # q22: customer 9 has a RECENT order (anti-join drops them);
            # customer 1's only order is old (kept)
            (10, 9, "F", 100.0, TS("2001-06-01 00:00:00"), "5-LOW"),
            # q8 window [1996-01-01, 1998-01-01): 1997 order in, and an
            # AT-upper-bound 1998 order out
            (11, 1, "F", 100.0, TS("1997-03-01 00:00:00"), "2-HIGH"),
            (12, 1, "F", 100.0, TS("1998-01-01 00:00:00"), "2-HIGH"),
        ],
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )

    LI = [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ]
    lineitem = pd.DataFrame(
        [
            # q4 residual (l_shipdate > o_orderdate + 90d, strictly):
            # order 1 (1996-01-01): AT +90d = 1996-03-31 -> NOT counted
            (1, 1, 1, 1, 5.0, 100.0, 0.0, 0.0, "N", "O", TS("1996-03-31 00:00:00")),
            # order 2: one second past +90d -> counted, and a second
            # qualifying line (order must still count ONCE)
            (2, 1, 1, 1, 5.0, 100.0, 0.0, 0.0, "N", "O", TS("1997-04-01 00:00:01")),
            (2, 1, 1, 2, 5.0, 100.0, 0.0, 0.0, "N", "O", TS("1997-05-01 00:00:00")),
            # orders 3/4 (outside q4 date window) ship late anyway
            (3, 1, 1, 1, 5.0, 100.0, 0.0, 0.0, "N", "O", TS("1997-06-01 00:00:00")),
            (4, 1, 1, 1, 5.0, 100.0, 0.0, 0.0, "N", "O", TS("1996-06-01 00:00:00")),
            # q21 order 6 (status O, excluded): two suppliers
            (6, 1, 10, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", TS("1996-06-02 00:00:00")),
            (6, 1, 20, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", TS("1996-06-03 00:00:00")),
            # q21 order 7: supplier 20 ships strictly last -> numwait
            (7, 1, 10, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", TS("1996-06-02 00:00:00")),
            (7, 1, 20, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", TS("1996-06-05 00:00:00")),
            # q21 order 8: tie -> neither supplier waits
            (8, 1, 10, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", TS("1996-06-04 00:00:00")),
            (8, 1, 30, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", TS("1996-06-04 00:00:00")),
            # q21 order 9: single supplier
            (9, 1, 10, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", TS("1996-06-04 00:00:00")),
            # q17 part 2 (Brand#3): avg qty = 10 -> threshold 2.0;
            # quantities: AT threshold (excluded), just under (included),
            # far above (included in the avg only)
            (1, 2, 1, 2, 2.0, 50.0, 0.0, 0.0, "N", "O", TS("1996-02-01 00:00:00")),
            (3, 2, 1, 2, 1.0, 70.0, 0.0, 0.0, "N", "O", TS("1996-02-01 00:00:00")),
            (4, 2, 1, 2, 27.0, 90.0, 0.0, 0.0, "N", "O", TS("1996-02-01 00:00:00")),
            # q19 leg 1 (Brand#12, size 1-15, qty 1-11): AT both quantity
            # bounds (inclusive) and just outside
            (6, 3, 1, 3, 1.0, 11.0, 0.0, 0.0, "N", "O", TS("1996-02-01 00:00:00")),
            (7, 3, 1, 3, 11.0, 13.0, 0.0, 0.0, "N", "O", TS("1996-02-01 00:00:00")),
            (8, 3, 1, 3, 12.0, 17.0, 0.0, 0.0, "N", "O", TS("1996-02-01 00:00:00")),
            # q15 window [1996-01-01, 1996-04-01): suppliers 10 and 20
            # TIE on exact decimal revenue inside the window; supplier 30
            # earns more but AT the window's end (excluded)
            (5, 1, 10, 1, 1.0, 500.0, 0.25, 0.0, "N", "O", TS("1996-01-01 00:00:00")),
            (5, 1, 20, 2, 1.0, 500.0, 0.25, 0.0, "N", "O", TS("1996-03-31 23:59:59")),
            (5, 1, 30, 3, 1.0, 9999.0, 0.0, 0.0, "N", "O", TS("1996-04-01 00:00:00")),
        ],
        columns=LI,
    )
    lineitem["l_linenumber"] = lineitem["l_linenumber"].astype("int32")

    # q22 eligibility: cntrycode = custkey % 10 in (1..5). avg positive
    # eligible balance = (100 + 300 + 200)/3 = 200.
    customer = pd.DataFrame(
        [
            (1, "c1", 0, 100.0, "SEG_A"),  # below avg -> out
            (2, "c2", 0, 300.0, "SEG_A"),  # above avg, old orders only -> IN
            (3, "c3", 0, 200.0, "SEG_A"),  # exactly AT avg -> out (strict >)
            (4, "c4", 0, -50.0, "SEG_A"),  # negative: not in avg, below -> out
            (5, "c5", 0, 0.0, "SEG_B"),  # zero: not in avg (strict > 0)
            (9, "c9", 0, 9999.0, "SEG_B"),  # above avg but HAS recent order
            (10, "c10", 0, 9999.0, "SEG_B"),  # cntrycode 0: ineligible
            (6, "c6", 0, 9999.0, "SEG_B"),  # cntrycode 6: ineligible
        ],
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    customer["c_nationkey"] = customer["c_nationkey"].astype("int32")

    supplier = pd.DataFrame(
        [
            (10, "s10", 5, 0.0),
            (20, "s20", 5, 0.0),
            (30, "s30", 5, 0.0),
            (1, "s1", 5, 0.0),
        ],
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    )
    supplier["s_nationkey"] = supplier["s_nationkey"].astype("int32")

    part = pd.DataFrame(
        [
            (1, "p1", "Brand#1", "STANDARD", 5, 1.0),
            (2, "p2", "Brand#3", "STANDARD", 5, 1.0),  # q17 brand
            # q19: size AT the leg-1 upper bound (15, inclusive)
            (3, "p3", "Brand#12", "STANDARD", 15, 1.0),
        ],
        columns=["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    )
    part["p_size"] = part["p_size"].astype("int32")

    for name, df in [
        ("orders", orders),
        ("lineitem", lineitem),
        ("customer", customer),
        ("supplier", supplier),
        ("part", part),
    ]:
        _write_like(SF_SMALL, out, name, df)
    return str(out)


@pytest.mark.parametrize(
    "suite", ["q4_q13_q21_counts", "q8_q22_shares", "q15_q17_q19_scalars"]
)
def test_subquery_suites_agree_on_boundaries(spark, edge_dir, suite):
    res = compare(suite, spark, edge_dir)
    assert res["status"] == "MATCH", res


def test_boundary_fixture_exercises_the_edges(spark, edge_dir):
    """The fixture must actually HIT the boundaries (a vacuous fixture
    would make the MATCH above meaningless): assert the semantics we
    crafted, on the Spark side."""
    from gcp_map_reduce_spark.operators.relational_subq import (
        q4_order_priority,
        q15_top_supplier,
        q21_waiting_suppliers,
        q22_inactive_customers,
    )

    q4 = {r.o_orderpriority: r.order_count for r in q4_order_priority(spark, edge_dir).collect()}
    # order 1: line AT +90d excluded; order 2 counted once despite two
    # qualifying lines; order 5 has no lines; order 3 outside window
    assert q4 == {"2-HIGH": 1}

    q21 = {r.s_name: r.numwait for r in q21_waiting_suppliers(spark, edge_dir).collect()}
    # order 7: strictly-last supplier 20 waits; order 5 (the q15 rows,
    # status F): supplier 30 ships strictly last and waits; the tie
    # (order 8) and the single-supplier order (9) produce nothing
    assert q21 == {"s20": 1, "s30": 1}

    q22 = q22_inactive_customers(spark, edge_dir).collect()
    # only customer 2: at-threshold (3), negative (4), zero (5), recent
    # orders (9), ineligible codes (6, 10) all excluded
    assert len(q22) == 1 and q22[0].numcust == 1 and q22[0].totacctbal == 300.0

    q15 = sorted(r.s_name for r in q15_top_supplier(spark, edge_dir).collect())
    # exact decimal tie -> BOTH suppliers returned; supplier 30's revenue
    # sits at the window end and is excluded
    assert q15 == ["s10", "s20"]
