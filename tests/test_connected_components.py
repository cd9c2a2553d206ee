"""Property tests for the generic connected-components operator: the
distributed pointer-doubling fixpoint must agree with a trivially-correct
single-machine union-find on arbitrary graphs — including the shapes that
break naive label propagation (long chains, where a capped neighbor-min
loop would silently split components)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gcp_map_reduce_spark.operators.dedup import connected_components


def union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _spark_components(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    rows = connected_components(df).collect()
    return {r.node: r.cluster_id for r in rows}


edge_lists = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,  # CI must be reproducible round over round; a
    # one-off 50-random-graph deep fuzz ran clean at introduction time
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_components_match_union_find(spark, edges):
    got = _spark_components(spark, edges)
    want = union_find_components(edges)
    assert got == want


def test_long_chain_converges_logarithmically(spark):
    # a 200-node chain has diameter 199; pointer doubling must still
    # converge inside MAX_CC_ROUNDS (= 64 >> log2(199)) and label every
    # node with the chain minimum
    edges = [(i, i + 1) for i in range(199)]
    got = _spark_components(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 200


def test_self_loops_and_duplicates(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2), (7, 3)]
    got = _spark_components(spark, edges)
    assert got == {5: 5, 1: 1, 2: 1, 3: 3, 7: 3}


def test_reach_size_is_component_size(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    rows = {r.node: r for r in connected_components(df).collect()}
    assert all(rows[n].reach_size == 3 for n in (1, 2, 3))
    assert all(rows[n].reach_size == 2 for n in (10, 11))


# r16: small graphs take a driver union-find fast path
# (CC_DRIVER_MAX_EDGES); the distributed fixpoint loop must stay covered
# and agree with it on the same graphs. Forcing the threshold to 0 sends
# every graph through the loop.


def test_loop_path_matches_union_find(spark, monkeypatch):
    from gcp_map_reduce_spark.operators import dedup

    monkeypatch.setattr(dedup, "CC_DRIVER_MAX_EDGES", 0)
    for edges in (
        [(1, 2), (2, 3), (10, 11), (5, 5)],
        [(i, i + 1) for i in range(25)],  # chain: pointer-doubling shape
        [(0, 1), (1, 0), (0, 0), (2, 3), (3, 1)],
    ):
        got = _spark_components(spark, edges)
        assert got == union_find_components(edges)


def test_driver_path_matches_union_find_and_loop(spark, monkeypatch):
    from gcp_map_reduce_spark.operators import dedup

    edges = [(1, 2), (2, 3), (10, 11), (7, 7), (4, 3)]
    fast = _spark_components(spark, edges)  # default threshold: fast path
    monkeypatch.setattr(dedup, "CC_DRIVER_MAX_EDGES", 0)
    loop = _spark_components(spark, edges)
    assert fast == loop == union_find_components(edges)
    # reach_size must agree between the two paths as well
    monkeypatch.setattr(dedup, "CC_DRIVER_MAX_EDGES", 250_000)
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    rows = {r.node: r.reach_size for r in connected_components(df).collect()}
    assert rows == {1: 4, 2: 4, 3: 4, 4: 4, 10: 2, 11: 2, 7: 1}
