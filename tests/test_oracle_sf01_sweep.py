"""Full-registry oracle sweep at sf0.1 — opt-in (set
SPARK_GRAFT_SF01_SWEEP=1). The driver's value-hash gate runs at sf0.01,
where AQE may pick DIFFERENT physical plans than at sf0.1+ (broadcast vs
shuffled hash join, coalesced partitions): a plan that is correct only
under the small-scale physical strategy would pass the driver and break
in production. This sweep replicates the exact driver gate (row count +
schema + order-insensitive values vs DuckDB) for every registered query
at the bench scale.

Runtime: ~2 min wall (measured r8: 115 s for all 50 on local[32]). Run:

    SPARK_GRAFT_SF01_SWEEP=1 python -m pytest tests/test_oracle_sf01_sweep.py -q
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SF01_SWEEP"),
    reason="sf0.1 full-registry oracle sweep is opt-in: set SPARK_GRAFT_SF01_SWEEP=1",
)

SF_BENCH = "/root/testdata/sf0.1"


def _registry_names() -> list[str]:
    from gcp_map_reduce_spark.plans import registry

    registry.load_catalog()
    return sorted(registry.QUERIES)


@pytest.mark.parametrize("name", _registry_names())
def test_oracle_parity_at_sf01(spark, name):
    from tests.oracle_harness import compare

    result = compare(name, spark, SF_BENCH)
    assert result["status"] == "MATCH", result
