"""Parametrized oracle-parity tests: every registered query with an oracle
must MATCH the DuckDB result at sf0.01 (the driver's gate, replicated)."""

from __future__ import annotations

import pytest

from gcp_map_reduce_spark.plans import registry
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare

registry.load_catalog()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_oracle_parity(spark, name):
    res = compare(name, spark, SF_ORACLE)
    if res["status"] == "rows-only":
        assert res["spark_rows"] >= 0
        pytest.skip(f"{name}: no oracle (rows-only), rows={res['spark_rows']}")
    assert res["status"] == "MATCH", res
