"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its oracle SQL side-by-side at sf0.01 and
compares: row count, column-name set, and order-insensitive values
(columns sorted by name, rows sorted, exact equality; doubles compared
exactly because oracle-checked queries are built to be bit-deterministic —
see gcp_map_reduce_spark.functions.numeric).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes: everything to python objects, floats via repr
    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return float(v)
        if hasattr(v, "item"):  # numpy scalar
            v = v.item()
        return v

    out = df.apply(lambda col: col.map(norm))
    return out.sort_values(by=list(out.columns), na_position="first").reset_index(
        drop=True
    )


def compare(name: str, spark, sf_dir: str) -> dict:
    from gcp_map_reduce_spark.plans import registry

    registry.load_catalog()
    q = registry.QUERIES[name]
    sql = registry.ORACLES.get(name)
    sdf = q(spark, sf_dir).toPandas()
    result = {"name": name, "spark_rows": len(sdf)}
    if sql is None:
        result["status"] = "rows-only"
        return result
    con = duckdb_conn(sf_dir)
    ddf = con.execute(sql).fetchdf()
    result["oracle_rows"] = len(ddf)
    if len(sdf) != len(ddf):
        result["status"] = "ROWCOUNT-MISMATCH"
        return result
    if sorted(sdf.columns) != sorted(ddf.columns):
        result["status"] = (
            f"SCHEMA-MISMATCH spark={sorted(sdf.columns)} oracle={sorted(ddf.columns)}"
        )
        return result
    a, b = _canon(sdf), _canon(ddf)
    if a.equals(b):
        result["status"] = "MATCH"
        return result
    # find first differing cell for debugging
    diff_info = []
    for col in a.columns:
        neq = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(a[col], b[col]))
            if x != y and not (x is None and y is None)
        ]
        if neq:
            i, x, y = neq[0]
            diff_info.append(f"col={col} row={i} spark={x!r} oracle={y!r} ({len(neq)} diffs)")
    result["status"] = "VALUE-MISMATCH: " + "; ".join(diff_info[:5])
    return result
