"""Sink + store lifecycle tests (reference O13-O17 parity)."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F


def test_sorted_single_json_sink(spark, tmp_path):
    from gcp_map_reduce_spark.sinks import write_sorted_single_json

    df = spark.createDataFrame(
        [("b", 2), ("a", 1), ("c", 3)], ["word", "cnt"]
    )
    out = str(tmp_path / "final")
    write_sorted_single_json(df, out, "word")
    parts = glob.glob(os.path.join(out, "part-*"))
    assert len(parts) == 1, "fidelity sink must produce exactly one file"
    rows = [json.loads(line) for line in open(parts[0])]
    assert [r["word"] for r in rows] == ["a", "b", "c"]


def test_partitioned_write_and_point_lookup(spark, tmp_path):
    from gcp_map_reduce_spark.sinks import (
        cleanup_store,
        point_lookup,
        write_partitioned,
    )
    from gcp_map_reduce_spark.operators.wordcount import inverted_index_pairs

    pairs = inverted_index_pairs(spark, "/root/testdata/sf0.001").withColumn(
        "first_letter", F.substring("word", 1, 1)
    )
    out = str(tmp_path / "index")
    write_partitioned(pairs, out, ["first_letter"])
    # hive partition dirs exist (the scalable analog of per-letter files)
    assert any(
        p.startswith("first_letter=") for p in os.listdir(out)
    )

    hit = point_lookup(spark, out, "word", "spark")
    words = {r["word"] for r in hit.collect()}
    assert words == {"spark"}
    # the key predicate must reach the parquet scan (pushdown, O16 analog
    # of the reference's storage-side filter)
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(word,spark)" in plan, plan

    cleanup_store(out)
    assert not os.path.isdir(out)
