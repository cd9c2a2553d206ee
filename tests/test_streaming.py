"""Streaming tests: file-trigger full-recompute parity with the batch
wordcount, and incremental watermarked aggregation vs the batch answer."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F


def test_file_trigger_full_recompute(spark, tmp_path):
    from gcp_map_reduce_spark.streaming import run_file_trigger_wordcount

    inp = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    inp.mkdir()

    (inp / "doc1.txt").write_text("Hello, world!\nhello AGAIN\n")
    q = run_file_trigger_wordcount(spark, str(inp), str(out), str(ckpt))
    q.awaitTermination(120)
    got = {
        r["word"]: r["cnt"]
        for r in spark.read.parquet(str(out / "final")).collect()
    }
    assert got == {"hello": 2, "world": 1, "again": 1}

    # second upload triggers full recompute over BOTH files (reference
    # semantics: every upload recomputes the final output)
    (inp / "doc2.txt").write_text("world — encore\n")
    q2 = run_file_trigger_wordcount(spark, str(inp), str(out), str(ckpt))
    q2.awaitTermination(120)
    got2 = {
        r["word"]: r["cnt"]
        for r in spark.read.parquet(str(out / "final")).collect()
    }
    assert got2 == {"hello": 2, "world": 2, "again": 1, "encore": 1}


def test_incremental_event_counts_matches_batch(spark, tmp_path):
    from gcp_map_reduce_spark.streaming import run_incremental_event_counts
    from gcp_map_reduce_spark.sources.tables import load_table

    src = tmp_path / "events"
    ckpt = tmp_path / "ckpt2"
    # stage the sf0.001 events as the "arriving" files
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.write.parquet(str(src))

    q = run_incremental_event_counts(
        spark, str(src), str(ckpt), query_name="evcounts_test"
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM evcounts_test")

    batch = ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count("*").alias("n")
    )
    # availableNow + append emits only windows sealed by the watermark;
    # verify every emitted window matches the batch answer exactly.
    emitted = {
        (r["window_start"], r["event_type"]): r["n"] for r in got.collect()
    }
    assert emitted, "stream should finalize at least the early windows"
    want = {(r["w"]["start"], r["event_type"]): r["n"] for r in batch.collect()}
    for key, n in emitted.items():
        assert want.get(key) == n, key
