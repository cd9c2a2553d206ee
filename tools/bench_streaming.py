#!/usr/bin/env python
"""Streaming CDC apply throughput (r8): the one engine axis with pytest
gates but no measured number. Seeds a snapshot from the stress events
table, lands a sequence of trickle micro-batch files, and drains them
through ``run_streaming_upsert`` with ``availableNow`` — once in
monolithic mode (full-snapshot rewrite per batch) and once bucketed.
Reports wall seconds and sec/batch — the numbers behind SCALING.md's "a
trickle of CDC updates must not pay a full-snapshot rewrite per batch".

Each batch file is landed and drained by its own ``availableNow`` run
against the SAME checkpoint (the test-suite driving pattern), so each
file is exactly one applied micro-batch.

Usage: python tools/bench_streaming.py [--dir /root/repo/stress/sf1]
       [--batches 8] [--keys-per-batch 50] [--n-buckets 256]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/repo/stress/sf1")
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--keys-per-batch", type=int, default=50)
    ap.add_argument("--n-buckets", type=int, default=256)
    args = ap.parse_args()

    from gcp_map_reduce_spark.session import get_spark
    from gcp_map_reduce_spark.sinks.writers import upsert_snapshot_bucketed
    from gcp_map_reduce_spark.sources.tables import load_table
    from gcp_map_reduce_spark.streaming.file_trigger import run_streaming_upsert

    spark = get_spark(app_name="bench_streaming")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, args.dir, "events").withColumn(
        "version", F.lit(1).cast("bigint")
    )
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in ev.schema.fields
    )
    n_rows = ev.count()

    work = tempfile.mkdtemp(prefix="stream_cdc_")
    results = {}
    try:
        # one shared set of trickle batch files (distinct key slices so
        # every batch genuinely mutates the snapshot)
        batch_dir = os.path.join(work, "batches")
        os.makedirs(batch_dir)
        for b in range(args.batches):
            lo, hi = b * args.keys_per_batch, (b + 1) * args.keys_per_batch
            batch = (
                ev.filter((F.col("event_id") % 100000 >= lo) & (F.col("event_id") % 100000 < hi))
                .limit(args.keys_per_batch)
                .withColumn("version", F.lit(2).cast("bigint"))
            )
            stage = os.path.join(work, f"stage{b}")
            batch.coalesce(1).write.parquet(stage)
            for i, f in enumerate(glob.glob(f"{stage}/part-*.parquet")):
                shutil.move(f, os.path.join(batch_dir, f"b{b}_{i}.parquet"))
            shutil.rmtree(stage)

        for mode, n_buckets in (("monolithic", None), ("bucketed", args.n_buckets)):
            snap = os.path.join(work, f"snap_{mode}")
            if n_buckets is None:
                ev.write.parquet(snap)
            else:
                upsert_snapshot_bucketed(
                    spark, ev, snap, "event_id", "version", n_buckets=n_buckets
                )
            updates = os.path.join(work, f"upd_{mode}")
            os.makedirs(updates)
            before = dir_bytes(snap)
            files = sorted(glob.glob(os.path.join(batch_dir, "*.parquet")))
            t0 = time.perf_counter()
            for f in files:
                shutil.copy(f, updates)
                q = run_streaming_upsert(
                    spark,
                    updates,
                    snap,
                    os.path.join(work, f"ck_{mode}"),
                    key="event_id",
                    version_col="version",
                    schema=schema,
                    n_buckets=n_buckets,
                )
                q.awaitTermination(600)
            sec = round(time.perf_counter() - t0, 2)
            results[mode] = {
                "sec": sec,
                "sec_per_batch": round(sec / args.batches, 3),
                "snapshot_bytes": before,
            }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({
        "metric": "streaming_cdc_trickle",
        "dir": args.dir,
        "snapshot_rows": n_rows,
        "batches": args.batches,
        "keys_per_batch": args.keys_per_batch,
        "n_buckets": args.n_buckets,
        **results,
    }))


if __name__ == "__main__":
    main()
