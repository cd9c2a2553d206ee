#!/usr/bin/env python
"""Measure the bucketed CDC merge's rewrite bound vs the monolithic merge
(task: SCALING.md evidence, r8 — the |affected buckets|/n_buckets claim
was layout-guaranteed but unmeasured).

Builds a stress-scale snapshot (the 1M-row events table keyed by
event_id), then applies a TRICKLE batch (1k updated keys, ~0.1% of the
snapshot) two ways:

- monolithic: upsert_snapshot + full overwrite (what every micro-batch
  pays without bucketing);
- bucketed: upsert_snapshot_bucketed at n_buckets=64 (rewrites only the
  buckets the 1k keys hash into).

Reports wall seconds and bytes actually rewritten (sum of file sizes in
rewritten buckets vs the whole snapshot).

Usage: python tools/bench_cdc_merge.py [--dir /root/repo/stress/sf1]
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--trickle-keys", type=int, default=1000)
    ap.add_argument("--n-buckets", type=int, default=64)
    args = ap.parse_args()

    from gcp_map_reduce_spark.session import get_spark
    from gcp_map_reduce_spark.sinks.writers import (
        BUCKET_COL,
        upsert_snapshot,
        upsert_snapshot_bucketed,
    )
    from gcp_map_reduce_spark.sources.tables import load_table

    spark = get_spark(app_name="bench_cdc_merge")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, args.dir, "events").withColumn(
        "version", F.lit(1).cast("bigint")
    )
    n_rows = ev.count()
    trickle = (
        ev.orderBy(F.pmod(F.xxhash64("event_id"), F.lit(997)))
        .limit(args.trickle_keys)
        .withColumn("version", F.lit(2).cast("bigint"))
    )

    work = tempfile.mkdtemp(prefix="cdc_merge_")
    mono = os.path.join(work, "mono")
    buck = os.path.join(work, "buck")
    try:
        # seed both snapshots (seeding cost not part of the comparison)
        ev.write.parquet(mono)
        upsert_snapshot_bucketed(
            spark, ev, buck, "event_id", "version", n_buckets=args.n_buckets
        )
        snap_bytes = dir_bytes(buck)
        trickle_df = trickle.localCheckpoint()  # freeze outside the timing

        # monolithic: read, merge, rewrite EVERYTHING
        t0 = time.perf_counter()
        merged = upsert_snapshot(
            spark.read.parquet(mono), trickle_df, "event_id", "version"
        )
        out = mono + ".next"
        merged.write.parquet(out)
        mono_sec = round(time.perf_counter() - t0, 3)
        mono_bytes = dir_bytes(out)

        t0 = time.perf_counter()
        touched = upsert_snapshot_bucketed(
            spark, trickle_df, buck, "event_id", "version",
            n_buckets=args.n_buckets,
        )
        buck_sec = round(time.perf_counter() - t0, 3)
        rewritten_bytes = sum(
            dir_bytes(os.path.join(buck, f"{BUCKET_COL}={b}")) for b in touched
        )

        print(json.dumps({
            "metric": "cdc_merge_trickle",
            "dir": args.dir,
            "snapshot_rows": n_rows,
            "trickle_keys": args.trickle_keys,
            "n_buckets": args.n_buckets,
            "monolithic": {"sec": mono_sec, "rewritten_bytes": mono_bytes},
            "bucketed": {
                "sec": buck_sec,
                "rewritten_bytes": rewritten_bytes,
                "buckets_touched": len(touched),
            },
            "snapshot_bytes": snap_bytes,
            "bytes_ratio": round(rewritten_bytes / max(mono_bytes, 1), 4),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
