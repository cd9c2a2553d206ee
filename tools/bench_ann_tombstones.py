#!/usr/bin/env python
"""Pin the r15 tombstone-fold claim: search wall is flat in the number
of accumulated delete batches, and compaction restores the fresh floor.

Pre-r15, every ``ann_index_delete`` batch wrote its own
``tombstones-tNNNN`` dir; readers unioned K dirs and broadcast
anti-joined per search, so K file-opens and K manifest entries grew
until a compaction (r14 verdict finding 2, explicitly unbenchmarked
then). Since r15 each delete FOLDS the previous batch, so the manifest
lists at most ONE tombstone dir regardless of K.

Measures best-of-N search wall on the same index at 0 / 5 / 20
accumulated delete batches (fresh copy per point — deletes pick
distinct ids so live-set size shrinks only trivially), records the
on-disk tombstone dir count and manifest entry count at each point,
then compacts the 20-batch copy and re-measures.

Prints one JSON line; the driver-facing artifact is
ANN_TOMBSTONE_FANIN.json.

Usage: python tools/bench_ann_tombstones.py [--sf-dir stress/sf1]
           [--batches 0,5,20] [--runs 5] [--out ANN_TOMBSTONE_FANIN.json]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=None,
                    help="default: stress/sf1 if present, else sf0.1")
    ap.add_argument("--batches", default="0,5,20")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = args.sf_dir or (
        os.path.join(repo, "stress", "sf1")
        if os.path.isdir(os.path.join(repo, "stress", "sf1"))
        else "/root/testdata/sf0.1"
    )

    from pyspark.sql import functions as F

    from gcp_map_reduce_spark.operators.ann_index import (
        ann_index_build,
        ann_index_delete,
        ann_index_meta,
        ann_index_search,
        compact_ann_index,
    )
    from gcp_map_reduce_spark.session import get_spark

    spark = get_spark(app_name="bench-ann-tombstones")
    spark.sparkContext.setLogLevel("ERROR")

    queries = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .filter(F.col("vec_id") % 37 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding"),
        )
        .limit(64)
        .localCheckpoint()
    )
    n_q = queries.count()

    work = tempfile.mkdtemp(prefix="anntomb")
    base = os.path.join(work, "base")
    ann_index_build(spark, sf_dir, base)
    max_id = int(
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .agg(F.max("vec_id"))
        .collect()[0][0]
    )

    def timed_search(idx: str) -> float:
        walls = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            ann_index_search(spark, idx, queries, k=5, n_probe=2).write.format(
                "noop"
            ).mode("overwrite").save()
            walls.append(time.monotonic() - t0)
        return round(min(walls), 3)

    points = []
    compacted = None
    for k in [int(x) for x in args.batches.split(",")]:
        cp = os.path.join(work, f"k{k}")
        shutil.copytree(base, cp)
        nxt = max_id  # delete from the top: queries (id%37) stay live
        for _ in range(k):
            ids = list(range(nxt - args.batch_size + 1, nxt + 1))
            ids = [i for i in ids if i % 37 != 0]
            ann_index_delete(spark, cp, ids, if_missing="skip")
            nxt -= args.batch_size
        meta = ann_index_meta(cp)
        dirs = [n for n in os.listdir(cp) if n.startswith("tombstones-t")]
        points.append(
            {
                "delete_batches": k,
                "manifest_tombstone_entries": len(meta["tombstones"]),
                "on_disk_tombstone_dirs": len(dirs),
                "n_deleted": meta["n_deleted"],
                "search_wall_sec_best": timed_search(cp),
            }
        )
        if k == max(int(x) for x in args.batches.split(",")):
            compact_ann_index(spark, cp)
            compacted = {
                "delete_batches": k,
                "manifest_tombstone_entries": len(
                    ann_index_meta(cp)["tombstones"]
                ),
                "search_wall_sec_best": timed_search(cp),
            }
        shutil.rmtree(cp, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)

    payload = {
        "metric": "ann_tombstone_fanin",
        "sf_dir": sf_dir,
        "n_queries": n_q,
        "runs": args.runs,
        "points": points,
        "after_compaction": compacted,
    }
    line = json.dumps(payload)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
