#!/usr/bin/env python
"""Pin the r15 cell-counts sidecar claim: per-commit manifest work is
flat in INDEX size (n_cells), not just in batch size.

Pre-r15, per-cell populations rode the manifest JSON inline — every
commit (including tombstone-only deletes, which don't change counts)
rewrote a blob that grows with n_cells, and every ``ann_index_meta``
call parsed it (r14 verdict finding 1: at two-level 100 TB sizing,
n_cells ~10^5-10^6 makes that a multi-MB JSON). Since r15 counts live
in a content-addressed sidecar (``_cell_counts-<sha>.json``) loaded
lazily by the one consumer that sizes from them (the screen), so the
manifest — the thing rewritten at EVERY commit and parsed at every
resolve — stays O(1) in index size.

Per n_cells point (default 32 / 256 / 2048, same corpus), measures:

- manifest bytes vs sidecar bytes (manifest must stay flat);
- ``ann_index_meta`` parse wall (median of N — flat);
- a tombstone-only delete commit's wall (best of N fresh copies — the
  commit class that no longer touches counts at all);
- screen fingerprint (count + order-free hash) with per-cell sizing vs
  with counts stripped (mean fallback) — results must be identical,
  only task balance differs.

Prints one JSON line; the driver-facing artifact is
ANN_MANIFEST_SIDECAR.json.

Usage: python tools/bench_ann_manifest.py [--sf-dir /root/testdata/sf0.1]
           [--cells 32,256,2048] [--runs 5] [--out ANN_MANIFEST_SIDECAR.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cells", default="32,256,2048")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gcp_map_reduce_spark.operators.ann_index import (
        META_FILE,
        ann_index_build,
        ann_index_delete,
        ann_index_meta,
        ann_index_screen_batch,
    )
    from gcp_map_reduce_spark.session import get_spark

    spark = get_spark(app_name="bench-ann-manifest")
    spark.sparkContext.setLogLevel("ERROR")

    batch = (
        spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
        .filter(F.col("vec_id") < 64)
        .select("vec_id", "embedding")
    )
    batch.count()  # warm the scan

    def fingerprint(idx: str):
        row = (
            ann_index_screen_batch(spark, idx, batch, 0.2, n_probe=2)
            .selectExpr(
                "count(*) AS c",
                "sum(hash(query_id, cand_id, cosine)) AS h",
            )
            .collect()[0]
        )
        return [int(row["c"]), int(row["h"] or 0)]

    work = tempfile.mkdtemp(prefix="annmanifest")
    points = []
    for n_cells in [int(c) for c in args.cells.split(",")]:
        idx = os.path.join(work, f"idx{n_cells}")
        ann_index_build(spark, args.sf_dir, idx, n_cells=n_cells)
        manifest_bytes = os.path.getsize(os.path.join(idx, META_FILE))
        sidecar = ann_index_meta(idx).get("cell_counts_file")
        sidecar_bytes = (
            os.path.getsize(os.path.join(idx, sidecar)) if sidecar else 0
        )
        meta_walls = []
        for _ in range(args.runs * 20):
            t0 = time.monotonic()
            ann_index_meta(idx)
            meta_walls.append(time.monotonic() - t0)
        # tombstone-only delete commit: fresh index copy per run so each
        # measures the same first-delete commit
        del_walls = []
        for r in range(args.runs):
            cp = os.path.join(work, f"idx{n_cells}-del{r}")
            shutil.copytree(idx, cp)
            t0 = time.monotonic()
            ann_index_delete(spark, cp, [1, 2, 3, 4])
            del_walls.append(time.monotonic() - t0)
            shutil.rmtree(cp)
        fp_percell = fingerprint(idx)
        # strip counts -> mean fallback on the same index
        mp = os.path.join(idx, META_FILE)
        with open(mp) as fh:
            raw = json.load(fh)
        stripped = {
            k: v
            for k, v in raw.items()
            if k not in ("cell_counts", "cell_counts_file")
        }
        with open(mp, "w") as fh:
            json.dump(stripped, fh)
        fp_mean = fingerprint(idx)
        with open(mp, "w") as fh:
            json.dump(raw, fh)
        points.append(
            {
                "n_cells": n_cells,
                "manifest_bytes": manifest_bytes,
                "sidecar_bytes": sidecar_bytes,
                "meta_parse_ms_median": round(
                    statistics.median(meta_walls) * 1000, 3
                ),
                "delete_commit_sec_best": round(min(del_walls), 3),
                "screen_fingerprint_percell": fp_percell,
                "screen_fingerprint_mean": fp_mean,
                "screen_identical": fp_percell == fp_mean,
            }
        )
    shutil.rmtree(work, ignore_errors=True)

    first, last = points[0], points[-1]
    payload = {
        "metric": "ann_manifest_sidecar",
        "sf_dir": args.sf_dir,
        "runs": args.runs,
        "note": (
            "manifest_bytes + meta_parse are the per-commit/per-resolve "
            "work the sidecar makes flat in n_cells; delete_commit wall "
            "also includes the documented ids-only live-intersection "
            "scan (ann_index_delete docstring), whose cost follows FILE "
            "count — at these degenerate ~1-row cells that is the "
            "n_cells-driven part, at real cell_target-sized cells it "
            "follows the corpus"
        ),
        "points": points,
        "manifest_growth_x": round(
            last["manifest_bytes"] / max(1, first["manifest_bytes"]), 3
        ),
        "sidecar_growth_x": round(
            last["sidecar_bytes"] / max(1, first["sidecar_bytes"]), 3
        ),
        "delete_commit_growth_x": round(
            last["delete_commit_sec_best"]
            / max(1e-9, first["delete_commit_sec_best"]),
            3,
        ),
    }
    line = json.dumps(payload)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
