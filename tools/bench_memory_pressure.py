#!/usr/bin/env python
"""Spill-safety evidence: the shuffle-heavy plans under a small heap.

Every SCALING.md claim so far measures plans with a 16 GiB driver heap —
comfortable for the stress volumes, so sorts/aggregations never spill
and "works at 100 TB" rests on Spark's spill machinery UNTESTED in this
engine's plans. On a real cluster the per-task memory share
(executor.memory / cores) is routinely a few hundred MB; an operator
that silently assumes the working set fits memory (a driver-side
collect, an unbounded collect_list, a pandas group that materializes a
whole hot key) fails EXACTLY there, and no amount of green at 16 GiB
catches it.

This tool runs a shuffle/sort/agg-heavy query subset twice in FRESH
subprocess JVMs — a reference heap and a constrained heap
(default 16g vs 800m for ~sf1 stress volume: 6M lineitem / 1M events /
50k docs on 32 threads ≈ ~25 MB of heap per task-thread; 600m was
probed and GC-thrashes — 800m is the smallest tier that exercises the
spill path and still completes) — and records, per
query and per tier:

- wall + executor CPU seconds,
- ``memoryBytesSpilled`` / ``diskBytesSpilled`` summed over the run's
  stages (the proof the constrained run actually exercised the spill
  path rather than just having headroom),
- row count + an order-insensitive VALUE fingerprint (count, bit_xor,
  and modular sum of per-row xxhash64 over all columns cast to string)
  — registered plans are built bit-deterministic (functions/numeric),
  so the fingerprints must match across tiers even though spilled
  sort-merge changes the order work happens in.

PASS = every query completes at the constrained heap with an identical
fingerprint, and the constrained tier reports nonzero spill on at least
one query (otherwise the run proved nothing — shrink --low-mem).

Usage:
  python tools/gen_stress.py            # once, builds stress/sf1
  python tools/bench_memory_pressure.py [--dir stress/sf1]
      [--ref-mem 16g] [--low-mem 800m] [--runs 1]
      [--queries name ...] [--out MEMORY_PRESSURE.json]

Internal: ``--child`` runs one tier in the current process and prints
one JSON line; the parent spawns it with SPARK_GRAFT_DRIVER_MEM set
(local-mode executors live in the driver JVM, so that single knob IS
the executor memory).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Shuffle/sort/agg-heavy registered plans with deterministic outputs —
# the shapes whose scale story DEPENDS on spilling: wide hash
# aggregation (dedup_exact over 50k full texts; q1 over 6M lines),
# window sorts (window_suite, window_rank_orders), a shuffle join chain
# (q18 semijoin on 6M lines), and the banded near-dup join
# (dedup_minhash: Arrow feature kernel + band equi-join + group-max).
DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q18_large_orders",
    "window_suite",
    "window_rank_orders",
    "dedup_exact",
    "dedup_minhash",
]


def _value_fingerprint(df):
    """Order-insensitive exact fingerprint: (rows, bit_xor(h), sum(h mod
    p)) over per-row xxhash64 of every column cast to string. xor alone
    cancels duplicate rows pairwise; the modular sum restores
    multiplicity sensitivity without long-overflow (ANSI mode)."""
    from pyspark.sql import functions as F

    cols = sorted(df.columns)
    h = df.select(
        F.xxhash64(*[F.col(c).cast("string") for c in cols]).alias("h")
    )
    row = h.agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(h)").alias("x"),
        F.sum(F.pmod(F.col("h"), F.lit(1_000_000_007))).alias("s"),
    ).collect()[0]
    return [int(row["n"]), int(row["x"] or 0), int(row["s"] or 0)]


def run_tier(sf_dir: str, queries: list[str], runs: int) -> dict:
    """Child: time the queries in THIS process and print one JSON line."""
    from bench import build_overrides
    from gcp_map_reduce_spark.plans import registry
    from gcp_map_reduce_spark.session import get_spark
    from tools.rest_metrics import last_stage_id, stage_sum_since
    from tools.stress_bench import _release_cluster_state

    registry.load_catalog()
    overrides = build_overrides()
    spark = get_spark(
        app_name="bench_memory_pressure",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    heap_mb = int(
        spark._jvm.java.lang.Runtime.getRuntime().maxMemory() / (1024 * 1024)
    )
    out: dict = {"heap_mb": heap_mb, "queries": {}}
    # warm the scans once so tier timings compare plan work, not page cache
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    for name in queries:
        plan = overrides.get(name) or registry.QUERIES[name]
        rec: dict = {}
        try:
            _release_cluster_state(spark)
            samples = []
            for _ in range(runs):
                marker = last_stage_id(spark)
                t0 = time.perf_counter()
                plan(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                sec = round(time.perf_counter() - t0, 3)
                if not samples or sec < min(samples):
                    cpu_ns = stage_sum_since(spark, marker, "executorCpuTime")
                    rec = {
                        "sec": sec,
                        "cpu_sec": round((cpu_ns or 0) / 1e9, 3),
                        "mem_spill_mb": round(
                            (stage_sum_since(
                                spark, marker, "memoryBytesSpilled") or 0)
                            / 1e6, 1),
                        "disk_spill_mb": round(
                            (stage_sum_since(
                                spark, marker, "diskBytesSpilled") or 0)
                            / 1e6, 1),
                    }
                samples.append(sec)
            rec["sec"] = min(samples)
            rec["fingerprint"] = _value_fingerprint(plan(spark, sf_dir))
        except Exception as exc:  # OOM at the constrained tier is a FINDING
            rec = {"error": repr(exc)[:400]}
        out["queries"][name] = rec
        print(f"  [{heap_mb} MB] {name}: {rec}", file=sys.stderr, flush=True)
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.path.join(REPO, "stress/sf1"))
    ap.add_argument("--ref-mem", default="16g")
    ap.add_argument("--low-mem", default="800m")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--queries", nargs="*", default=DEFAULT_QUERIES)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "MEMORY_PRESSURE.json"))
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child:
        print(json.dumps(run_tier(args.dir, args.queries, args.runs)))
        return

    tiers = {}
    for label, mem in (("reference", args.ref_mem), ("constrained",
                                                     args.low_mem)):
        env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem)
        cmd = [sys.executable, os.path.abspath(__file__), "--child",
               "--dir", args.dir, "--runs", str(args.runs),
               "--queries", *args.queries]
        print(f"== tier {label} ({mem}) ==", flush=True)
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              cwd=REPO, env=env, timeout=3600)
        sys.stderr.write(proc.stderr[-4000:])
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("{")]
        if proc.returncode != 0 or not line:
            raise SystemExit(
                f"tier {label} failed rc={proc.returncode}: "
                f"{proc.stdout[-1000:]} {proc.stderr[-1000:]}"
            )
        tiers[label] = json.loads(line[-1])

    ref, low = tiers["reference"]["queries"], tiers["constrained"]["queries"]
    rows, ok, spilled = [], True, 0
    for name in args.queries:
        r, c = ref.get(name, {}), low.get(name, {})
        parity = (
            "error" not in r and "error" not in c
            and r.get("fingerprint") == c.get("fingerprint")
        )
        ok &= parity
        spill = (c.get("mem_spill_mb", 0) or 0) + (c.get("disk_spill_mb", 0)
                                                   or 0)
        spilled += spill > 0
        rows.append({
            "query": name,
            "parity": parity,
            "ref_sec": r.get("sec"), "low_sec": c.get("sec"),
            "ref_cpu_sec": r.get("cpu_sec"), "low_cpu_sec": c.get("cpu_sec"),
            "low_mem_spill_mb": c.get("mem_spill_mb"),
            "low_disk_spill_mb": c.get("disk_spill_mb"),
            "ref_disk_spill_mb": r.get("disk_spill_mb"),
            "rows": (r.get("fingerprint") or [None])[0],
            **({"ref_error": r["error"]} if "error" in r else {}),
            **({"low_error": c["error"]} if "error" in c else {}),
        })
    result = {
        "metric": "memory_pressure_spill_safety",
        "dir": args.dir,
        "ref_heap_mb": tiers["reference"]["heap_mb"],
        "low_heap_mb": tiers["constrained"]["heap_mb"],
        "all_parity": ok,
        "queries_spilled_at_low": spilled,
        "rows": rows,
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: result[k] for k in (
        "metric", "ref_heap_mb", "low_heap_mb", "all_parity",
        "queries_spilled_at_low")}))
    for r in rows:
        print(f"  {r['query']}: parity={r['parity']} "
              f"ref={r['ref_sec']}s low={r['low_sec']}s "
              f"spill(mem/disk MB)={r['low_mem_spill_mb']}/"
              f"{r['low_disk_spill_mb']}")
    if not ok:
        raise SystemExit("memory-pressure parity FAILED — see " + args.out)
    if spilled == 0:
        print("WARNING: no query spilled at the constrained tier — "
              "evidence is vacuous, lower --low-mem", file=sys.stderr)


if __name__ == "__main__":
    main()
