#!/usr/bin/env python
"""Measure scaling EXPONENTS for the scale-critical operator family.

Every "~linear" claim in SCALING.md previously rested on ONE ratio
(sf0.1 -> sf1). This tool adds the second measured scale point the r9
verdict asked for: time each query at two stress sets (default the sf1
and sf3 generations of ``tools/gen_stress.py``) and report the fitted
exponent  e = ln(t_big / t_base) / ln(volume_ratio)  — e ~= 1 is linear,
e ~= 2 quadratic. A super-linear exponent on a default plan is a 100 TB
scale-killer hiding behind a single healthy-looking ratio (the
pair-scores filters' selectivity is density-DEPENDENT: dup-clique size
grows with the copy count, so candidate pairs can grow faster than
volume even when one ratio looked fine).

Methodology notes baked in:
- fresh plan object per run (re-collecting the same DataFrame reuses
  its Exchange and skips the scan);
- driver-JVM GC between queries so prior localCheckpoint blocks don't
  starve the dedup family (stress_bench lesson);
- best-of-N minima at BOTH points (shared-box single runs swing 2-4x);
- probes are corpus-fingerprint-cached, so the auto choosers re-probe
  per scale point (r10) — the exponent measures the plan each density
  actually picks, which is the production behavior.

Usage:
  python tools/scale_exponents.py [--base stress/sf1] [--big stress/sf3]
      [--ratio 3.0] [--runs 2] [--queries name ...]
Prints one JSON line and a ready-to-paste markdown table.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The scale-critical family (r9 verdict #4): every banded/tiled/filtered
# near-dup or ANN plan whose cost depends on DENSITY, not just volume,
# plus one Arrow-kernel scan query as the linear control.
DEFAULT_QUERIES = [
    "dedup_pair_scores",
    "dedup_minhash",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "similarity_lsh_ann",
    "text_profile",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/repo/stress/sf1")
    ap.add_argument("--big", default="/root/repo/stress/sf3")
    ap.add_argument("--ratio", type=float, default=3.0,
                    help="volume ratio big/base (copies ratio)")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--queries", nargs="*", default=DEFAULT_QUERIES)
    args = ap.parse_args()

    from bench import build_overrides
    from gcp_map_reduce_spark.plans import registry
    from gcp_map_reduce_spark.session import get_spark
    from tools.stress_bench import _release_cluster_state, run_timed

    registry.load_catalog()
    overrides = build_overrides()

    def plan(name):
        return overrides.get(name) or registry.QUERIES[name]

    # UI on: run_timed pulls max-task stats from the UI REST API
    spark = get_spark(
        app_name="scale_exponents", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for sf_dir, tag in [(args.base, "base"), (args.big, "big")]:
        print(f"== {tag}: {sf_dir}", flush=True)
        # warm-up pass: JIT + codegen + the session-cached density probes
        # for THIS corpus fingerprint
        for name in args.queries:
            try:
                plan(name)(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:
                print(f"warm-up failed for {name}@{tag}: {exc!r}",
                      file=sys.stderr)
        results: dict[str, dict] = {}
        for name in args.queries:
            # fault-isolated: one query failing at one scale point must
            # not discard every other measurement (the 'if not b or not
            # g' guard below handles its partial row)
            try:
                run_timed(spark, name, plan(name), sf_dir, args.runs, results)
            except Exception as exc:
                print(f"timed run failed for {name}@{tag}: {exc!r}",
                      file=sys.stderr)
        for name, r in results.items():
            out.setdefault(name, {})[tag] = r
        _release_cluster_state(spark)

    rows = []
    for name in args.queries:
        b, g = out[name].get("base"), out[name].get("big")
        if not b or not g:
            continue
        exp = math.log(g["sec"] / b["sec"]) / math.log(args.ratio)
        rows.append(
            {
                "query": name,
                "base_sec": b["sec"],
                "big_sec": g["sec"],
                "exponent": round(exp, 2),
                "base_max_task_ms": b.get("max_task_ms"),
                "big_max_task_ms": g.get("max_task_ms"),
            }
        )
    print(json.dumps({"ratio": args.ratio, "rows": rows}))
    print("\n| Query | t(base) s | t(big) s | exponent | max task base→big ms |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['query']} | {r['base_sec']} | {r['big_sec']} | "
            f"{r['exponent']} | {r['base_max_task_ms']}→{r['big_max_task_ms']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
