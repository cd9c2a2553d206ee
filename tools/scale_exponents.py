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

Self-adjudication (r11, verdict task #3): a super-linear reading from a
multi-query sweep is as often BOX LOAD as a real plan property — r10's
q18_large_orders recorded e=1.26 from a load spike (clean solo profile:
e~0.65, balanced stages) and the correction lived in prose. Now any row
whose exponent exceeds ``--adjudicate-threshold`` (default 1.1) is
automatically RE-MEASURED SOLO in a fresh subprocess (fresh JVM, no
checkpoint-block neighbors, best-of-max(3, runs)) before being
recorded; the row keeps the sweep reading in ``sweep_exponent`` and is
stamped ``adjudicated: true``. Rows under the threshold are stamped
``adjudicated: false`` (meaning: no re-run was needed, the sweep value
stands). A solo reading that STAYS super-linear is then a real plan
property, not noise.

Usage:
  python tools/scale_exponents.py [--base stress/sf1] [--big stress/sf3]
      [--ratio 3.0] [--runs 2] [--queries name ...]
      [--adjudicate-threshold 1.1] [--no-adjudicate] [--out FILE.json]
Prints one JSON line and a ready-to-paste markdown table; ``--out``
additionally writes the committed-artifact form (SCALE_EXPONENTS.json).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
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


def measure(base: str, big: str, ratio: float, runs: int,
            queries: list[str]) -> list[dict]:
    """Time every query at both points in ONE session (the sweep) and
    return exponent rows. Extracted so the adjudication path can run it
    for a single query in a fresh subprocess."""
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
    for sf_dir, tag in [(base, "base"), (big, "big")]:
        print(f"== {tag}: {sf_dir}", flush=True)
        # warm-up pass: JIT + codegen + the session-cached density probes
        # for THIS corpus fingerprint
        for name in queries:
            try:
                plan(name)(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:
                print(f"warm-up failed for {name}@{tag}: {exc!r}",
                      file=sys.stderr)
        results: dict[str, dict] = {}
        for name in queries:
            # fault-isolated: one query failing at one scale point must
            # not discard every other measurement (the 'if not b or not
            # g' guard below handles its partial row)
            try:
                run_timed(spark, name, plan(name), sf_dir, runs, results)
            except Exception as exc:
                print(f"timed run failed for {name}@{tag}: {exc!r}",
                      file=sys.stderr)
        for name, r in results.items():
            out.setdefault(name, {})[tag] = r
        _release_cluster_state(spark)

    rows = []
    for name in queries:
        b, g = out.get(name, {}).get("base"), out.get(name, {}).get("big")
        if not b or not g:
            continue
        exp = math.log(g["sec"] / b["sec"]) / math.log(ratio)
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
    spark.stop()
    return rows


def adjudicate_row(row: dict, base: str, big: str, ratio: float,
                   runs: int) -> dict:
    """Re-measure ONE super-linear row solo in a fresh subprocess (fresh
    JVM — no neighbor checkpoint blocks, no shared-session GC noise) and
    return the row to record: solo values, ``adjudicated: true``, and
    the original sweep reading preserved in ``sweep_*`` fields."""
    cmd = [
        sys.executable, os.path.abspath(__file__),
        "--base", base, "--big", big, "--ratio", str(ratio),
        "--runs", str(max(3, runs)), "--queries", row["query"],
        "--no-adjudicate", "--emit-json",
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=3600
        )
    except subprocess.TimeoutExpired:
        # a hung solo re-run must not discard the whole sweep's rows —
        # record the sweep value with the error stamped (r11 review catch)
        print(f"adjudication re-run timed out for {row['query']}",
              file=sys.stderr)
        return {**row, "adjudicated": False,
                "adjudication_error": "solo re-run timed out"}
    solo = None
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT_JSON:"):
            for r in json.loads(line[len("RESULT_JSON:"):])["rows"]:
                if r["query"] == row["query"]:
                    solo = r
    if solo is None:
        print(f"adjudication re-run produced no row for {row['query']}:\n"
              f"{proc.stdout[-1500:]}\n{proc.stderr[-1500:]}",
              file=sys.stderr)
        return {**row, "adjudicated": False,
                "adjudication_error": "solo re-run failed"}
    return {
        **solo,
        "adjudicated": True,
        "sweep_exponent": row["exponent"],
        "sweep_base_sec": row["base_sec"],
        "sweep_big_sec": row["big_sec"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/repo/stress/sf1")
    ap.add_argument("--big", default="/root/repo/stress/sf3")
    ap.add_argument("--ratio", type=float, default=3.0,
                    help="volume ratio big/base (copies ratio)")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--queries", nargs="*", default=DEFAULT_QUERIES)
    ap.add_argument("--adjudicate-threshold", type=float, default=1.1,
                    help="exponent above which a row is re-measured solo "
                    "in a fresh process before being recorded")
    ap.add_argument("--no-adjudicate", action="store_true")
    ap.add_argument("--emit-json", action="store_true",
                    help="print RESULT_JSON:<json> (used by the "
                    "adjudication subprocess)")
    ap.add_argument("--out", default=None,
                    help="also write the committed-artifact JSON form "
                    "(e.g. SCALE_EXPONENTS.json)")
    args = ap.parse_args()

    rows = measure(args.base, args.big, args.ratio, args.runs, args.queries)

    if args.emit_json:
        print("RESULT_JSON:" + json.dumps({"ratio": args.ratio,
                                           "rows": rows}), flush=True)
        return

    final = []
    for row in rows:
        if (not args.no_adjudicate
                and row["exponent"] > args.adjudicate_threshold):
            print(f"adjudicating {row['query']} (sweep e={row['exponent']})"
                  " — solo fresh-process re-run...", flush=True)
            final.append(adjudicate_row(row, args.base, args.big,
                                        args.ratio, args.runs))
        else:
            final.append({**row, "adjudicated": False})
    rows = final

    print(json.dumps({"ratio": args.ratio, "rows": rows}))
    print("\n| Query | t(base) s | t(big) s | exponent | adjudicated | "
          "max task base→big ms |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        adj = "yes" if r.get("adjudicated") else "no"
        if r.get("sweep_exponent") is not None:
            adj += f" (sweep e={r['sweep_exponent']})"
        print(
            f"| {r['query']} | {r['base_sec']} | {r['big_sec']} | "
            f"{r['exponent']} | {adj} | "
            f"{r['base_max_task_ms']}→{r['big_max_task_ms']} |"
        )
    if args.out:
        artifact = {
            "metric": "scaling_exponent_sf1_to_sf3",
            "ratio": args.ratio,
            "method": ("e = ln(t_sf3/t_sf1)/ln(3); best-of-N fresh-plan "
                       "runs per point; super-linear rows re-measured "
                       "solo in a fresh process (adjudicated: true); "
                       "tools/scale_exponents.py"),
            "rows": rows,
        }
        with open(args.out, "w") as fh:
            json.dump(artifact, fh, indent=1)
            fh.write("\n")
        print(f"artifact written to {args.out}")


if __name__ == "__main__":
    main()
