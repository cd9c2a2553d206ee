"""Multi-process execution smoke bench: run the join/exchange-heavy
bench rows under ``local-cluster[W,C,M]`` — REAL separate executor JVMs
with real network/serialization boundaries — and compare against a
``local[32]`` run of the same subset taken back-to-back on the same box.

Why (r10 verdict task #2): every perf number in this repo's history is
single-JVM ``local[32]``, where "broadcast", "shuffle" and "Arrow
exchange" are memcpys inside one address space. Several design
arguments rest on claims that only a process boundary can falsify:

- the q3 ShuffledHashJoin BuildLeft choice (a build map on the
  cust⋈orders side must FIT in one executor's memory — 4 GiB here,
  not the shared 128 GiB heap);
- the raised 64 MB autoBroadcastJoinThreshold (driver -> N executors
  real copies, not a pointer share);
- Arrow pandas-UDF exchange costs (socket serialization per executor
  python worker, not same-process pipes).

The default ``local-cluster[4,8,4096]`` keeps total cores at 32 (4
workers x 8 cores) so the comparison against ``local[32]`` isolates the
PROCESS-BOUNDARY cost at equal parallelism and ~8x tighter per-executor
memory.

Method: same discipline as bench.py — per-query warm-up (JIT + AQE plan
at the target volume), best-of-N noop-sink runs, fault-isolated per
query. The ``local[32]`` reference runs in a LONG-LIVED subprocess and
each query is timed on BOTH sides back-to-back (cluster best-of-N, then
the reference's best-of-N within the same minute) — r15, verdict task
5: the previous two-phase design put ~7 minutes between a query's two
measurements, and on this box's load profile that made sub-second
ratios ±50% noise (window_suite read 1.526 in r14 and 0.998 in r13 on
an untouched plan). LOCAL_CLUSTER_BENCH.json carries per-query ratios;
queries slower than ``--flag-ratio`` (default 1.5x) are listed in
``flagged`` for diagnosis — the artifact is the evidence either way.

Run:
    python tools/local_cluster_bench.py                # full artifact
    python tools/local_cluster_bench.py --runs 2       # quicker
    python tools/local_cluster_bench.py --master 'local-cluster[2,4,2048]'
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_PATH = os.path.join(REPO, "LOCAL_CLUSTER_BENCH.json")

# The join/exchange-heavy headline rows (every shuffle/broadcast/Arrow
# boundary class is represented) — the subset where a process boundary
# could plausibly change the verdict.
DEFAULT_QUERIES = [
    "q3_shipping_priority",     # SHJ BuildLeft memory claim
    "q5_local_supplier_volume", # hand-ordered dim-broadcast join chain
    "join_outer_broadcast",     # broadcast + shuffle-hash outer joins
    "q21_waiting_suppliers",    # semi/anti self-joins + top-k
    "window_suite",             # wide shuffle + holistic window fns
    "user_event_profile",       # sessionize: window + groupBy chain
    "agg_multidim",             # grouping-sets multi-shuffle
    "dedup_minhash",            # Arrow kernel + band equi-join
    "dedup_embedding_cosine",   # broadcast codebook + grouped GEMM
    "similarity_ivf_ann",       # 1-row codebook BNLJ + probe joins
    "text_tfidf",               # explode shuffle + broadcast IDF term
    "curated_corpus",           # flagship multi-stage composition
]


def _wait_for_executors(spark, want_cores: int, timeout_s: float = 60.0):
    """Block until the cluster registers ``want_cores`` (executors come
    up asynchronously in local-cluster mode; defaultParallelism reads 2
    until they do, which would mis-size every ensure_parallelism fanout)."""
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if spark.sparkContext.defaultParallelism >= want_cores:
            return
        time.sleep(0.5)
    raise RuntimeError(
        f"executors did not register {want_cores} cores within "
        f"{timeout_s}s (got {spark.sparkContext.defaultParallelism})"
    )


def _plan_lookup():
    from gcp_map_reduce_spark.plans import registry

    registry.load_catalog()
    from bench import build_overrides

    overrides = build_overrides()

    def plan(name):
        return overrides.get(name) or registry.QUERIES[name]

    return plan


def _timed_best_of(q, spark, sf_dir: str, runs: int) -> dict:
    """ONE timing discipline for both A/B halves (gc before the burst,
    N noop-sink runs, sorted min + spread) — the halves must be
    measured identically or the ratio measures the harness."""
    samples: list[float] = []
    gc.collect()
    for _ in range(runs):
        t0 = time.perf_counter()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(round(time.perf_counter() - t0, 3))
    srt = sorted(samples)
    return {"runs": samples, "min": srt[0],
            "spread": round(srt[-1] - srt[0], 3)}


def serve_reference(sf_dir: str, runs: int) -> None:
    """Child mode: hold a warm ``local[32]`` session open and time each
    query name arriving on stdin with the same warm-up + best-of-N
    discipline (the shared :func:`_timed_best_of`), replying one
    ``RESULT_LINE:`` JSON per query — the same-minute half of the
    per-query A/B."""
    from gcp_map_reduce_spark.session import get_spark

    plan = _plan_lookup()
    spark = get_spark(app_name="local_cluster_bench_ref", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    print("READY", flush=True)
    for line in sys.stdin:
        name = line.strip()
        if not name or name == "EXIT":
            break
        try:
            q = plan(name)
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out = {"name": name, **_timed_best_of(q, spark, sf_dir, runs)}
        except Exception as exc:  # fault-isolated, like the main loop
            out = {"name": name, "error": repr(exc)[:500]}
        print("RESULT_LINE:" + json.dumps(out), flush=True)
    spark.stop()


def run_subset(
    master: str, sf_dir: str, queries: list[str], runs: int, ref_time=None
) -> tuple[dict, dict | None]:
    from gcp_map_reduce_spark.session import get_spark

    plan = _plan_lookup()

    extra = {}
    want_cores = 32
    if master.startswith("local-cluster"):
        # executor python workers must import this repo's modules (the
        # Arrow kernels are closures over module globals)
        extra["spark.executorEnv.PYTHONPATH"] = REPO
        w, c, _m = master.split("[")[1].rstrip("]").split(",")
        want_cores = int(w) * int(c)
    spark = get_spark(app_name="local_cluster_bench", master=master,
                      extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    if master.startswith("local-cluster"):
        _wait_for_executors(spark, want_cores)

    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}
    errors: dict[str, str] = {}
    ref = {"master": "local[32]", "queries": {}, "detail": {},
           "errors": {}} if ref_time else None
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    for name in queries:
        try:
            plan(name)(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
        except Exception as exc:
            print(f"warm-up failed for {name}: {exc!r}", file=sys.stderr)
    for name in queries:
        q = plan(name)
        try:
            d = _timed_best_of(q, spark, sf_dir, runs)
        except Exception as exc:
            errors[name] = repr(exc)[:500]
            print(f"timed run failed for {name}: {exc!r}", file=sys.stderr)
        else:
            timings[name] = d["min"]
            detail[name] = d
            print(f"{master} {name}: {d['min']:.3f}s {d['runs']}",
                  flush=True)
        # same-minute A/B: the reference half of THIS query runs now,
        # not in a phase several minutes of box drift away
        if ref_time is not None:
            r = ref_time(name)
            if r is None:
                continue
            if "error" in r:
                ref["errors"][name] = r["error"]
            else:
                ref["queries"][name] = r["min"]
                ref["detail"][name] = {k: r[k] for k in
                                       ("runs", "min", "spread")}
                print(f"local[32] {name}: {r['min']:.3f}s {r['runs']}",
                      flush=True)
    spark.stop()
    return ({"master": master, "queries": timings, "detail": detail,
             "errors": errors}, ref)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local-cluster[4,8,4096]")
    ap.add_argument("--dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--flag-ratio", type=float, default=1.5)
    ap.add_argument("--no-compare", action="store_true",
                    help="skip the interleaved local[32] reference")
    ap.add_argument("--_serve", action="store_true",
                    help="(internal) reference-server child mode: time "
                    "stdin query names on a warm local[32] session")
    args = ap.parse_args()
    queries = args.queries or DEFAULT_QUERIES

    if args._serve:
        serve_reference(args.dir, args.runs)
        return

    child = None
    ref_time = None
    if not args.no_compare:
        # long-lived reference subprocess: a clean JVM on local[32],
        # kept warm so each query's A/B halves land in the same minute
        # binary + unbuffered: every read below goes through os.read on
        # the raw fd, so no bytes are ever stranded in a Python-side
        # buffer between the READY handshake and the per-query reads
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--_serve",
             "--dir", args.dir, "--runs", str(args.runs)],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            bufsize=0, cwd=REPO,
        )
        buf = [""]  # shared line buffer across handshake + queries

        def _read_line(deadline_s: float) -> str | None:
            """Next stdout line within the deadline, or None."""
            import select

            end = time.monotonic() + deadline_s
            while True:
                if "\n" in buf[0]:
                    line, buf[0] = buf[0].split("\n", 1)
                    return line
                left = end - time.monotonic()
                if left <= 0:
                    return None
                r, _, _ = select.select([child.stdout], [], [],
                                        min(5.0, left))
                if not r:
                    if child.poll() is not None:
                        return None
                    continue
                chunk = os.read(child.stdout.fileno(), 65536).decode(
                    errors="replace"
                )
                if not chunk:  # EOF: server exited
                    return None
                buf[0] += chunk

        while True:
            line = _read_line(900.0)
            if line is None:
                # kill BEFORE raising: a slow-but-alive child would
                # otherwise leak a 32-core JVM past this exit (the
                # EXIT/kill block below is unreachable on this path —
                # 2nd review pass), and the message must not claim
                # death the poll can't confirm
                alive = child.poll() is None
                child.kill()
                raise RuntimeError(
                    "local[32] reference server "
                    + ("did not become READY within 900s"
                       if alive else "died on start")
                )
            if line.strip() == "READY":
                break

        def ref_time(name: str, deadline_s: float = 600.0) -> dict | None:
            """One reference measurement, bounded: a hung reference
            query must degrade this row to cluster-only, never block
            the whole bench (the old two-phase design's 1800 s
            subprocess timeout, re-expressed per query — review
            catch). On timeout the server is killed so later rows
            fail fast instead of queueing behind the hang."""
            if child.poll() is not None:
                return None  # server died: keep the cluster-side data
            try:
                child.stdin.write((name + "\n").encode())
                child.stdin.flush()
                end = time.monotonic() + deadline_s
                while True:
                    line = _read_line(end - time.monotonic())
                    if line is None:
                        break
                    if line.startswith("RESULT_LINE:"):
                        return json.loads(line[len("RESULT_LINE:"):])
                if child.poll() is None:
                    print(f"reference timed out on {name} — killing "
                          "the server, remaining rows are cluster-only",
                          file=sys.stderr)
                    child.kill()
            except (BrokenPipeError, OSError):
                return None
            return None

    result, ref = run_subset(
        args.master, args.dir, queries, args.runs, ref_time=ref_time
    )
    if child is not None and child.poll() is None:
        try:
            child.stdin.write(b"EXIT\n")
            child.stdin.flush()
            child.wait(timeout=60)
        except (BrokenPipeError, OSError, subprocess.TimeoutExpired):
            child.kill()

    artifact = {"cluster": result, "sf_dir": args.dir, "runs": args.runs,
                "method": "interleaved-per-query (r15)"}
    if ref is not None:
        artifact["local32"] = ref
        ratios = {}
        flagged = []
        for name in queries:
            a = result["queries"].get(name)
            b = ref["queries"].get(name)
            if a is None or b is None or b <= 0:
                continue
            r = round(a / b, 3)
            ratios[name] = r
            if r > args.flag_ratio:
                flagged.append(name)
        artifact["ratio_cluster_over_local32"] = ratios
        artifact["flagged_over_%.2fx" % args.flag_ratio] = flagged
        artifact["flagged"] = flagged

    with open(OUT_PATH, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"artifact written to {OUT_PATH}")
    if artifact.get("flagged"):
        print("FLAGGED (needs diagnosis):", artifact["flagged"])


if __name__ == "__main__":
    main()
