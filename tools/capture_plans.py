#!/usr/bin/env python
"""Capture .explain("formatted") for bench/registered queries.

Writes plans/r16/<query>_<tag>.txt for each query name given (default:
the bench HEADLINE list, using the same build_overrides substitutions the
bench times). Usage:

    python tools/capture_plans.py --tag before [QUERY ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=os.path.join(REPO, "plans", "r16"))
    args = ap.parse_args()

    from bench import HEADLINE, build_overrides
    from gcp_map_reduce_spark.plans import registry
    from gcp_map_reduce_spark.session import get_spark

    registry.load_catalog()
    overrides = build_overrides()
    names = args.queries or HEADLINE
    os.makedirs(args.out, exist_ok=True)

    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = overrides.get(name) or registry.QUERIES[name]
        try:
            df = fn(spark, args.dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # keep capturing the rest
            plan = f"PLAN CAPTURE FAILED: {exc!r}\n"
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
