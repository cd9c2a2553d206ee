"""CLI entry point: ``python -m gcp_map_reduce_spark <cmd>``.

The reference is driven by ``config.json``'s ``operation_name`` plus two
REST routes (``app.py``); this CLI is the same control surface without a
server:

- ``mapreduce`` — the reference's job shape verbatim: run wordcount /
  invertedindex over a directory of text files, write the merged
  key-sorted JSON final output (E1), print its path.
- ``fetch`` — read a previous final output back (E2).
- ``list`` — every registered analytics query.
- ``run`` — run one registered query against a testdata scale dir and
  show/save the result.
- ``explain`` — print a query's formatted physical plan (the tool this
  repo's plan-quality tests are built on).
"""

from __future__ import annotations

import argparse
import sys


def _spark(cpus: str = "*"):
    from gcp_map_reduce_spark.session import get_spark

    return get_spark(app_name="gcp-map-reduce-spark-cli")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="gcp_map_reduce_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    mr = sub.add_parser("mapreduce", help="reference-parity text job")
    mr.add_argument("operation", choices=("wordcount", "invertedindex"))
    mr.add_argument("--input-dir", required=True)
    mr.add_argument("--store-dir", required=True)

    fe = sub.add_parser("fetch", help="read back a final output")
    fe.add_argument("operation", choices=("wordcount", "invertedindex"))
    fe.add_argument("--store-dir", required=True)
    fe.add_argument("--limit", type=int, default=20)

    sub.add_parser("list", help="list registered queries")

    rn = sub.add_parser("run", help="run a registered query")
    rn.add_argument("query")
    rn.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    rn.add_argument("--limit", type=int, default=20)
    rn.add_argument("--output", help="write result here instead of showing")
    rn.add_argument(
        "--format", default="parquet", choices=("parquet", "json", "csv")
    )

    ex = sub.add_parser("explain", help="print a query's physical plan")
    ex.add_argument("query")
    ex.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    args = p.parse_args(argv)

    from gcp_map_reduce_spark.plans import registry

    registry.load_catalog()

    if args.cmd == "list":
        from gcp_map_reduce_spark.plans.registry import ORACLES, QUERIES

        for name in sorted(QUERIES):
            tag = "sql-oracle" if name in ORACLES else "rows-only"
            print(f"{name}\t{tag}")
        return 0

    spark = _spark()
    try:
        if args.cmd == "mapreduce":
            from gcp_map_reduce_spark.api import launch_map_reduce

            path = launch_map_reduce(
                spark, args.operation, args.input_dir, args.store_dir
            )
            print(path)
        elif args.cmd == "fetch":
            from gcp_map_reduce_spark.api import get_final_output

            get_final_output(spark, args.operation, args.store_dir).show(
                args.limit, truncate=False
            )
        elif args.cmd == "run":
            df = registry.QUERIES[args.query](spark, args.sf_dir)
            if args.output:
                from gcp_map_reduce_spark.sources.formats import write_any

                write_any(df, args.output, args.format)
                print(args.output)
            else:
                df.show(args.limit, truncate=False)
        elif args.cmd == "explain":
            registry.QUERIES[args.query](spark, args.sf_dir).explain("formatted")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
