"""CLI runner: the user-facing console of the engine.

The reference's only interactive surface is the reducer's top-N
prompt (greeter_server.cc:50-64: `cin >> N`, print "<word> : <count>").
This runner generalizes it to every registered query:

    python -m mapreduce_implementation_grpc_spark --list
    python -m mapreduce_implementation_grpc_spark wordcount_topn
    python -m mapreduce_implementation_grpc_spark wordcount_topn --n 25
    python -m mapreduce_implementation_grpc_spark pricing_summary \
        --sf-dir /root/testdata/sf0.1 --explain

Results print through DataFrame.show (no driver collect of the full
result); --explain prints the formatted physical plan instead of
running the query.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    from . import registry
    from .session import get_spark

    parser = argparse.ArgumentParser(
        prog="mapreduce_implementation_grpc_spark",
        description="Run a registered query against a test-data scale factor.",
    )
    parser.add_argument("query", nargs="?", help="query name (see --list)")
    parser.add_argument("--list", action="store_true", help="list available queries")
    parser.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="directory with the parquet tables (default sf0.01)",
    )
    parser.add_argument("--n", type=int, default=20, help="rows to show (default 20)")
    parser.add_argument(
        "--explain", action="store_true", help="print the physical plan, don't run"
    )
    args = parser.parse_args(argv)

    if args.list or not args.query:
        oracle_backed = set(registry.ORACLES)
        for name in sorted(registry.QUERIES):
            tag = "oracle" if name in oracle_backed else "rows-only"
            print(f"{name:28s} [{tag}]")
        return 0

    if args.query not in registry.QUERIES:
        print(f"unknown query {args.query!r}; use --list", file=sys.stderr)
        return 2

    spark = get_spark(app_name=f"cli:{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = registry.QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.n, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
