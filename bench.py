"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Timing = full plan execution into the `noop` sink: every output
column of every row is computed and shipped to the writer, so
Catalyst cannot column-prune projections or window expressions the
way a bare count() would allow. Results are NOT collected to the
driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline queries: the faithful reference job + the widest-coverage
# extension operators. Keep this list in sync with registry.BENCH_QUERIES
# if that exists, else it defaults to everything registered.
BENCH_QUERIES = getattr(registry, "BENCH_QUERIES", list(registry.QUERIES))


def _run(df) -> None:
    """Fully evaluate the plan (all columns, all rows) without
    collecting: the noop sink consumes every row executor-side."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so timings measure the plans
    _run(registry.QUERIES["wordcount"](spark, SF_DIR))

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = registry.QUERIES[name]
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            _run(fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
