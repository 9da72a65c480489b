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

    # median-of-N (default 3): robust to one-off system-load outliers,
    # so the shipped number is reproducible; per-query spread is
    # recorded so a discarded outlier is visible, not hidden.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = registry.QUERIES[name]
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            _run(fn(spark, SF_DIR))
            samples.append(time.perf_counter() - t0)
        samples.sort()
        median = samples[len(samples) // 2]
        timings[name] = round(median, 3)
        # flag queries whose worst run strayed >50% from the median
        if samples[-1] > 1.5 * median and samples[-1] - median > 0.25:
            spreads[name] = round(samples[-1], 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "method": f"median_of_{runs}",
    }
    # The driver captures only the LAST ~2000 chars of stdout and
    # parses the JSON it finds there; r4's single all-query line
    # outgrew that window and the artifact recorded "parsed": null.
    # With 78+ queries even a maximally compact one-liner exceeds the
    # window, so the emission is now three-tier:
    #   1. BENCH.json in the repo -- the full document, durable.
    #   2. an earlier stdout line with the full document (visible in
    #      logs, sacrificial if the tail window clips it).
    #   3. a FINAL line guaranteed to fit the window: totals + the
    #      slowest per-query timings that fit a fixed char budget,
    #      with `queries_omitted` counting the fast ones that didn't
    #      and `full` pointing at BENCH.json.
    full = dict(out)
    if spreads:
        full["outlier_runs_discarded"] = spreads
    here = os.path.dirname(os.path.abspath(__file__))
    # SPARK_GRAFT_BENCH_JSON redirects the document (the contract
    # test uses it so its sf0.001 run cannot clobber the canonical
    # sf0.1 BENCH.json in the repo)
    json_path = os.environ.get(
        "SPARK_GRAFT_BENCH_JSON", os.path.join(here, "BENCH.json")
    )
    try:
        with open(json_path, "w") as fh:
            json.dump(full, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass  # read-only checkout: stdout lines are still authoritative
    print(json.dumps(full, separators=(",", ":")))

    budget = 1800  # chars; driver tail window is ~2000
    final = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": {},
        "sf": float(sf),
        "method": f"median_of_{runs}",
        "n_queries": len(timings),
        "queries_omitted": 0,
        "full": "BENCH.json",
    }
    for name in sorted(timings, key=timings.get, reverse=True):
        final["queries"][name] = timings[name]
        if len(json.dumps(final, separators=(",", ":"))) > budget:
            del final["queries"][name]
            break
    final["queries_omitted"] = len(timings) - len(final["queries"])
    print(json.dumps(final, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
