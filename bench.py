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

# Three sections covering EVERY registry query (asserted in registry):
#   queries   -- headline set, median-of-N (comparable across rounds)
#   eager_queries    -- build-time trainers (Lloyd/BPE/fixpoints): the
#                       timing INCLUDES construction, which runs the
#                       algorithm's materialized rounds; single run by
#                       default (round counts are deterministic)
#   extended_queries -- the long tail incl. deliberately-quadratic
#                       oracle baselines; single run by default
BENCH_QUERIES = getattr(registry, "BENCH_QUERIES", list(registry.QUERIES))
EAGER_QUERIES = getattr(registry, "EAGER_BENCH_QUERIES", [])
EXTENDED_QUERIES = getattr(registry, "EXTENDED_BENCH_QUERIES", [])


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
    # recorded so a discarded outlier is visible, not hidden. The
    # eager/extended sections default to ONE run (env-overridable):
    # their 108 rows cost ~180 s once, and tripling that buys noise
    # reduction only on rows nobody compares across rounds.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    ext_runs = int(os.environ.get("SPARK_GRAFT_BENCH_EXT_RUNS", "1"))
    spreads: dict[str, float] = {}

    def time_queries(names: list[str], n_runs: int) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in names:
            fn = registry.QUERIES[name]
            samples = []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                _run(fn(spark, SF_DIR))
                samples.append(time.perf_counter() - t0)
            samples.sort()
            median = samples[len(samples) // 2]
            timings[name] = round(median, 3)
            # flag queries whose worst run strayed >50% from the median
            if samples[-1] > 1.5 * median and samples[-1] - median > 0.25:
                spreads[name] = round(samples[-1], 3)
        return timings

    timings = time_queries(BENCH_QUERIES, runs)
    eager = time_queries(EAGER_QUERIES, ext_runs)
    extended = time_queries(EXTENDED_QUERIES, ext_runs)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "eager_queries": eager,
        "extended_queries": extended,
        "eager_total_sec": round(sum(eager.values()), 3),
        "extended_total_sec": round(sum(extended.values()), 3),
        "n_queries_all": len(timings) + len(eager) + len(extended),
        "sf": float(sf),
        "method": f"median_of_{runs}; eager/extended median_of_{ext_runs}",
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
        "eager_total_sec": out["eager_total_sec"],
        "extended_total_sec": out["extended_total_sec"],
        "n_queries_all": out["n_queries_all"],
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
