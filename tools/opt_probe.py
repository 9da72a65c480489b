"""Round-10 optimization probe: time a subset of registry queries in
ONE fresh JVM with the bench worker's exact methodology (wordcount
warmup, noop sink, median-of-N) so before/after deltas for a single
operator can be measured without running the whole bench.

Usage: python tools/opt_probe.py [--sf SF_DIR] [--runs N] name [name ...]
Prints one line per query: name, median seconds, all samples.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.session import get_spark


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    _run(registry.QUERIES["wordcount"](spark, args.sf))  # bench warmup

    for name in args.names:
        fn = registry.QUERIES[name]
        samples = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"opt-probe: {name}")
            t0 = time.perf_counter()
            _run(fn(spark, args.sf))
            samples.append(time.perf_counter() - t0)
        samples.sort()
        med = samples[len(samples) // 2]
        print(f"{name:40s} median={med:7.3f}s  samples="
              f"{[round(s, 3) for s in samples]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
