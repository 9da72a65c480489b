"""Skyline scaling ladder: grid-prune effectiveness and runtime at
1M/4M/16M points -- numbers recorded in SCALING.md.

What is being measured (operators/skyline.py):
  - survivor count after the dominated-cell prune vs the true
    skyline size: the prune has to shrink the final pairwise
    dominance check from O(n^2) to O(survivors^2), so
    survivors/skyline is THE quality ratio;
  - wall time of the full grid skyline (linear passes + broadcast
    anti-joins over metadata/candidates);
  - for d=2, the staircase form (skyline_2d) runs the SAME input and
    must return the IDENTICAL set -- two independent algorithms
    cross-checking each other at sizes where the quadratic oracle is
    unrunnable (1e12+ comparisons).

Points are deterministic LCG integers, independent uniform dims --
the standard skyline benchmark regime (skyline ~ O(ln^(d-1) n),
Bentley). Anti-correlated dims (the adversarial regime where the
skyline itself is huge) degrade ANY exact skyline operator to
output-sized work; the probe records the independent case the
operator is designed for.

Usage: python tools/skyline_probe.py [n_points ...]
       (default ladder: 1_000_000 4_000_000 16_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark.materialize import materialize_eager
from mapreduce_implementation_grpc_spark.operators.skyline import (
    grid_survivors,
    skyline,
    skyline_2d,
)
from mapreduce_implementation_grpc_spark.session import get_spark

RUNS = 2
MASK = (1 << 31) - 1


def build_points(spark, n: int, d: int):
    """Deterministic pseudo-random integral points in [0, 2^20)^d via
    split-mix style hashing of the row id -- map-only, no shuffle."""
    base = spark.range(n)
    cols = [
        (F.xxhash64(F.col("id"), F.lit(k)).bitwiseAND(F.lit(MASK)) % (1 << 20))
        .alias(f"x{k}")
        for k in range(d)
    ]
    return base.select(*cols)


def best_of(fn) -> float:
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [
        1_000_000,
        4_000_000,
        16_000_000,
    ]
    spark = get_spark(app_name="skyline_probe")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n in sizes:
        for d in (2, 3):
            dims = [f"x{k}" for k in range(d)]
            pts = materialize_eager(build_points(spark, n, d))
            pts.count()
            n_surv = grid_survivors(pts, dims).count()
            sky = skyline(pts, dims)
            sky_rows = {tuple(r) for r in sky.collect()}
            t_grid = best_of(lambda: skyline(pts, dims).count())
            row = {
                "n_points": n,
                "d": d,
                "survivors": n_surv,
                "skyline": len(sky_rows),
                "grid_sec": round(t_grid, 2),
            }
            if d == 2:
                stair = {
                    tuple(r) for r in skyline_2d(pts, "x0", "x1").collect()
                }
                row["staircase_sec"] = round(
                    best_of(lambda: skyline_2d(pts, "x0", "x1").count()), 2
                )
                row["identical"] = stair == sky_rows
            rows.append(row)
            print(json.dumps(row), flush=True)
            pts.unpersist()
    print(json.dumps({"ladder": rows}))


if __name__ == "__main__":
    main()
