"""Link-prediction scaling ladder: exact vs degree-capped wedge
fan-out at 1M/4M/16M edges, with a hub -- numbers recorded in
SCALING.md.

The operator's cost driver is the wedge fan-out sum over centers of
C(deg_w, 2) (operators/linkpred.py docstring): unlike triangle
counting it CANNOT be orientation-pruned, because every
common-neighbor pair is an output. Graph: one deg-8000 hub + sparse
uniform edges (avg degree ~8), so the hub's C(8000, 2) = 32M wedges
DOMINATE the uniform graph's ~7 per-node wedges -- the quadratic
term is the measured object, not background noise:

  - exact: hub wedges are emitted by ONE center -- a single
    straggler task computing tens of millions of rows, growing
    quadratically with hub degree while the rest grows linearly;
  - max_degree=64 (well above the ~8 average): drops ONLY the hub;
    cost returns to the uniform graph's linear-in-E profile. The
    predicted-wedge counts (free, from the degree table) quantify
    exactly what was dropped.

Timing is best-of-RUNS to damp GC/page-cache noise.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/linkpred_probe.py [n_uniform ...]
       (default ladder: 1_000_000 4_000_000)

Ladder stops at 4M edges on purpose: at avg degree ~40 the PAIR
table is ~20x the edge count (~80M mostly-unique (x1, x2) aggregate
keys at 4M edges) -- hash-aggregate state, not wedge generation, is
the single-box memory wall (8g default heap OOMs at 4M; 48g
clears it). On a cluster this state shards across executors on the
(x1, x2) hash -- the exact quantity more executors buy linearly.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark.materialize import materialize_eager
from mapreduce_implementation_grpc_spark.operators.linkpred import (
    link_prediction,
)
from mapreduce_implementation_grpc_spark.session import get_spark
from tools.triangle_probe import build_edges

N_SPOKES = 8_000
CAP = 64
RUNS = 2


def predicted_wedges(edges, cap=None) -> int:
    und = edges.select(F.col("s1").alias("v")).unionByName(
        edges.select(F.col("s2").alias("v"))
    )
    deg = und.groupBy("v").agg(F.count("*").alias("d"))
    if cap is not None:
        deg = deg.filter(F.col("d") <= cap)
    row = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w")
    ).collect()[0]
    return int(row.w or 0)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 4_000_000]
    spark = get_spark(app_name="linkpred_probe")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n_uniform in sizes:
        n_nodes = max(n_uniform // 4, N_SPOKES * 2)
        edges = materialize_eager(
            build_edges(spark, N_SPOKES, n_uniform, n_nodes)
        )
        n_edges = edges.count()
        w_exact = predicted_wedges(edges)
        w_capped = predicted_wedges(edges, CAP)

        def best_of(fn) -> float:
            best = float("inf")
            for _ in range(RUNS):
                t0 = time.perf_counter()
                fn().collect()
                best = min(best, time.perf_counter() - t0)
            return best

        t_exact = best_of(lambda: link_prediction(edges, top_n=20))
        t_capped = best_of(
            lambda: link_prediction(edges, top_n=20, max_degree=CAP)
        )

        row = {
            "n_edges": n_edges,
            "n_nodes": n_nodes,
            "hub_degree": N_SPOKES,
            "wedges_exact": w_exact,
            "wedges_capped": w_capped,
            "exact_sec": round(t_exact, 2),
            "capped_sec": round(t_capped, 2),
            "cap": CAP,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        edges.unpersist()
    print(json.dumps({"ladder": rows}))


if __name__ == "__main__":
    main()
