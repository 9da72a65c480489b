"""Link-prediction scaling ladder: exact vs degree-capped wedge
fan-out at 1M/4M/16M edges, with a hub -- numbers recorded in
SCALING.md.

The operator's cost driver is the wedge fan-out sum over centers of
C(deg_w, 2) (operators/linkpred.py docstring): unlike triangle
counting it CANNOT be orientation-pruned, because every
common-neighbor pair is an output. This probe demonstrates the two
consequences on the triangle_probe hub graph (one deg-`n_spokes` hub
+ uniform edges, avg degree ~40):

  - exact: the hub alone contributes C(n_spokes, 2) wedges -- at
    2 000 spokes that is ~2M rows from ONE center, dwarfing the
    uniform graph's contribution and growing quadratically with hub
    degree while the rest of the graph grows linearly;
  - max_degree=64 (drops only centers above ~1.5x avg degree): cost
    returns to the uniform graph's linear-in-E profile, and the
    predicted-wedge count (computed from the degree table for free)
    quantifies exactly what was dropped.

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

N_SPOKES = 2_000
CAP = 64


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
        n_nodes = max(n_uniform // 20, N_SPOKES * 2)
        edges = materialize_eager(
            build_edges(spark, N_SPOKES, n_uniform, n_nodes)
        )
        n_edges = edges.count()
        w_exact = predicted_wedges(edges)
        w_capped = predicted_wedges(edges, CAP)

        t0 = time.perf_counter()
        link_prediction(edges, top_n=20).collect()
        t_exact = time.perf_counter() - t0

        t0 = time.perf_counter()
        link_prediction(edges, top_n=20, max_degree=CAP).collect()
        t_capped = time.perf_counter() - t0

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
