"""k-core / multi-source-BFS scaling ladder: rounds x cost at
1M/4M/16M edges on a hub-skewed graph -- numbers recorded in
SCALING.md (VERDICT r5 #5: pagerank/triangles had measured ladders,
the other two iterative graph operators did not).

Graph: the triangle_probe generator -- `n_spokes` edges (0, i) from
one hub plus `n_uniform` uniform random edges over `n_nodes`
vertices (expected degree 2*n_uniform/n_nodes ~ 40). The hub is the
adversarial case for per-round work: it keeps its neighborhood in
every peel round until the spokes die, and it puts ~all nodes within
2 hops of any seed set that touches it.

What the ladder demonstrates:
  - kcore: cost per round is O(E) (one degree groupBy + two
    semi-joins); ROUND COUNT is the peeling depth, a property of the
    degree distribution, NOT of graph size -- so total cost grows
    linearly in E at a fixed round count. The probe records
    rounds/edges_in/edges_out via the kcore stats hook.
  - bfs_hops: fixed max_hops rounds; each round joins a node-sized
    frontier against the doubled edge list. Cost grows with E; the
    frontier saturates after ~2 hops on a hub graph (reached count
    recorded), so later rounds are cheap anti-joins.

Usage: python tools/graph_probe.py [n_uniform ...]
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
from mapreduce_implementation_grpc_spark.operators.graph_motifs import (
    bfs_hops,
    kcore,
)
from mapreduce_implementation_grpc_spark.session import get_spark
from tools.triangle_probe import build_edges

K = 32          # ~avg degree: forces a genuinely multi-round peel
N_SPOKES = 20_000
MAX_HOPS = 3


def timed(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return time.perf_counter() - t0, n


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 4_000_000, 16_000_000]
    spark = get_spark(app_name="graph_probe")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n_uniform in sizes:
        n_nodes = max(n_uniform // 20, N_SPOKES * 2)
        edges = materialize_eager(
            build_edges(spark, N_SPOKES, n_uniform, n_nodes)
        )
        n_edges = edges.count()

        stats: dict = {}
        t0 = time.perf_counter()
        core_nodes = kcore(edges, K, max_rounds=40, stats=stats).count()
        t_kcore = time.perf_counter() - t0

        seeds = spark.range(5).select((F.col("id") * 7 + 1).alias("suppkey"))
        t_bfs, reached = timed(bfs_hops(edges, seeds, max_hops=MAX_HOPS))

        row = {
            "n_edges": n_edges,
            "n_nodes": n_nodes,
            "kcore_k": K,
            "kcore_rounds": stats["rounds"],
            "kcore_edges_out": stats["edges_out"],
            "kcore_nodes": core_nodes,
            "kcore_sec": round(t_kcore, 2),
            "kcore_sec_per_round": round(t_kcore / max(stats["rounds"], 1), 2),
            "bfs_hops": MAX_HOPS,
            "bfs_reached": reached,
            "bfs_sec": round(t_bfs, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        edges.unpersist()
    print(json.dumps({"ladder": rows}))


if __name__ == "__main__":
    main()
