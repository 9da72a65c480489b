"""Triangle-counting orientation A/B probe: degree-ordered wedge
enumeration vs naive id-order orientation on a hub-skewed graph --
numbers recorded in SCALING.md.

Why this needs a synthetic graph: the testdata co-supply projection
has near-uniform degrees, where ANY orientation bounds wedges
equally. The case degree ordering exists for is the HUB: a vertex of
degree h contributes C(h, 2) wedges if both its edges point OUT of
it, and ~0 if they point INTO it. Degree ordering points every
hub-incident edge INTO the hub, so no hub ever fans out; id ordering
lets a low-id hub fan out quadratically.

Graph: `n_spokes` edges (0, i) from one hub (id 0 -- the worst case
for id ordering) + `n_uniform` random edges over `n_nodes` vertices.
Both plans produce identical per-node triangle counts (checksummed);
only wedge volume differs:

  id_order     orient s1 -> s2 (s1 < s2): hub fans out to all spokes
               -> C(n_spokes, 2) wedges from the hub alone
  degree_order triangle_counts (operators/graph_motifs.py): hub is
               the global degree max, every spoke edge points INTO
               it -> hub contributes zero wedges

Usage: python tools/triangle_probe.py [n_spokes] [n_uniform] [n_nodes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark.operators.graph_motifs import (
    triangle_counts,
)
from mapreduce_implementation_grpc_spark.session import get_spark


def build_edges(spark, n_spokes: int, n_uniform: int, n_nodes: int):
    """Hub star (0, 1..n_spokes) + uniform random edges, deduped,
    s1 < s2, hub edges guaranteed present."""
    spokes = spark.range(1, n_spokes + 1).select(
        F.lit(0).alias("s1"), F.col("id").alias("s2")
    )
    uni = spark.range(n_uniform).select(
        F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("a"),
        F.pmod(F.xxhash64(F.col("id") + 1_000_000_007), F.lit(n_nodes)).alias("b"),
    )
    uni = (
        uni.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("s1"), F.greatest("a", "b").alias("s2")
        )
    )
    return spokes.unionByName(uni).distinct()


def id_order_triangles(edges):
    """Naive orientation: s1 -> s2 as stored (id order). Same
    wedge-then-close shape as triangle_counts, no degree attach."""
    o1 = edges.select(F.col("s1").alias("src"), F.col("s2").alias("x"))
    o2 = edges.select(F.col("s1").alias("src"), F.col("s2").alias("y"))
    wedges = o1.join(o2, "src").filter(F.col("x") < F.col("y"))
    closed = wedges.join(
        edges, (F.col("x") == F.col("s1")) & (F.col("y") == F.col("s2"))
    ).select("src", "x", "y")
    corners = (
        closed.select(F.col("src").alias("suppkey"))
        .unionByName(closed.select(F.col("x").alias("suppkey")))
        .unionByName(closed.select(F.col("y").alias("suppkey")))
    )
    return corners.groupBy("suppkey").agg(F.count("*").alias("n_triangles"))


def checksum(df) -> int:
    return df.agg(
        F.sum(F.col("suppkey") * F.col("n_triangles"))
    ).collect()[0][0]


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    n_spokes = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_uniform = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_nodes = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000

    spark = get_spark(app_name="triangle_probe")
    spark.sparkContext.setLogLevel("ERROR")
    edges = build_edges(spark, n_spokes, n_uniform, n_nodes)
    edges = edges.localCheckpoint()  # both plans read identical edges
    n_edges = edges.count()

    # warm
    timed(triangle_counts(edges))

    t_deg = timed(triangle_counts(edges))
    t_id = timed(id_order_triangles(edges))
    assert checksum(triangle_counts(edges)) == checksum(
        id_order_triangles(edges)
    ), "orientations disagree"

    print(
        json.dumps(
            {
                "n_edges": n_edges,
                "n_spokes": n_spokes,
                "degree_order_sec": round(t_deg, 2),
                "id_order_sec": round(t_id, 2),
                "speedup": round(t_id / t_deg, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
