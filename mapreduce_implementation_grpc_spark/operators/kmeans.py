"""K-means coarse quantizer in pure DataFrame ops (iterative
algorithm, extension surface SURVEY.md 2b: the IVF cell assignment
ann_ivf_topk serves from when no natural partition key exists).

Lloyd's algorithm, Spark-shaped:
- init: k deterministic seeds (smallest vec_ids -- reproducible, no
  RNG state; k-means|| would sample by hash the same way);
- assign: broadcast the k centroids (tiny), one map pass computes
  argmin squared-distance per row;
- update: groupBy(cell, pos) mean over posexploded vectors -- the
  same flat-centroid shape as similarity.ivf_centroids;
- localCheckpoint per round truncates lineage; fixed iteration count
  (coarse quantizers don't need convergence detection -- 5 rounds of
  Lloyd on a sample is the standard IVF recipe).

Everything is JVM expressions; the only driver-side data is the k
centroid vectors (inherent to broadcast-kmeans and microscopic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot_col


def _assign(emb: DataFrame, cents: DataFrame, vec_col: str) -> DataFrame:
    """argmin_c ||v - c||^2 == argmin_c (||c||^2 - 2 v.c) per row."""
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        F.col(vec_col),
        "cell",
        (F.col("cnorm2") - 2 * dot_col(vec_col, "cvec")).alias("obj"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("obj"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", vec_col, "cell", "obj")
    )


def _centroids_from(assigned: DataFrame, vec_col: str) -> DataFrame:
    flat = assigned.select("cell", F.posexplode(vec_col).alias("pos", "v"))
    means = flat.groupBy("cell", "pos").agg(F.avg(F.col("v").cast("double")).alias("c"))
    cents = (
        means.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("cell", F.transform("pc", lambda s: s["c"]).alias("cvec"))
    )
    return cents.withColumn(
        "cnorm2",
        F.aggregate("cvec", F.lit(0.0), lambda acc, x: acc + x * x),
    )


def kmeans_cells(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    vec_col: str = "embedding",
) -> DataFrame:
    """DataFrame[vec_id, cell, obj]: k-means cell per vector (obj =
    final assignment objective, for inertia checks)."""
    seeds = emb.orderBy("vec_id").limit(k).select("vec_id", F.col(vec_col).alias("seed"))
    w = Window.orderBy("vec_id")  # k rows only -- the global window is fine
    cents = seeds.select(
        (F.row_number().over(w) - 1).cast("long").alias("cell"),
        F.transform("seed", lambda x: x.cast("double")).alias("cvec"),
    ).withColumn("cnorm2", F.aggregate("cvec", F.lit(0.0), lambda acc, x: acc + x * x))
    cents = cents.localCheckpoint()

    assigned = None
    for _ in range(n_iter):
        assigned = _assign(emb, cents, vec_col).localCheckpoint()
        cents = _centroids_from(assigned, vec_col).localCheckpoint()
    return assigned.select("vec_id", "cell", F.round("obj", 6).alias("obj"))


def kmeans_inertia(assigned_with_vec: DataFrame) -> float:
    """Sum of assignment objectives -- monotone proxy for inertia
    (differs by the constant sum ||v||^2)."""
    return assigned_with_vec.agg(F.sum("obj")).collect()[0][0]
