"""Sorted-neighborhood banded-join ladder: the banded equi-join
(linkage.sorted_neighborhood_pairs' shape: explode into 3 adjacent
rn DIV w bands, pair inside bands) vs the naive rank theta-join
(abs(rn_a - rn_b) <= w), at growing row counts -- numbers recorded
in SCALING.md.

Why it matters at 100 TB: the neighborhood predicate is a BAND on
the global rank, and a rank band is exactly the join Spark cannot
hash natively -- written as a theta-join it plans
BroadcastNestedLoopJoin / CartesianProduct, O(n^2) comparisons.
The band-id trick turns it into a plain equi-join with a 3x fan-out
on one side: candidates are O(n * 3), each band pairs at most
O(w^2 / w) rows, and the shuffle key (band id) is uniform BY
CONSTRUCTION because bands are fixed-width rank slices -- rank skew
cannot exist. The theta-join is timed only at the smallest rung (it
is the quadratic baseline, not a contender).

Bal values are deterministic (xxhash64-derived), no RNG state.

Usage: python tools/sn_probe.py [n ...]   (default: 100_000 400_000 1_600_000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark.operators.ranking import (
    with_global_row_number,
)
from mapreduce_implementation_grpc_spark.session import get_spark

W = 10
RUNS = 2


def build_rows(spark, n: int):
    """n masters + n contacts with deterministic pseudo-random bal."""
    base = spark.range(0, 2 * n).select(
        (F.col("id") % 2).alias("role"),
        F.col("id").alias("rid"),
        (
            (F.abs(F.xxhash64(F.col("id"))) % 1_000_000).cast("double")
            / F.lit(100.0)
        ).alias("bal"),
    )
    return with_global_row_number(
        base, "bal", tiebreaks=[F.asc("role"), F.asc("rid")], out_col="rn"
    )


def banded_pairs(r):
    band = F.expr(f"rn DIV {W}")
    left = r.filter(F.col("role") == 0).select(
        F.col("rid").alias("a"),
        F.col("rn").alias("rn_a"),
        F.explode(F.array(band - F.lit(1), band, band + F.lit(1))).alias(
            "_band"
        ),
    )
    right = r.filter(F.col("role") == 1).select(
        F.col("rid").alias("b"), F.col("rn").alias("rn_b"), band.alias("_band")
    )
    return left.join(right, "_band").filter(
        F.abs(F.col("rn_a") - F.col("rn_b")) <= W
    )


def theta_pairs(r):
    left = r.filter(F.col("role") == 0).select(
        F.col("rid").alias("a"), F.col("rn").alias("rn_a")
    )
    right = r.filter(F.col("role") == 1).select(
        F.col("rid").alias("b"), F.col("rn").alias("rn_b")
    )
    return left.join(
        right, F.abs(F.col("rn_a") - F.col("rn_b")) <= W
    )


def best_of(fn, runs=RUNS):
    best = None
    for _ in range(runs):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return n, best


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 400_000, 1_600_000]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for i, n in enumerate(sizes):
        r = build_rows(spark, n)
        r.cache().count()
        pairs, t_band = best_of(lambda: banded_pairs(r).count())
        row = {"n_per_side": n, "pairs": pairs, "banded_sec": round(t_band, 2)}
        if i == 0:
            tp, t_theta = best_of(lambda: theta_pairs(r).count(), runs=1)
            assert tp == pairs, (tp, pairs)
            row["theta_sec"] = round(t_theta, 2)
        print(row, flush=True)
        r.unpersist()


if __name__ == "__main__":
    main()
