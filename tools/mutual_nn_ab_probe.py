"""A/B probe (r11, VERDICT r10 #4): embedding_mutual_nn_lsh with the
candidate-pair pin ON (current tree) vs OFF (r9 shape), interleaved
in one JVM -- decides whether the pin stays unconditional on the LSH
path. Also runs the exact path for reference.

Usage: python tools/mutual_nn_ab_probe.py [--sf SF_DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.operators.similarity import (
    embedding_dup_pairs,
    mutual_nearest_pairs,
)
from mapreduce_implementation_grpc_spark.session import get_spark
from mapreduce_implementation_grpc_spark.sources.catalog import load_table


def mutual_nn_unpinned(pairs: DataFrame) -> DataFrame:
    """mutual_nearest_pairs with NO pin (the r9 shape, verbatim)."""
    sym = pairs.select(
        F.col("vec_a").alias("v"), F.col("vec_b").alias("nb"), "cosine"
    ).unionByName(
        pairs.select(F.col("vec_b").alias("v"), F.col("vec_a").alias("nb"), "cosine")
    )
    w = Window.partitionBy("v").orderBy(F.desc("cosine"), F.asc("nb"))
    best = (
        sym.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    other = best.select(F.col("v").alias("_bv"), F.col("nb").alias("_bnb"))
    return (
        best.join(other, (F.col("nb") == F.col("_bv")) & (F.col("_bnb") == F.col("v")))
        .filter(F.col("v") < F.col("nb"))
        .select(F.col("v").alias("vec_a"), F.col("nb").alias("vec_b"), "cosine")
        .orderBy("vec_a")
    )


def _time(df_fn, runs: int) -> list[float]:
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 3))
    return sorted(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="mutual-nn-ab")
    spark.sparkContext.setLogLevel("ERROR")
    registry.QUERIES["wordcount"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    def lsh_pairs():
        return embedding_dup_pairs(
            load_table(spark, args.sf, "embeddings"), min_cosine=0.35, use_lsh=True
        )

    def exact_pairs():
        return embedding_dup_pairs(
            load_table(spark, args.sf, "embeddings"), min_cosine=0.35
        )

    # value identity at the probe SF (pin cannot change values, but
    # prove it anyway)
    a = sorted(map(tuple, mutual_nn_unpinned(lsh_pairs()).collect()))
    b = sorted(map(tuple, mutual_nearest_pairs(lsh_pairs()).collect()))
    assert a == b, "pin changed values!"
    print(f"identity ok ({len(a)} rows)")

    for tag, fn in [
        ("lsh pin  ", lambda: mutual_nearest_pairs(lsh_pairs())),
        ("lsh nopin", lambda: mutual_nn_unpinned(lsh_pairs())),
        ("exact pin  ", lambda: mutual_nearest_pairs(exact_pairs())),
        ("exact nopin", lambda: mutual_nn_unpinned(exact_pairs())),
    ] * 2:
        spark.sparkContext.setJobDescription(f"mutual-nn-ab: {tag}")
        s = _time(fn, args.runs)
        print(f"{tag} median={s[len(s) // 2]:7.3f}s samples={s}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
