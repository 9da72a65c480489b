"""A/B probe (r11, VERDICT r10 #4): copurchase_butterflies join-form
(r9) vs array-form (r10, current tree), fresh-host back-to-back, noop
sink, median-of-N -- plus a value-identity collect-compare at sf0.01.

Usage: python tools/butterfly_ab_probe.py [--sf SF_DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.materialize import materialize
from mapreduce_implementation_grpc_spark.operators.graph_motifs import (
    copurchase_butterflies,
    purchase_edges,
)
from mapreduce_implementation_grpc_spark.registry.curation import PPR_SEGMENT
from mapreduce_implementation_grpc_spark.session import get_spark


def join_form(
    spark: SparkSession, sf_dir: str, top_n: int = 50, segment: str | None = None
) -> DataFrame:
    """The r9 self-join wedge enumeration, verbatim (commit 939f516)."""
    edges = materialize(purchase_edges(spark, sf_dir, segment=segment))
    a = edges.select(F.col("suppkey"), F.col("custkey").alias("c1"))
    b = edges.select(F.col("suppkey"), F.col("custkey").alias("c2"))
    wedges = a.join(b, "suppkey").filter(F.col("c1") < F.col("c2"))
    support = (
        wedges.groupBy("c1", "c2")
        .agg(F.count("*").alias("shared_suppliers"))
        .filter(F.col("shared_suppliers") >= 2)
    )
    return (
        support.select(
            F.col("c1").alias("custkey_1"),
            F.col("c2").alias("custkey_2"),
            "shared_suppliers",
            (F.col("shared_suppliers") * (F.col("shared_suppliers") - 1) / F.lit(2))
            .cast("long")
            .alias("butterflies"),
        )
        .orderBy(F.desc("shared_suppliers"), F.asc("custkey_1"), F.asc("custkey_2"))
        .limit(top_n)
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

    spark = get_spark(app_name="butterfly-ab")
    spark.sparkContext.setLogLevel("ERROR")
    registry.QUERIES["wordcount"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    # value identity at sf0.01 (both forms, exact row compare)
    a = join_form(spark, "/root/testdata/sf0.01", segment=PPR_SEGMENT).collect()
    b = copurchase_butterflies(
        spark, "/root/testdata/sf0.01", segment=PPR_SEGMENT
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b], "forms diverge!"
    print(f"identity ok ({len(a)} rows)")

    # interleaved A/B/A/B to average out drift
    for tag, fn in [
        ("join-form ", lambda: join_form(spark, args.sf, segment=PPR_SEGMENT)),
        ("array-form", lambda: copurchase_butterflies(
            spark, args.sf, segment=PPR_SEGMENT)),
    ] * 2:
        spark.sparkContext.setJobDescription(f"butterfly-ab: {tag}")
        s = _time(fn, args.runs)
        print(f"{tag} median={s[len(s) // 2]:7.3f}s samples={s}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
