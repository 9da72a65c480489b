"""Temporal-operator scale ladder: asof_join_nearest and
snapshot_diff over Spark-side synthetic event streams at 1M/4M/16M
rows, plus a naive pair-join nearest-asof baseline at the smallest
rung only (its per-key pair blow-up makes larger rungs pointless --
that blow-up is the point).

Usage: python tools/temporal_probe.py [n_rows...]   (default 1M 4M 16M)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark.operators.asof import asof_join_nearest
from mapreduce_implementation_grpc_spark.operators.diffing import snapshot_diff
from mapreduce_implementation_grpc_spark.session import get_spark

N_USERS = 1_000
TOL_US = 2 * 3600 * 1_000_000
SPAN_S = 30 * 86400


def synth_events(spark, n: int):
    """n events over N_USERS users, pseudo-random timestamps across a
    30-day window (xxhash-scattered, so per-user streams interleave),
    2-decimal values. No driver data, no files."""
    # user via hash, NOT id % N_USERS: the probes split event types by
    # id % 5, and a modular user assignment would hand purchases and
    # clicks DISJOINT user sets (id%5==0 -> user multiple of 5...) --
    # every join silently empty and every timing meaningless
    return (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.pmod(F.xxhash64("id", F.lit(7)), F.lit(N_USERS)).alias("user_id"),
            F.timestamp_micros(
                F.lit(1704067200000000)
                + F.pmod(F.xxhash64("id"), F.lit(SPAN_S)) * 1_000_000
            ).alias("ts"),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(2000)).cast("double") / 100.0
             ).alias("value"),
        )
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)))
    )


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def nearest_naive(purchases, clicks):
    pairs = purchases.join(clicks, "user_id").filter(
        F.abs(F.col("cus") - F.col("pus")) <= TOL_US
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.abs(F.col("cus") - F.col("pus")).asc(),
        (F.col("cus") - F.col("pus")).asc(),
    )
    return pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)


def run(spark, n: int, with_naive: bool) -> dict:
    ev = synth_events(spark, n)
    ev = ev.localCheckpoint()  # time the operators, not the generator
    purchases = ev.filter(F.col("event_id") % 5 == 0).select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = (
        ev.filter(F.col("event_id") % 5 == 1)
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("click_id"))
    )
    out = {"n_rows": n}

    t0 = time.perf_counter()
    _noop(
        asof_join_nearest(
            purchases, clicks, by="user_id", value_cols=["click_id"],
            tolerance_us=TOL_US,
        )
    )
    out["asof_nearest_s"] = round(time.perf_counter() - t0, 2)

    def snap(df):
        return df.groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).alias("day")
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )

    t0 = time.perf_counter()
    _noop(
        snapshot_diff(
            snap(ev.filter(F.col("event_id") % 10 != 0)),
            snap(ev),
            keys=["user_id", "day"],
            compare_cols=["n_events", "sum_value"],
        )
    )
    out["snapshot_diff_s"] = round(time.perf_counter() - t0, 2)

    if with_naive:
        p2 = purchases.select(
            "user_id", "purchase_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("pus")
        )
        c2 = clicks.select(
            "user_id", "click_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("cus")
        )
        t0 = time.perf_counter()
        _noop(nearest_naive(p2, c2))
        out["asof_naive_pairjoin_s"] = round(time.perf_counter() - t0, 2)
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 4_000_000, 16_000_000]
    spark = get_spark(app_name="temporal-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for i, n in enumerate(sizes):
        print(json.dumps(run(spark, n, with_naive=(i == 0))), flush=True)


if __name__ == "__main__":
    main()
