"""Skewed-JOIN A/B probe: measure a hot-key shuffle join against its
two remedies on the same data -- numbers recorded in SCALING.md.

Shape: FACT (n_rows, half of them on ONE hot key, the rest uniform
over n_keys) equi-joined to DIM (n_keys rows, too big to broadcast by
assumption -- broadcast is disabled to model the 100 TB vocabulary).
Three plans, identical results:

  naive       sort-merge join, AQE off      -> hot key = one straggler
                                               task doing half the join
  aqe_skew    sort-merge join, AQE on with skew thresholds lowered so
              the splitter actually triggers at probe scale (defaults
              are 256 MB partitions -- cluster-sized)
  salted      operators/skewjoin.salted_join, AQE off -> the hot key
              is spread over n_salt partitions AT PLAN TIME

All three run to the noop sink and are verified to produce the same
aggregate checksum. AQE/broadcast toggles are runtime confs, set and
restored around each measurement (no second SparkSession -- see
tests/conftest note on in-process sessions).

Usage: python tools/skew_probe.py [n_rows] [n_keys] [n_salt]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark.operators.skewjoin import salted_join
from mapreduce_implementation_grpc_spark.session import get_spark


def build(spark, n_rows: int, n_keys: int):
    """FACT: 50% of rows on key 0, rest uniform; DIM: one row/key."""
    fact = spark.range(n_rows).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
        .alias("k"),
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("payload")
    )
    return fact, dim


def checksum(df) -> int:
    return df.agg(F.sum(F.col("row_id") + F.col("payload"))).collect()[0][0]


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    n_salt = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    spark = get_spark(app_name="skew_probe")
    spark.sparkContext.setLogLevel("ERROR")
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # dim "too big"

    fact, dim = build(spark, n_rows, n_keys)
    # materialize inputs once so every plan reads the same cached rows
    fact = fact.persist()
    dim = dim.persist()
    fact.count(), dim.count()

    naive = fact.hint("merge").join(dim, "k")
    salted = salted_join(fact, dim, "k", salt_from="row_id", n_salt=n_salt)
    ck = checksum(naive)
    assert checksum(salted) == ck, "salted join changed results"

    results: dict[str, float] = {}
    conf.set("spark.sql.adaptive.enabled", "false")
    results["naive_sortmerge_aqe_off"] = timed(naive)
    results["salted_shufflehash_aqe_off"] = timed(salted)

    conf.set("spark.sql.adaptive.enabled", "true")
    # lower the skew thresholds so AQE's splitter triggers at probe
    # scale (defaults target 256 MB cluster partitions)
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB"
    )
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
    results["naive_sortmerge_aqe_skew"] = timed(naive)

    for k, v in saved.items():
        conf.set(k, v)
    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "n_keys": n_keys,
                "hot_key_share": 0.5,
                "n_salt": n_salt,
                "seconds": results,
                "checksum": ck,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
