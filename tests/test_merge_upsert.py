"""merge_upsert: bucketed copy-on-write MERGE semantics.

Last-write-wins correctness vs a driver-side dict oracle over a
random batch sequence, physical untouched-bucket stability (the COW
promise), and byte-level replay idempotence.
"""

from __future__ import annotations

import glob
import random

from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark.sources.sinks import merge_upsert


def _table(spark, path):
    return {
        r.k: (r.v, r.seq)
        for r in spark.read.parquet(path).select("k", "v", "seq").collect()
    }


def test_merge_upsert_lww_matches_dict_oracle(spark, tmp_path):
    path = str(tmp_path / "t")
    rng = random.Random(7)
    oracle: dict[int, tuple[str, int]] = {}
    seq = 0
    for _ in range(4):
        batch = []
        for _ in range(rng.randint(3, 12)):
            k = rng.randint(0, 20)
            seq += 1
            batch.append((k, f"v{seq}", seq))
        # within-batch collisions resolve by seq (order_col) descending
        for k, v, s in batch:
            best = oracle.get(k)
            if best is None or s > best[1]:
                oracle[k] = (v, s)
        df = spark.createDataFrame(batch, "k long, v string, seq long")
        merge_upsert(spark, path, df, "k", order_col="seq", n_buckets=8)
    assert _table(spark, path) == oracle


def test_merge_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(k, "a", 1) for k in range(64)], "k long, v string, seq long"
    )
    merge_upsert(spark, path, base, "k", order_col="seq", n_buckets=8)
    files_before = {
        b: sorted(glob.glob(f"{path}/_bkt={b}/*.parquet")) for b in range(8)
    }
    # one single-key update touches exactly one bucket
    upd = spark.createDataFrame([(5, "b", 2)], "k long, v string, seq long")
    merge_upsert(spark, path, upd, "k", order_col="seq", n_buckets=8)
    hot = upd.select(
        F.pmod(F.xxhash64(F.col("k")), F.lit(8)).cast("int").alias("b")
    ).collect()[0].b
    for b in range(8):
        after = sorted(glob.glob(f"{path}/_bkt={b}/*.parquet"))
        if b == hot:
            assert after != files_before[b]
        else:
            assert after == files_before[b]
    assert _table(spark, path)[5] == ("b", 2)


def test_merge_upsert_replay_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 2)], "k long, v string, seq long"
    )
    b2 = spark.createDataFrame(
        [(2, "c", 3), (3, "d", 4)], "k long, v string, seq long"
    )
    merge_upsert(spark, path, b1, "k", order_col="seq")
    merge_upsert(spark, path, b2, "k", order_col="seq")
    state = _table(spark, path)
    # at-least-once redelivery of the LAST batch converges
    merge_upsert(spark, path, b2, "k", order_col="seq")
    assert _table(spark, path) == state == {
        1: ("a", 1),
        2: ("c", 3),
        3: ("d", 4),
    }


def test_snapshot_diff_semantics(spark):
    """Crafted: insert / delete / update / unchanged / NULL payload.
    A key whose payload is entirely NULL in both versions is
    UNCHANGED (null-safe equality), and NULL -> value is an update."""
    from mapreduce_implementation_grpc_spark.operators.diffing import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10, 1.0), (2, 20, 2.0), (3, None, None), (4, 40, None), (5, 50, 5.0)],
        "k long, a long, b double",
    )
    new = spark.createDataFrame(
        [(1, 10, 1.0), (3, None, None), (4, 40, 4.0), (5, 51, 5.5), (6, 60, 6.0)],
        "k long, a long, b double",
    )
    got = {
        r.k: (r.change, r.changed_cols, r.old_a, r.new_a)
        for r in snapshot_diff(old, new, keys=["k"], compare_cols=["a", "b"]).collect()
    }
    assert 1 not in got and 3 not in got          # unchanged (incl. all-NULL)
    assert got[2][0] == "delete" and got[2][2] == 20 and got[2][3] is None
    assert got[4] == ("update", "b", 40, 40)      # NULL -> 4.0 is a change
    assert got[5][0] == "update" and got[5][1] == "a,b"
    assert got[6][0] == "insert" and got[6][2] is None and got[6][3] == 60


def test_snapshot_diff_oracle_parity(spark, sf_check):
    from mapreduce_implementation_grpc_spark import registry
    from tests.oracle_utils import assert_matches_oracle

    assert_matches_oracle(
        registry.QUERIES["user_day_snapshot_diff"](spark, sf_check),
        registry.ORACLES["user_day_snapshot_diff"],
        sf_check,
    )
