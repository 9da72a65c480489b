"""Similarity search: metamorphic properties + oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.operators.similarity import (
    embedding_dup_pairs,
    knn_brute_force,
    with_lsh_bucket,
)
from tests.oracle_utils import assert_matches_oracle


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[1.0, 0.0, 0.0, 0.0]),   # exact dup of 0
        Row(vec_id=2, embedding=[0.99, 0.1, 0.0, 0.0]),  # near dup of 0
        Row(vec_id=3, embedding=[0.0, 1.0, 0.0, 0.0]),   # orthogonal
        Row(vec_id=4, embedding=[-1.0, 0.0, 0.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(rows)
    return df.withColumn("embedding", F.col("embedding").cast("array<float>"))


def test_knn_exact_dup_is_top(emb):
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = knn_brute_force(emb, q, k=4).collect()
    assert [r.neighbor_id for r in got] == [1, 2, 3, 4]
    assert got[0].cosine == 1.0       # duplicate => cosine exactly 1
    assert got[-1].cosine == -1.0     # opposite => -1


def test_knn_excludes_self(emb):
    q = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    got = knn_brute_force(emb, q, k=4)
    assert got.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0


def test_dup_pairs_metamorphic(emb):
    pairs = {(r.vec_a, r.vec_b): r.cosine for r in embedding_dup_pairs(emb, min_cosine=0.9).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 4) not in pairs


def test_lsh_bucket_identical_vectors_collide(emb):
    b = {r.vec_id: r.bucket for r in with_lsh_bucket(emb, dim=4).collect()}
    assert b[0] == b[1]  # identical vectors always share a bucket
    assert b[0] != b[4]  # opposite vector flips every sign bit


def test_lsh_pairs_subset_of_bruteforce(emb):
    brute = {(r.vec_a, r.vec_b) for r in embedding_dup_pairs(emb, min_cosine=0.9).collect()}
    lsh = {
        (r.vec_a, r.vec_b)
        for r in embedding_dup_pairs(emb, min_cosine=0.9, use_lsh=True, num_planes=4).collect()
    }
    assert lsh <= brute  # LSH may miss pairs but never invents them


@pytest.mark.parametrize("name", ["knn_cosine", "ann_lsh", "embedding_dup_pairs"])
def test_oracle_parity(spark, sf_check, name):
    assert_matches_oracle(
        registry.QUERIES[name](spark, sf_check), registry.ORACLES[name], sf_check
    )
