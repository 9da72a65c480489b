"""Pandas-UDF boundary: vectorized UDFs agree with their JVM
expression twins; entropy behaves on known distributions."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark.functions.pandas_udfs import (
    byte_entropy_pd,
    unit_normalize_expr,
    unit_normalize_pd,
)


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[3.0, 4.0]),
            Row(vec_id=1, embedding=[0.0, 0.0]),
            Row(vec_id=2, embedding=[-1.0, 1.0]),
        ]
    )
    return df.withColumn("embedding", F.col("embedding").cast("array<float>"))


def test_unit_normalize_udf_matches_expression(emb):
    both = emb.select(
        "vec_id",
        unit_normalize_pd("embedding").alias("u"),
        unit_normalize_expr("embedding").alias("e"),
    ).collect()
    for r in both:
        assert r.u == pytest.approx(r.e, abs=1e-12)
    row0 = {r.vec_id: r.u for r in both}
    assert row0[0] == pytest.approx([0.6, 0.8])
    assert row0[1] == [0.0, 0.0]  # zero vector passes through


def test_byte_entropy(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="aaaa"), Row(doc_id=2, text="abcd"), Row(doc_id=3, text="")]
    ).select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    got = {r.doc_id: r.e for r in df.select("doc_id", byte_entropy_pd("payload").alias("e")).collect()}
    assert got[1] == 0.0                      # single symbol: zero entropy
    assert got[2] == pytest.approx(2.0)       # 4 uniform symbols: 2 bits
    assert got[3] == 0.0                      # empty payload
    assert 0 <= got[2] <= math.log2(256)
