"""Embedding scalar quantization: code-range/reconstruction
properties + oracle parity."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.operators.quantization import (
    quantize_embeddings,
)


def test_codes_in_range_and_error_bounded(spark, sf_check):
    emb = spark.read.parquet(f"{sf_check}/embeddings.parquet")
    q = quantize_embeddings(emb)
    stats = q.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.max("mse").alias("worst_mse"),
    ).collect()[0]
    assert 0 <= stats.lo and stats.hi <= 255
    # per-dim error <= half a cell width; mse <= max over dims of
    # ((mx-mn)/255/2)^2. Bound loosely via the global value range.
    rng = emb.select(F.posexplode("embedding").alias("p", "x")).agg(
        (F.max("x") - F.min("x")).alias("spread")
    ).collect()[0].spread
    assert stats.worst_mse <= (float(rng) / 255.0) ** 2


def test_degenerate_dimension_codes_zero(spark):
    emb = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, 5.0]), Row(vec_id=2, embedding=[1.0, 7.0])]
    )
    got = {r.vec_id: r for r in quantize_embeddings(emb).collect()}
    # dim 1 is constant -> code 0, zero error contribution
    assert got[1].codes[0] == 0 and got[2].codes[0] == 0
    # dim 2: min->code 0, max->code 255
    assert got[1].codes[1] == 0 and got[2].codes[1] == 255


def test_quantize_oracle_parity(spark, sf_check):
    from tests.oracle_utils import assert_matches_oracle

    name = "embedding_quantize"
    assert_matches_oracle(
        registry.QUERIES[name](spark, sf_check), registry.ORACLES[name], sf_check
    )
