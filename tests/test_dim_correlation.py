"""Embedding dimension correlation (embedding_dim_correlation):
numpy differential, correlation algebra, oracle parity."""

from __future__ import annotations

import numpy as np
import pytest

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.sources.catalog import load_table

from tests.oracle_utils import assert_matches_oracle


def test_dim_correlation_differential_vs_numpy(spark, sf_check):
    mat = np.array(
        [
            r.embedding[:8]
            for r in load_table(spark, sf_check, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    want = np.corrcoef(mat, rowvar=False)
    rows = registry.QUERIES["embedding_dim_correlation"](
        spark, sf_check
    ).collect()
    assert len(rows) == 8 * 7 // 2
    for r in rows:
        assert r.n == mat.shape[0]
        assert -1.0 <= r.r <= 1.0
        # 9dp rounding of the decimal-summed statistics vs numpy's
        # float pipeline: agreement to ~1e-6 is the honest bound
        assert r.r == pytest.approx(want[r.dim_i, r.dim_j], abs=1e-6)


def test_dim_correlation_oracle(spark, sf_check):
    assert_matches_oracle(
        registry.QUERIES["embedding_dim_correlation"](spark, sf_check),
        registry.ORACLES["embedding_dim_correlation"],
        sf_check,
    )
