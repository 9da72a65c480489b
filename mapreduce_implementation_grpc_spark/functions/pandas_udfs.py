"""Vectorized Pandas UDFs -- the sanctioned Python boundary.

Policy: everything expressible with built-in pyspark.sql.functions
stays JVM-side (see functions/vectors.py); when Python is genuinely
required (numpy/scipy-only math, external libraries), it crosses the
boundary ONCE per Arrow batch via @pandas_udf, never per row. These
are the reference implementations of that pattern, each with an
expression-based twin used to test equivalence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType


# Return types passed as DataType objects, not DDL strings: string
# types are parsed through the active SparkSession, which doesn't
# exist yet at import time.
@pandas_udf(ArrayType(DoubleType()))
def unit_normalize_pd(vectors: pd.Series) -> pd.Series:
    """L2-normalize an embedding column (numpy-vectorized per Arrow
    batch). Zero vectors pass through unchanged."""
    def norm_one(v):
        arr = np.asarray(v, dtype=np.float64)
        n = np.linalg.norm(arr)
        return (arr / n).tolist() if n > 0 else arr.tolist()

    return vectors.map(norm_one)


@pandas_udf(DoubleType())
def byte_entropy_pd(payloads: pd.Series) -> pd.Series:
    """Shannon entropy of a binary payload column -- the kind of
    quality signal a multimodal pipeline computes where no built-in
    expression exists."""
    def entropy_one(raw) -> float:
        if raw is None or len(raw) == 0:
            return 0.0
        counts = np.bincount(np.frombuffer(bytes(raw), dtype=np.uint8), minlength=256)
        p = counts[counts > 0] / len(raw)
        return float(-(p * np.log2(p)).sum())

    return payloads.map(entropy_one)


def unit_normalize_expr(vec_col: str):
    """Expression-based twin of unit_normalize_pd (JVM-side), used in
    production plans and to cross-check the UDF in tests."""
    from .vectors import l2_norm_col

    n = l2_norm_col(vec_col)
    return F.when(
        n > 0, F.transform(F.col(vec_col), lambda x: x.cast("double") / n)
    ).otherwise(F.transform(F.col(vec_col), lambda x: x.cast("double")))
