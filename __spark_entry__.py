"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``mapreduce_implementation_grpc_spark``;
this module is a thin adapter over its registry.

Eager-query note: most queries build a lazy DataFrame (no Spark jobs
until the driver acts on it; enforced by
tests/test_contract.py::test_lazy_queries_build_cheaply). The
iterative algorithms -- ``dedup_clusters``, ``dedup_clusters_jaccard``,
``curate_documents``, ``kmeans_cells``, ``ann_ivf_kmeans``,
``pq_codes``, ``pq_search``, ``ann_ivfpq``, ``ann_ivfpq_residual``,
``semantic_dedup`` --
run their training/propagation rounds at DataFrame-CONSTRUCTION time
(inherent to iteration: each round's result feeds the next plan);
the returned DataFrame is then cheap to act on.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_implementation_grpc_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's end-to-end job (word count +
    deterministic top-N) over documents at sf0.001."""
    return registry.QUERIES["wordcount_topn"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
