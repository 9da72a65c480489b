"""materialize.py: the reliable/fast materialization switch.

reliable=False (localCheckpoint) is correct-and-fastest in single-JVM
local mode but on a real cluster an executor loss kills the job (no
lineage). reliable=True (DISK_ONLY persist, lineage retained) must
produce IDENTICAL results -- the parity tests here pin that, and the
mechanism test pins which primitive each mode actually uses.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark.materialize import materialize
from mapreduce_implementation_grpc_spark.operators.graph_motifs import (
    copurchase_butterflies,
)
from mapreduce_implementation_grpc_spark.operators.ranking import (
    with_global_row_number,
)
from mapreduce_implementation_grpc_spark.operators.setjoin import (
    jaccard_prefix_pairs,
)


def test_materialize_mechanisms(spark):
    df = spark.range(10)
    fast = materialize(df, reliable=False)
    # localCheckpoint truncates lineage: the analyzed plan becomes a
    # LogicalRDD block scan, not the original Range
    assert "LogicalRDD" in fast._jdf.queryExecution().analyzed().toString()
    rel = materialize(spark.range(10), reliable=True)
    assert rel.storageLevel == StorageLevel.DISK_ONLY
    assert rel.count() == 10
    rel.unpersist()


def test_env_default_flips_to_reliable(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_MATERIALIZE", "1")
    rel = materialize(spark.range(7))
    assert rel.storageLevel == StorageLevel.DISK_ONLY
    rel.unpersist()
    monkeypatch.delenv("SPARK_GRAFT_RELIABLE_MATERIALIZE")
    fast = materialize(spark.range(7))
    assert fast.storageLevel == StorageLevel.NONE  # localCheckpoint path


def test_reliable_parity_prefix_join(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "completely unrelated text about parquet footers here"),
        ],
        "doc_id long, text string",
    )
    fast = sorted(map(tuple, jaccard_prefix_pairs(docs, t_num=1, t_den=2).collect()))
    rel = sorted(
        map(tuple, jaccard_prefix_pairs(docs, t_num=1, t_den=2, reliable=True).collect())
    )
    assert fast == rel and fast  # identical and non-empty


def test_reliable_parity_ranking(spark):
    df = spark.createDataFrame(
        [(float(i % 7), str(i)) for i in range(50)], "k double, t string"
    )
    fast = sorted(
        map(tuple, with_global_row_number(df, "k", tiebreaks=[F.asc("t")]).collect())
    )
    rel = sorted(
        map(
            tuple,
            with_global_row_number(
                df, "k", tiebreaks=[F.asc("t")], reliable=True
            ).collect(),
        )
    )
    assert fast == rel


def test_reliable_parity_butterflies(spark, sf_smoke):
    fast = copurchase_butterflies(spark, sf_smoke, top_n=10).collect()
    rel = copurchase_butterflies(spark, sf_smoke, top_n=10, reliable=True).collect()
    assert list(map(tuple, fast)) == list(map(tuple, rel)) and fast
