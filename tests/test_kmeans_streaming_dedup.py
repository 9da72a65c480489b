"""K-means coarse quantizer properties + streaming dedup behavior."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from mapreduce_implementation_grpc_spark.operators.kmeans import (
    _assign,
    _centroids_from,
    kmeans_cells,
)
from mapreduce_implementation_grpc_spark.streaming import streaming_dedup


@pytest.fixture(scope="module")
def clustered_emb(spark):
    # two tight clusters around (1,0) and (0,1), plus one dup pair
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.05]),
        Row(vec_id=1, embedding=[0.95, 0.0]),
        Row(vec_id=2, embedding=[1.0, 0.05]),   # dup of 0
        Row(vec_id=3, embedding=[0.0, 1.0]),
        Row(vec_id=4, embedding=[0.05, 0.95]),
        Row(vec_id=5, embedding=[0.0, 1.05]),
    ]
    return spark.createDataFrame(rows).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_kmeans_separates_clusters_and_groups_dups(clustered_emb):
    cells = {r.vec_id: r.cell for r in kmeans_cells(clustered_emb, k=2, n_iter=4).collect()}
    assert cells[0] == cells[1] == cells[2]       # cluster A together (incl. dup)
    assert cells[3] == cells[4] == cells[5]       # cluster B together
    assert cells[0] != cells[3]


def test_kmeans_inertia_nonincreasing(clustered_emb):
    prev = None
    for n in (1, 2, 4):
        assigned = kmeans_cells(clustered_emb, k=2, n_iter=n)
        inertia = assigned.agg(F.sum("obj")).collect()[0][0]
        if prev is not None:
            assert inertia <= prev + 1e-9
        prev = inertia


def test_kmeans_cells_on_real_embeddings(spark, sf_check):
    from mapreduce_implementation_grpc_spark import registry

    cells = registry.QUERIES["kmeans_cells"](spark, sf_check)
    counts = cells.groupBy("cell").count().collect()
    assert cells.count() == 500
    assert len(counts) == 8                       # all 8 cells survive
    assert all(r["count"] > 0 for r in counts)


DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("text", StringType()),
    ]
)


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "docs")
    os.makedirs(src, exist_ok=True)

    def write(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for doc_id, ts, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "ts": ts, "text": text}) + "\n")

    write("b1.json", [(1, "2024-01-01 10:00:00", "Hello World"),
                      (2, "2024-01-01 10:01:00", "hello, world!")])  # dup after normalize
    stream = spark.readStream.schema(DOC_SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    out = streaming_dedup(stream, watermark="2 hours")
    q = out.writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try:
        q.processAllAvailable()
        write("b2.json", [(3, "2024-01-01 10:05:00", "HELLO world"),   # dup again
                          (4, "2024-01-01 10:06:00", "fresh content here")])
        q.processAllAvailable()
        got = {r.doc_id for r in spark.sql("SELECT doc_id FROM dedup_stream").collect()}
        assert 4 in got                       # new content passes
        assert 3 not in got                   # cross-batch duplicate dropped
        assert len(got & {1, 2}) == 1         # exactly one of the in-batch dups
    finally:
        q.stop()
