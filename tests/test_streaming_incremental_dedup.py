"""Batch-vs-stream parity for streaming_incremental_dedup (round 8):
the unbounded corpus-fingerprint dedup contract of
operators/incremental.incremental_dedup_exact, streamed.

Parity claims checked:
1. the final novel set equals the batch rule (first doc_id per
   fingerprint wins) over the union of microbatches;
2. the cross-batch incremental contract: batch-2 novel docs ==
   incremental_dedup_exact(batch2, batch1) minus batch-2-internal
   duplicates -- i.e. the persisted state IS the corpus fingerprint
   set the batch operator says to keep between runs;
3. replay idempotence: re-delivering batch 1's files after batch 2
   adds no new verdict facts (same doc re-emits the same verdict).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)

DOCS = [
    (1, "Alpha beta gamma"),
    (2, "delta epsilon"),
    (3, "alpha  BETA gamma"),   # normalizes equal to doc 1
    (4, "zeta eta"),
    (5, "Delta Epsilon"),       # normalizes equal to doc 2
    (6, "alpha beta gamma"),    # equal to doc 1 again, later batch
    (7, "theta iota"),
]
BATCH1 = DOCS[:4]
BATCH2 = DOCS[4:]


def _write(path, rows, name):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _collect(spark, table):
    return {
        r.doc_id: r
        for r in spark.sql(f"SELECT DISTINCT * FROM {table}").collect()
    }


def test_streaming_incremental_dedup_matches_batch_contract(spark, tmp_path):
    from mapreduce_implementation_grpc_spark.operators.incremental import (
        incremental_dedup_exact,
    )
    from mapreduce_implementation_grpc_spark.streaming import (
        streaming_incremental_dedup,
    )

    src = str(tmp_path / "docs")
    _write(src, BATCH1, "b1.json")
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).json(src)
    out = streaming_incremental_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("inc_dedup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _write(src, BATCH2, "b2.json")
        deadline = time.time() + 60
        rows = {}
        while time.time() < deadline:
            q.processAllAvailable()
            rows = _collect(spark, "inc_dedup")
            if len(rows) == len(DOCS):
                break
            time.sleep(1)
        assert len(rows) == len(DOCS), sorted(rows)

        # 1. final novel set == batch first-doc_id-per-fingerprint rule
        batch_all = spark.createDataFrame(DOCS, "doc_id long, text string")
        from pyspark.sql import functions as F

        from mapreduce_implementation_grpc_spark.operators.normalize import (
            normalized_col,
        )

        fp = batch_all.select(
            "doc_id", F.md5(normalized_col("text")).alias("fp")
        )
        firsts = {
            r.first
            for r in fp.groupBy("fp").agg(F.min("doc_id").alias("first")).collect()
        }
        got_novel = {d for d, r in rows.items() if r.novel}
        assert got_novel == firsts, (got_novel, firsts)
        # verdicts point at the canonical first doc
        for d, r in rows.items():
            assert (r.first_doc_id == d) == r.novel

        # 2. incremental contract: batch-2 novels == batch anti-join
        #    result (batch2 vs batch1 corpus) minus batch-2-internal dups
        b1_df = spark.createDataFrame(BATCH1, "doc_id long, text string")
        b2_df = spark.createDataFrame(BATCH2, "doc_id long, text string")
        anti = {
            r.doc_id for r in incremental_dedup_exact(b2_df, b1_df).collect()
        }
        stream_b2_novel = {
            d for d in got_novel if d in {x for x, _ in BATCH2}
        }
        assert stream_b2_novel == anti == {7}

        # 3. replay idempotence: redeliver batch 1 as a new file --
        #    verdict FACTS are unchanged (distinct set identical)
        _write(src, BATCH1, "b1_replay.json")
        q.processAllAvailable()
        replayed = _collect(spark, "inc_dedup")
        assert {
            (d, r.novel, r.first_doc_id) for d, r in replayed.items()
        } == {(d, r.novel, r.first_doc_id) for d, r in rows.items()}
    finally:
        q.stop()
