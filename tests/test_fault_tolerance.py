"""O13 subsumption evidence: the reference re-dispatches a map task
when its worker dies (greeter_client.cc:262-278, manual scheduler
loop). In Spark that whole control plane is `spark.task.maxFailures`
-- this test makes a task FAIL on its first attempt and shows the
scheduler re-runs it and the job still returns the exact word count,
with no engine code involved.

Needs its own SparkSession: local[N] defaults to fail-fast
(maxFailures=1); `local[2, 2]` allows one retry per task."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pytest
from pyspark.sql import SparkSession

from mapreduce_implementation_grpc_spark.operators import word_count


@pytest.fixture(scope="module")
def retry_spark():
    spark = (
        SparkSession.builder.master("local[2, 2]")
        .appName("fault-tolerance")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_task_retry_recovers_exact_result(retry_spark):
    from pyspark import TaskContext

    docs = retry_spark.createDataFrame(
        [(i, "hello world") for i in range(8)], "doc_id long, text string"
    ).repartition(2)

    def flaky(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        # first attempt of partition 0 dies mid-flight -- the crashed
        # worker of the reference's scenario
        if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
            raise RuntimeError("simulated worker death")
        yield from batches

    survived = docs.mapInPandas(flaky, "doc_id long, text string")
    got = {r.word: r.cnt for r in word_count(survived, "text").collect()}
    assert got == {"hello": 8, "world": 8}  # nothing lost, nothing doubled
