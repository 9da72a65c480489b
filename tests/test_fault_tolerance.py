"""O13 subsumption evidence: the reference re-dispatches a map task
when its worker dies (greeter_client.cc:262-278, manual scheduler
loop). In Spark that whole control plane is `spark.task.maxFailures`
-- this test makes a task FAIL on its first attempt and shows the
scheduler re-runs it and the job still returns the exact word count,
with no engine code involved.

Runs in a SUBPROCESS with its own `local[2, 2]` session: local[N]
defaults to fail-fast (maxFailures=1), and inside the suite
`getOrCreate()` would silently return the shared session-scoped
SparkSession (whose master is fixed) -- a same-process second session
is not possible, and stopping the shared one would torpedo every
later test."""

from __future__ import annotations

import subprocess
import sys

_DRIVER = r"""
import sys
from collections.abc import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import SparkSession

sys.path.insert(0, REPO_PATH)
from mapreduce_implementation_grpc_spark.operators import word_count

spark = (
    SparkSession.builder.master("local[2, 2]")
    .appName("fault-tolerance")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.createDataFrame(
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
assert got == {"hello": 8, "world": 8}, got  # nothing lost, nothing doubled
print("RETRY_OK")
spark.stop()
"""


def test_task_retry_recovers_exact_result():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER.replace("REPO_PATH", repr(repo))],
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "RETRY_OK" in proc.stdout
