"""applyInPandasWithState: state persists across microbatches."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from mapreduce_implementation_grpc_spark.streaming import streaming_user_totals_stateful

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
    ]
)


def _write_batch(path, rows, name):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for eid, ts, uid, v in rows:
            f.write(json.dumps({"event_id": eid, "ts": ts, "user_id": uid, "value": v}) + "\n")


def test_state_accumulates_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "ev")
    _write_batch(src, [(1, "2024-01-01 10:00:00", 1, 2.5), (2, "2024-01-01 10:01:00", 2, 1.0)], "b1.json")
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    out = streaming_user_totals_stateful(stream)
    q = out.writeStream.format("memory").queryName("user_totals").outputMode("update").start()
    try:
        q.processAllAvailable()
        # second microbatch arrives after the first is fully processed
        _write_batch(src, [(3, "2024-01-01 10:02:00", 1, 7.5)], "b2.json")
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            rows = {r.user_id: r for r in spark.sql(
                "SELECT user_id, max_by(n_events, n_events) AS n_events, max_by(total_value, n_events) AS total_value "
                "FROM user_totals GROUP BY user_id").collect()}
            if rows.get(1) is not None and rows[1].n_events == 2:
                break
            time.sleep(1)
        assert rows[1].n_events == 2 and rows[1].total_value == 10.0  # state carried over
        assert rows[2].n_events == 1 and rows[2].total_value == 1.0
    finally:
        q.stop()
