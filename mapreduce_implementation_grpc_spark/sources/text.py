"""Text-corpus ingest.

Reference surface covered (SURVEY.md section 2a):
  O1 HDFS text scan  (greeter_client.cc:298-314) -> spark.read.text
  O4 range partition (greeter_client.cc:362-390) -> input splits /
     repartition; the reference's contiguous 4-way line split is
     order-irrelevant for word count, so any partitioning is
     semantically equivalent. ``with_task_id`` reproduces the
     reference's *observable* task-id bookkeeping (task number
     prepended to each payload, greeter_client.cc:268) as a
     deterministic column rather than a string prefix.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_corpus(spark: SparkSession, path: str, min_partitions: int | None = None) -> DataFrame:
    """O1: newline-delimited text -> DataFrame[line: string].

    Unlike the reference (whole file into one master-side string),
    Spark assigns byte-range splits to executors; 100 TB of text
    never touches the driver.
    """
    df = spark.read.text(path).withColumnRenamed("value", "line")
    if min_partitions and df.rdd.getNumPartitions() < min_partitions:
        df = df.repartition(min_partitions)
    return df


def read_csv_table(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    """CSV source with explicit schema (schema inference is a full
    extra pass over the data -- never acceptable at 100 TB; callers
    pass the schema)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "false")
    return reader.csv(path)


def read_jsonl_table(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Newline-delimited JSON source with explicit schema (same
    no-inference rule as CSV)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def corpus_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's standard corpus: documents.text as one line per doc.

    Column-pruned scan: only doc_id/text are read from parquet.
    """
    path = os.path.join(sf_dir, "documents.parquet")
    return spark.read.parquet(path).select("doc_id", F.col("text").alias("line"))


def task_id_col(key: Column, num_tasks: int = 4) -> Column:
    """Deterministic task id mirroring the reference's 4-way split
    (greeter_client.cc:362-368). Uses key % n rather than contiguous
    ranges: word count is partition-invariant (SURVEY.md section 1),
    and modulo assignment is reproducible across runs/oracles while
    contiguous byte ranges are not."""
    return (key % num_tasks).cast("int")


def with_task_id(df: DataFrame, key: str = "doc_id", num_tasks: int = 4) -> DataFrame:
    return df.withColumn("task_id", task_id_col(F.col(key), num_tasks))


def read_orc_table(spark: SparkSession, path: str) -> DataFrame:
    """Columnar ORC scan: filter pushdown + column pruning apply as
    with parquet (plan-shape asserted in tests/test_sources_sinks)."""
    return spark.read.orc(path)
