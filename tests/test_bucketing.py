"""Bucketed tables: a co-located join must not shuffle either side.

At 100 TB, pre-bucketing fact tables on their join key turns every
orders-lineitem style join into a zero-exchange zip of bucket files
-- this test proves the engine's session produces that plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory, sf_smoke):
    wh = tmp_path_factory.mktemp("warehouse")
    # tables are external (explicit path option), so the static
    # warehouse.dir conf is left alone
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    orders = load_table(spark, sf_smoke, "orders")
    li = load_table(spark, sf_smoke, "lineitem")
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
        "path", str(wh / "orders_b")
    ).saveAsTable("orders_b")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
        "path", str(wh / "lineitem_b")
    ).saveAsTable("lineitem_b")
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(warehouse):
    spark = warehouse
    # disable broadcast so the join strategy decision is about
    # co-location, not size
    joined = (
        spark.table("lineitem_b")
        .hint("merge")
        .join(spark.table("orders_b"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_section = plan.split("SortMergeJoin")[1].split("HashAggregate")[0] if "SortMergeJoin" in plan else plan
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan, join_section
    # correctness: same result as the unbucketed join
    base = (
        spark.table("lineitem_b")
        .join(spark.table("orders_b"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert base == joined.agg(F.sum("n")).collect()[0][0]
