"""Group-scoped two-level cumsum (robust._grouped_cumsum and the
scalable=True paths of weighted_median / trimmed_mean): bit-identical
to the naive per-group windows, on adversarial all-distinct data and
on the corpus queries' own inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark.operators.robust import (
    trimmed_mean,
    weighted_median,
)
from mapreduce_implementation_grpc_spark.sources.catalog import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_weighted_median_scalable_parity_all_distinct(spark):
    # every value distinct (the regime the naive window loses in),
    # hash-scattered so buckets fill unevenly
    facts = spark.range(20_000).select(
        (F.col("id") % 7).cast("string").alias("g"),
        F.abs(F.xxhash64("id")).alias("v"),
        (F.abs(F.xxhash64("id", F.lit(1))) % 100 + 1).alias("w"),
    )
    naive = weighted_median(facts, "g", "v", "w")
    fast = weighted_median(facts, "g", "v", "w", scalable=True)
    assert _rows(naive) == _rows(fast)


def test_trimmed_mean_scalable_parity_with_ties(spark):
    facts = spark.range(30_000).select(
        (F.col("id") % 5).cast("string").alias("g"),
        (F.abs(F.xxhash64("id")) % 997).alias("v"),
    )
    naive = trimmed_mean(facts, "g", "v")
    fast = trimmed_mean(facts, "g", "v", scalable=True)
    assert _rows(naive) == _rows(fast)


def test_scalable_parity_on_corpus_inputs(spark, sf_check):
    li = load_table(spark, sf_check, "lineitem")
    part = load_table(spark, sf_check, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == part.p_partkey,
    ).select(
        "p_brand",
        F.col("l_quantity").cast("decimal(12,2)").cast("long").alias("qty"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    assert _rows(weighted_median(j, "p_brand", "qty", "cents")) == _rows(
        weighted_median(j, "p_brand", "qty", "cents", scalable=True)
    )
    ev = load_table(spark, sf_check, "events").select(
        "event_type",
        (F.col("value").cast("decimal(12,2)") * 100).cast("long").alias("c"),
    )
    assert _rows(trimmed_mean(ev, "event_type", "c")) == _rows(
        trimmed_mean(ev, "event_type", "c", scalable=True)
    )


def test_scalable_plan_has_no_group_grain_sort(spark):
    """The scalable plan's only window sorts are per-(g, _bkt) local
    and per-g over the <= 1024-row bucket aggregate: no Window whose
    partition is the bare group over the full grain. Pinned by
    checking the plan sorts on (g, _bkt) before the offsets join."""
    facts = spark.range(50_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.abs(F.xxhash64("id")).alias("v"),
        F.lit(1).alias("w"),
    )
    plan = (
        weighted_median(facts, "g", "v", "w", scalable=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # every window sort key list that includes g must also include
    # _bkt (the local stage) -- a sort on g alone would be the naive
    # per-group grain sort sneaking back in
    for m in re.finditer(r"Sort \[(.*?)\]", plan):
        keys = m.group(1)
        if "g#" in keys and "_ak" not in keys and "v#" in keys:
            assert "_bkt" in keys, f"grain-wide per-group sort: {keys}"


def test_parameter_guards_raise(spark):
    """Degenerate parameters fail loudly at build time, not with
    NaN/short output at execution time."""
    import pytest

    from mapreduce_implementation_grpc_spark.operators.curation import (
        stratified_sample,
    )
    from mapreduce_implementation_grpc_spark.operators.regression import (
        trailing_ols,
    )

    df = spark.createDataFrame([("g", 1, 1)], "g string, v long, w long")
    with pytest.raises(ValueError, match="collides"):
        weighted_median(df, "g", "v", "w", out_col="total_weight")
    with pytest.raises(ValueError, match="trim_pct"):
        trimmed_mean(df, "g", "v", trim_pct=50)
    with pytest.raises(ValueError, match="width"):
        trailing_ols(df, ["g"], "v", "w", width=0)
    docs = spark.createDataFrame([("en", 1)], "lang string, doc_id long")
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(docs, num=3, den=2)
