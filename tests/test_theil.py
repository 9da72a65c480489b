"""Theil T index (customer_spend_theil): inequality-measure
properties and oracle parity."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from mapreduce_implementation_grpc_spark import registry

from tests.oracle_utils import assert_matches_oracle


def _theil_tail(spark, cents_rows):
    """Rebuild the query's term arithmetic on injected spends."""
    spend = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents_rows)], "custkey long, cents long"
    )
    tot = spend.agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").alias("total_cents"),
    )
    cd = F.col("cents").cast("double")
    nd = F.col("n_customers").cast("double")
    td = F.col("total_cents").cast("double")
    lr = F.round(F.log(cd * nd / td), 9)
    term9 = F.round((cd / td) * lr, 9).cast("decimal(20,9)")
    return (
        spend.filter(F.col("cents") > 0)
        .crossJoin(F.broadcast(tot))
        .groupBy("n_customers", "total_cents")
        .agg(F.sum(term9).cast("string").cast("double").alias("theil"))
        .collect()[0]
    )


def test_theil_perfect_equality_is_zero(spark):
    r = _theil_tail(spark, [500] * 20)
    assert r.theil == 0.0


def test_theil_concentration_approaches_ln_n(spark):
    # one customer holds everything: T -> ln(n) exactly in the limit
    n = 16
    r = _theil_tail(spark, [10_000_000] + [1] * (n - 1))
    assert r.theil == pytest.approx(math.log(n), rel=1e-3)
    # and inequality is ordered: mild spread < extreme spread
    mild = _theil_tail(spark, [400 + 10 * i for i in range(20)])
    assert 0 < mild.theil < r.theil


def test_theil_differential_vs_python(spark):
    cents = [((i * 37) % 97 + 1) * 100 for i in range(50)]
    tot, n = sum(cents), len(cents)
    expect = sum(
        round(
            (c / tot) * round(math.log(c * n / tot), 9),
            9,
        )
        for c in cents
    )
    r = _theil_tail(spark, cents)
    assert r.theil == pytest.approx(expect, abs=1e-9)


def test_customer_spend_theil_oracle(spark, sf_check):
    assert_matches_oracle(
        registry.QUERIES["customer_spend_theil"](spark, sf_check),
        registry.ORACLES["customer_spend_theil"],
        sf_check,
    )
