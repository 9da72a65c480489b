"""Benford first-digit audit (drift.benford_first_digit) and Lorenz
decile shares (customer_spend_lorenz): hand-computed values, loud
validation, invariants, oracle parity."""

from __future__ import annotations

import math

import pytest

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.operators.drift import (
    benford_first_digit,
)

from tests.oracle_utils import assert_matches_oracle


def test_benford_hand_computed(spark):
    # amounts chosen so digits 1,2,9 appear; 3..8 get spine rows
    rows = [(100,), (12345,), (199,), (2,), (250,), (987,)]
    df = spark.createDataFrame(rows, "cents long")
    got = {r.digit: r for r in benford_first_digit(df, "cents").collect()}
    assert set(got) == set(range(1, 10))
    assert got[1].observed == 3
    assert got[2].observed == 2
    assert got[9].observed == 1
    assert got[5].observed == 0
    assert all(got[d].total_n == 6 for d in got)
    for d in range(1, 10):
        p = round(math.log10(1 + 1 / d), 9)
        assert got[d].benford_p == pytest.approx(p, abs=1e-12)
        assert got[d].expected == pytest.approx(6 * p, rel=1e-12)
    # chi2 equals the sum of per-digit terms, identical on every row
    chi2 = sum(
        round((got[d].observed - got[d].expected) ** 2 / got[d].expected, 9)
        for d in range(1, 10)
    )
    assert {round(got[d].chi2, 9) for d in got} == {round(chi2, 9)}


def test_benford_shares_sum_to_one(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 500)], "cents long")
    out = benford_first_digit(df, "cents").collect()
    assert sum(r.observed_share for r in out) == pytest.approx(1.0, abs=1e-12)
    assert sum(r.benford_p for r in out) == pytest.approx(1.0, abs=1e-8)


def test_benford_nonpositive_raises(spark):
    df = spark.createDataFrame([(100,), (0,)], "cents long")
    with pytest.raises(Exception, match="non-positive"):
        benford_first_digit(df, "cents").collect()


def test_lorenz_invariants(spark, sf_check):
    rows = registry.QUERIES["customer_spend_lorenz"](spark, sf_check).collect()
    assert [r.decile for r in rows] == list(range(10))
    # equal-population split: decile sizes differ by at most 1
    sizes = [r.n_customers for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # ascending-spend deciles: cents and cum_share monotone, curve
    # convex below the diagonal, ending at exactly 1
    assert all(a.cents <= b.cents for a, b in zip(rows, rows[1:]))
    cums = [r.cum_share for r in rows]
    assert all(a < b for a, b in zip(cums, cums[1:]))
    assert cums[-1] == pytest.approx(1.0, abs=1e-12)
    for i, r in enumerate(rows):
        assert r.cum_share <= (i + 1) / 10 + 1e-12
    assert sum(r.share_of_total for r in rows) == pytest.approx(1.0, abs=1e-9)


def test_orders_benford_oracle(spark, sf_check):
    assert_matches_oracle(
        registry.QUERIES["orders_benford"](spark, sf_check),
        registry.ORACLES["orders_benford"],
        sf_check,
    )


def test_customer_spend_lorenz_oracle(spark, sf_check):
    assert_matches_oracle(
        registry.QUERIES["customer_spend_lorenz"](spark, sf_check),
        registry.ORACLES["customer_spend_lorenz"],
        sf_check,
    )
