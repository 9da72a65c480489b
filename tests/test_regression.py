"""Closed-form OLS (operators/regression.py): exact-line recovery,
degenerate groups, and oracle parity for the trend/Zipf queries."""

from __future__ import annotations

import pytest

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.operators.regression import ols_fit

from tests.oracle_utils import assert_matches_oracle


def test_ols_recovers_exact_line(spark):
    # y = 3x + 7, exactly: slope/intercept exact, r2 == 1
    rows = [("g", x, 3 * x + 7) for x in range(10)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = ols_fit(df, ["g"], "x", "y").collect()[0]
    assert r.n_points == 10
    assert r.slope == pytest.approx(3.0, abs=1e-12)
    assert r.intercept == pytest.approx(7.0, abs=1e-12)
    assert r.r2 == pytest.approx(1.0, abs=1e-12)


def test_ols_known_imperfect_fit(spark):
    # hand-computed: points (0,0), (1,1), (2,4) -> slope 2, icpt -1/3
    df = spark.createDataFrame(
        [("g", 0, 0), ("g", 1, 1), ("g", 2, 4)], "g string, x long, y long"
    )
    r = ols_fit(df, ["g"], "x", "y").collect()[0]
    assert r.slope == pytest.approx(2.0, abs=1e-12)
    assert r.intercept == pytest.approx(-1 / 3, abs=1e-12)
    # r2 = num^2/(den*ydev) = 36/(18*2*13-...) hand value: Sxy=9,Sx=3,
    # Sy=5,Sxx=5,Syy=17,n=3 -> num=12, den=6, ydev=26 -> 144/156
    assert r.r2 == pytest.approx(144 / 156, abs=1e-12)


def test_ols_constant_x_group_dropped_constant_y_kept(spark):
    df = spark.createDataFrame(
        [("flat_x", 5, 1), ("flat_x", 5, 2), ("flat_y", 1, 4), ("flat_y", 2, 4)],
        "g string, x long, y long",
    )
    rows = {r.g: r for r in ols_fit(df, ["g"], "x", "y").collect()}
    assert set(rows) == {"flat_y"}  # constant x: no defined slope
    assert rows["flat_y"].slope == 0.0
    assert rows["flat_y"].r2 is None  # no variance to explain


def test_ols_multiple_groups_one_pass(spark):
    rows = [("a", x, 2 * x) for x in range(5)] + [
        ("b", x, 100 - 5 * x) for x in range(5)
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r.slope for r in ols_fit(df, ["g"], "x", "y").collect()}
    assert got["a"] == pytest.approx(2.0) and got["b"] == pytest.approx(-5.0)


def test_nation_revenue_trend_oracle(spark, sf_check):
    assert_matches_oracle(
        registry.QUERIES["nation_revenue_trend"](spark, sf_check),
        registry.ORACLES["nation_revenue_trend"],
        sf_check,
    )


def test_zipf_word_fit_oracle_and_shape(spark, sf_check):
    df = registry.QUERIES["zipf_word_fit"](spark, sf_check)
    assert_matches_oracle(df, registry.ORACLES["zipf_word_fit"], sf_check)
    r = df.collect()[0]
    # the synthetic corpus has a tiny near-uniform vocabulary (31
    # words at sf0.01), so only the direction is asserted: frequency
    # still decays with rank, and r2 is a valid proportion
    assert 0 < r.n_words <= 500
    assert r.slope < 0
    assert 0 <= r.r2 <= 1
