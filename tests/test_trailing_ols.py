"""Trailing-window OLS (regression.trailing_ols): hand-computed
slopes, RANGE-frame gap semantics, pure-Python differential, oracle
parity."""

from __future__ import annotations

import pytest

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.operators.regression import (
    trailing_ols,
)

from tests.oracle_utils import assert_matches_oracle


def _py_slope(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    den = n * sxx - sx * sx
    if den == 0:
        return None
    return (n * sxy - sx * sy) / den


def test_trailing_ols_hand_computed_linear(spark):
    # perfectly linear y = 10x + 3: every full window has slope 10
    rows = [("g", x, 10 * x + 3) for x in range(1, 15)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.x: r for r in trailing_ols(df, ["g"], "x", "y", 7).collect()}
    assert got[1].slope is None and got[1].n_points == 1  # warm-up
    assert got[14].n_points == 7
    for x in range(2, 15):
        assert got[x].slope == pytest.approx(10.0, abs=1e-12)


def test_trailing_ols_gap_shrinks_window(spark):
    # x jumps 5 -> 20: the row at 20 sees ONLY itself (range frame),
    # a ROWS frame would have stretched back to stale points
    rows = [("g", x, x) for x in (1, 2, 3, 4, 5, 20, 21)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.x: r for r in trailing_ols(df, ["g"], "x", "y", 7).collect()}
    assert got[20].n_points == 1
    assert got[20].slope is None
    assert got[21].n_points == 2
    assert got[21].slope == pytest.approx(1.0)
    assert got[5].n_points == 5


def test_trailing_ols_differential_vs_python(spark):
    series = [(x, ((x * 31) % 17) * 100 + x) for x in range(100, 160)]
    rows = [("d", x, y) for x, y in series]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.x: r.slope for r in trailing_ols(df, ["g"], "x", "y", 7).collect()}
    for i, (x, _) in enumerate(series):
        window = [(a, b) for a, b in series if x - 6 <= a <= x]
        expect = _py_slope(window)
        if expect is None:
            assert got[x] is None
        else:
            assert got[x] == pytest.approx(expect, rel=1e-12)


def test_events_trailing_slope_oracle(spark, sf_check):
    assert_matches_oracle(
        registry.QUERIES["events_trailing_slope"](spark, sf_check),
        registry.ORACLES["events_trailing_slope"],
        sf_check,
    )
