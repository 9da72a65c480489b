"""Weighted median (robust.weighted_median) and chi-square
contingency cells (evalmetrics.chi_square_cells): hand-computed
values, pure-Python differentials, oracle parity."""

from __future__ import annotations

import pytest

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.operators.evalmetrics import (
    chi_square_cells,
)
from mapreduce_implementation_grpc_spark.operators.robust import (
    weighted_median,
)

from tests.oracle_utils import assert_matches_oracle


def test_weighted_median_hand_computed(spark):
    # g1: values 1(w5) 2(w1) 3(w1): half of 7 is reached at v=1
    # g2: values 10(w1) 20(w1): 2*1 >= 2 -> lower median 10
    # g3: value mass concentrated at the top: 1(w1) 9(w9) -> 9
    rows = [
        ("g1", 1, 5), ("g1", 2, 1), ("g1", 3, 1),
        ("g2", 10, 1), ("g2", 20, 1),
        ("g3", 1, 1), ("g3", 9, 9),
    ]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = {r.g: (r.weighted_median, r.total_weight) for r in weighted_median(df, "g", "v", "w").collect()}
    assert got == {"g1": (1, 7), "g2": (10, 2), "g3": (9, 10)}


def test_weighted_median_equal_weights_is_lower_median(spark):
    rows = [("g", v, 1) for v in (3, 1, 4, 1, 5, 9, 2, 6)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    r = weighted_median(df, "g", "v", "w").collect()[0]
    assert r.weighted_median == 3  # lower median of 1,1,2,3,4,5,6,9


def test_weighted_median_zero_weight_group_dropped(spark):
    rows = [("z", 5, 0), ("k", 5, 2)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = {r.g for r in weighted_median(df, "g", "v", "w").collect()}
    assert got == {"k"}


def test_chi_square_differential_vs_python(spark):
    rows = []
    for i in range(300):
        rows.append((f"r{i % 3}", f"c{(i * 7 + i // 9) % 4}"))
    df = spark.createDataFrame(rows, "a string, b string")
    got = chi_square_cells(df, "a", "b").collect()
    from collections import Counter

    obs = Counter(rows)
    rt = Counter(a for a, _ in rows)
    ct = Counter(b for _, b in rows)
    n = len(rows)
    chi2 = sum(
        round((o * n - rt[a] * ct[b]) ** 2 / (rt[a] * ct[b] * n), 9)
        for (a, b), o in obs.items()
    )
    for r in got:
        assert r.observed == obs[(r.a, r.b)]
        assert r.expected == pytest.approx(rt[r.a] * ct[r.b] / n, rel=1e-12)
        assert r.dof == (3 - 1) * (4 - 1)
        assert r.chi2 == pytest.approx(chi2, abs=1e-9)
    # only observed cells appear (zero cells contribute e, not o --
    # documented cell-grain contract)
    assert len(got) == len(obs)


def test_chi_square_independent_uniform_is_small(spark):
    # perfectly independent layout: chi2 == 0 exactly
    rows = [(f"r{i % 2}", f"c{i % 3}") for i in range(600)]
    df = spark.createDataFrame(rows, "a string, b string")
    out = chi_square_cells(df, "a", "b").collect()
    assert all(r.term == 0.0 for r in out)
    assert out[0].chi2 == 0.0


def test_brand_weighted_median_oracle(spark, sf_check):
    assert_matches_oracle(
        registry.QUERIES["brand_weighted_median"](spark, sf_check),
        registry.ORACLES["brand_weighted_median"],
        sf_check,
    )


def test_segment_nation_chisq_oracle(spark, sf_check):
    assert_matches_oracle(
        registry.QUERIES["segment_nation_chisq"](spark, sf_check),
        registry.ORACLES["segment_nation_chisq"],
        sf_check,
    )
