"""ABC/Pareto classification and Gini coefficient: hand-computed and
invariant coverage over the registry queries."""

from __future__ import annotations

import pytest

from mapreduce_implementation_grpc_spark import registry


def test_abc_partition_and_shares(spark, sf_check):
    rows = {
        r.abc_class: r
        for r in registry.QUERIES["parts_abc_analysis"](
            spark, sf_check
        ).collect()
    }
    assert set(rows) == {"A", "B", "C"}
    # shares sum to 1 (per-class single divisions of exact micros)
    assert sum(r.revenue_share for r in rows.values()) == pytest.approx(
        1.0, abs=1e-12
    )
    # the Pareto shape: A has at most 80% of revenue in the FEWEST
    # parts; class boundaries are inclusive-integer so A <= 0.8
    assert rows["A"].revenue_share <= 0.8 + 1e-12
    assert rows["A"].revenue_share + rows["B"].revenue_share <= 0.95 + 1e-12
    # per-part revenue of A-class parts dominates C-class parts
    assert (
        rows["A"].revenue / rows["A"].n_parts
        > rows["C"].revenue / rows["C"].n_parts
    )


def test_gini_bounds_and_known_distributions(spark, sf_check):
    row = registry.QUERIES["customer_spend_gini"](spark, sf_check).collect()[0]
    assert 0.0 <= row.gini < 1.0
    assert row.n_customers > 0 and row.total_cents > 0


def test_gini_uniform_is_zero_and_concentrated_is_high(spark, tmp_path):
    """Build tiny orders tables on disk and run the registry query on
    them: equal spends -> G = 0 exactly; one customer holding ~all
    spend -> G near (n-1)/n."""
    import os

    for name, rows, check in [
        (
            "uniform",
            [(i, i % 10, 50.0) for i in range(100)],
            lambda g, n: g == 0.0,
        ),
        (
            "concentrated",
            [(0, 0, 1_000_000.0)] + [(i, i, 0.01) for i in range(1, 10)],
            lambda g, n: g > 0.85,
        ),
    ]:
        d = str(tmp_path / name)
        os.makedirs(d)
        spark.createDataFrame(
            rows, "o_orderkey bigint, o_custkey bigint, o_totalprice double"
        ).write.parquet(os.path.join(d, "orders.parquet"))
        got = registry.QUERIES["customer_spend_gini"](spark, d).collect()[0]
        assert check(got.gini, got.n_customers), (name, got.gini)
