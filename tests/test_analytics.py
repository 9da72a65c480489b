"""Relational analytics plans: oracle parity + plan-shape assertions
(the scale posture is part of the contract, not just the values)."""

from __future__ import annotations

import pytest

from mapreduce_implementation_grpc_spark import registry
from tests.oracle_utils import assert_matches_oracle

RELATIONAL = [
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "customer_order_ranks",
    "events_hourly",
    "events_sessionize",
    "events_json_stats",
    "user_retention",
    "cheapest_supplier",
    "nation_market_share",
    "events_last_per_user",
    "segment_event_stats",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_oracle_parity(spark, sf_check, name):
    assert_matches_oracle(
        registry.QUERIES[name](spark, sf_check), registry.ORACLES[name], sf_check
    )


def test_revenue_join_broadcasts_dimensions(spark, sf_check):
    plan = registry.QUERIES["revenue_by_nation"](spark, sf_check)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # dims must not shuffle the fact table


def test_pricing_summary_pushes_filter_to_scan(spark, sf_check):
    plan = registry.QUERIES["pricing_summary"](spark, sf_check)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_topn_uses_take_ordered(spark, sf_check):
    plan = registry.QUERIES["top_customers"](spark, sf_check)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global sort for top-k


def test_argmin_queries_use_agg_not_window(spark, sf_check):
    """cheapest_supplier and events_last_per_user promise argmin/argmax
    via struct-min/max aggregation: the plan must contain no Window
    (which would sort every fact row) and must partial-aggregate."""
    for name in ("cheapest_supplier", "events_last_per_user"):
        plan = (
            registry.QUERIES[name](spark, sf_check)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan, name
        assert "partial" in plan, name  # map-side combine before the exchange


def test_salted_join_replicates_dim_not_fact(spark, sf_check):
    """The salted join must explode the dimension side only; the join
    itself stays an equi-join (no nested-loop fallback)."""
    plan = (
        registry.QUERIES["segment_event_stats"](spark, sf_check)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan  # salt replication of the dim side
