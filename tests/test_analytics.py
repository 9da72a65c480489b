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
