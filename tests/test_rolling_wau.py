"""Rolling 7-day WAU (events_rolling_wau): window-algebra
invariants, pure-Python differential, oracle parity."""

from __future__ import annotations

import datetime

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.sources.catalog import load_table

from tests.oracle_utils import assert_matches_oracle


def test_rolling_wau_differential_vs_python(spark, sf_check):
    ud = {
        (r.user_id, r.d)
        for r in load_table(spark, sf_check, "events")
        .selectExpr("user_id", "to_date(ts) AS d")
        .distinct()
        .collect()
    }
    days = sorted({d for _, d in ud})
    got = {
        r.day: (r.dau, r.wau, r.stickiness)
        for r in registry.QUERIES["events_rolling_wau"](
            spark, sf_check
        ).collect()
    }
    assert set(got) == {d.strftime("%Y-%m-%d") for d in days}
    for day in days:
        lo = day - datetime.timedelta(days=6)
        dau = len({u for u, d in ud if d == day})
        wau = len({u for u, d in ud if lo <= d <= day})
        g_dau, g_wau, g_st = got[day.strftime("%Y-%m-%d")]
        assert (g_dau, g_wau) == (dau, wau)
        assert g_st == dau / wau
        # window algebra: dau <= wau <= 7-day dau sum
        assert dau <= wau


def test_rolling_wau_oracle(spark, sf_check):
    assert_matches_oracle(
        registry.QUERIES["events_rolling_wau"](spark, sf_check),
        registry.ORACLES["events_rolling_wau"],
        sf_check,
    )
