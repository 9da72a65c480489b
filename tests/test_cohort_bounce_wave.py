"""Wave-10 r7 operators: cohort LTV triangle, session bounce rate,
shipping-delay percentile profile. Crafted hand checks + invariants.
(Oracle parity runs in the registry-wide sweep.)"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pytest

from mapreduce_implementation_grpc_spark import registry


def test_cohort_ltv_invariants(spark, sf_check):
    out = registry.QUERIES["customer_cohort_ltv"](spark, sf_check).collect()
    assert out
    from collections import defaultdict

    by_cohort = defaultdict(list)
    for r in out:
        assert 1 <= r.n_active <= r.cohort_size
        by_cohort[r.cohort_month].append(r)
    for rows in by_cohort.values():
        rows.sort(key=lambda r: r.age_months)
        assert rows[0].age_months == 0  # the cohort-defining order
        ltv = [r.cum_ltv_cents_per_customer for r in rows]
        assert ltv == sorted(ltv)  # revenue only accumulates


def test_cohort_ltv_hand_computed(spark):
    """Two customers: A orders in Jan (100.00) and Mar (50.00); B
    orders in Mar only (20.00). Cohorts: A=Jan, B=Mar."""
    rows = [
        (1, 10, "O", 100.0, dt.datetime(1995, 1, 10), "P"),
        (2, 10, "O", 50.0, dt.datetime(1995, 3, 5), "P"),
        (3, 20, "O", 20.0, dt.datetime(1995, 3, 7), "P"),
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(os.path.join(d, "orders.parquet"))
    out = {
        (r.cohort_month, r.age_months): r
        for r in registry.QUERIES["customer_cohort_ltv"](spark, d).collect()
    }
    jan = (1995 - 1992) * 12 + 1 - 1  # month index of 1995-01
    a0 = out[(jan, 0)]
    assert a0.cohort_size == 1 and a0.rev_cents == 10000.0
    assert a0.cum_ltv_cents_per_customer == 10000.0
    a2 = out[(jan, 2)]
    assert a2.cum_ltv_cents_per_customer == 15000.0
    b0 = out[(jan + 2, 0)]
    assert b0.cohort_size == 1 and b0.cum_ltv_cents_per_customer == 2000.0


def test_bounce_rate_invariants(spark, sf_check):
    out = registry.QUERIES["session_bounce_rate"](spark, sf_check).collect()
    assert out
    for r in out:
        assert 0.0 <= r.bounce_rate <= 1.0
        assert r.mean_events_per_session >= 1.0
        assert r.n_bounces <= r.n_sessions
        assert r.bounce_rate == pytest.approx(
            r.n_bounces / r.n_sessions, rel=1e-12
        )


def test_bounce_rate_crafted_sessions(spark):
    """User 1: lone 'ad' event (bounce), then >30min later a 'home'
    session of 3 events. Entry types carry the session outcome."""
    base = dt.datetime(2024, 1, 1, 8, 0, 0)
    rows = [
        (0, base, 1, "ad", 1.0, "{}"),
        (1, base + dt.timedelta(hours=2), 1, "home", 1.0, "{}"),
        (2, base + dt.timedelta(hours=2, minutes=5), 1, "click", 1.0, "{}"),
        (3, base + dt.timedelta(hours=2, minutes=10), 1, "buy", 1.0, "{}"),
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(os.path.join(d, "events.parquet"))
    out = {
        r.entry_type: r
        for r in registry.QUERIES["session_bounce_rate"](spark, d).collect()
    }
    assert set(out) == {"ad", "home"}
    assert out["ad"].bounce_rate == 1.0 and out["ad"].n_sessions == 1
    assert out["home"].bounce_rate == 0.0
    assert out["home"].mean_events_per_session == pytest.approx(3.0)


def test_delay_profile_invariants(spark, sf_check):
    out = registry.QUERIES["shipping_delay_profile"](spark, sf_check).collect()
    assert out
    for r in out:
        assert r.p50_delay_days <= r.p90_delay_days
        # (delays may be negative in the synthetic data -- ship date
        # is generated independently of order date)
        assert r.n_items >= 1


def test_delay_percentile_selection_hand_computed(spark):
    """Delays 1..10 in one month: p50 picks 5 ((n+1) div 2 = 5th),
    p90 picks 9 (first with 10*cm >= 9*10)."""
    d = tempfile.mkdtemp()
    orders = [(k, 1, "O", 1.0, dt.datetime(1995, 1, 1), "P") for k in range(10)]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(os.path.join(d, "orders.parquet"))
    li = [
        (k, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
         dt.datetime(1995, 1, 1) + dt.timedelta(days=k + 1))
        for k in range(10)
    ]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    r = registry.QUERIES["shipping_delay_profile"](spark, d).collect()[0]
    assert r.n_items == 10
    assert r.mean_delay_days == pytest.approx(5.5)
    assert r.p50_delay_days == 5
    assert r.p90_delay_days == 9


def test_order_gap_profile_invariants_and_hand_case(spark, sf_check):
    out = registry.QUERIES["segment_order_gap_profile"](
        spark, sf_check
    ).collect()
    assert out
    for r in out:
        assert r.median_gap_days <= r.p90_gap_days
        assert r.n_gaps >= 1 and r.mean_gap_days > 0
    # crafted: one customer, orders at days 0, 10, 20, 50 -> gaps
    # 10, 10, 30: median 10, p90 30, mean 50/3
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(1, "c", 1, 0.0, "SEGX")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).write.parquet(os.path.join(d, "customer.parquet"))
    orders = [
        (k, 1, "O", 1.0, dt.datetime(1995, 1, 1) + dt.timedelta(days=day), "P")
        for k, day in enumerate([0, 10, 20, 50])
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(os.path.join(d, "orders.parquet"))
    r = registry.QUERIES["segment_order_gap_profile"](spark, d).collect()[0]
    assert r.n_gaps == 3
    assert r.median_gap_days == 10 and r.p90_gap_days == 30
    assert r.mean_gap_days == pytest.approx(50 / 3)
