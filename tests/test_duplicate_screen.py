"""Duplicate-charge screen (duplicate_charge_screen): synthetic
chain semantics, boundary behavior, oracle parity on the real data
(which legitimately yields few hits -- exact-amount collisions ARE
the anomaly)."""

from __future__ import annotations

import datetime

from pyspark.sql import Window, functions as F

from mapreduce_implementation_grpc_spark import registry

from tests.oracle_utils import assert_matches_oracle


def _screen(spark, rows):
    """Run the query's exact tail arithmetic on injected events."""
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, cents long, "
        "event_id long, _us long"
    )
    w = Window.partitionBy("user_id", "event_type", "cents").orderBy(
        F.asc("_us"), F.asc("event_id")
    )
    lagged = df.select(
        "user_id", "event_type", "cents",
        F.lag("event_id").over(w).alias("first_event_id"),
        F.col("event_id").alias("second_event_id"),
        (F.col("_us") - F.lag("_us").over(w)).alias("gap_us"),
    )
    return (
        lagged.filter(
            F.col("first_event_id").isNotNull()
            & (F.col("gap_us") <= F.lit(604_800_000_000))  # 7d in us
        )
        .orderBy("second_event_id")
        .collect()
    )


DAY_US = 24 * 3600 * 1_000_000


def test_chain_of_m_duplicates_yields_m_minus_1_pairs(spark):
    rows = [
        (1, "purchase", 999, k, k * DAY_US) for k in (1, 2, 3)  # 3-chain
    ] + [
        (1, "purchase", 500, 10, 0),          # different amount: alone
        (2, "purchase", 999, 20, 0),          # different user: alone
        (1, "click", 999, 30, 0),             # different type: alone
    ]
    got = _screen(spark, rows)
    assert [(r.first_event_id, r.second_event_id) for r in got] == [
        (1, 2),
        (2, 3),
    ]
    assert all(r.gap_us == DAY_US for r in got)


def test_boundary_exactly_7_days_included_beyond_excluded(spark):
    rows = [
        (1, "p", 100, 1, 0),
        (1, "p", 100, 2, 7 * DAY_US),        # exactly 7 days: kept
        (1, "q", 100, 3, 0),
        (1, "q", 100, 4, 7 * DAY_US + 1),    # one microsecond over: out
    ]
    got = _screen(spark, rows)
    assert [(r.first_event_id, r.second_event_id) for r in got] == [(1, 2)]


def test_equal_timestamp_ties_pair_by_event_id(spark):
    rows = [(1, "p", 100, 5, 42), (1, "p", 100, 3, 42)]
    got = _screen(spark, rows)
    assert [(r.first_event_id, r.second_event_id) for r in got] == [(3, 5)]
    assert got[0].gap_us == 0


def test_duplicate_charge_screen_oracle(spark, sf_check):
    assert_matches_oracle(
        registry.QUERIES["duplicate_charge_screen"](spark, sf_check),
        registry.ORACLES["duplicate_charge_screen"],
        sf_check,
    )
