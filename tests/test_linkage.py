"""Fellegi-Sunter linkage (operators/linkage.py) on crafted records
with hand-computed scores."""

from __future__ import annotations

import pytest

from mapreduce_implementation_grpc_spark.operators.linkage import (
    fs_score_pairs,
    fs_weights,
)

M_SCHEMA = "custkey bigint, nm string, bal double, seg string, nat int, blk bigint"
C_SCHEMA = "contact_id bigint, nm string, bal double, seg string, nat int, blk bigint"


def _pairs(spark, masters, contacts):
    return fs_score_pairs(
        spark.createDataFrame(masters, M_SCHEMA),
        spark.createDataFrame(contacts, C_SCHEMA),
        ["nat", "blk"],
    ).collect()


def test_hand_computed_scores_and_classes(spark):
    w = fs_weights()
    masters = [(1, "alice", 10.5, "AUTO", 7, 10)]
    contacts = [
        (100, "alice", 10.5, "AUTO", 7, 10),  # all agree
        (101, "alic", 10.5, "AUTO", 7, 10),  # name corrupt
        (102, "alice", 10.9, "AUTO", 7, 10),  # balance corrupt
        (103, "alic", 10.9, "AUTO", 7, 10),  # both corrupt
        (104, "bob", 99.0, "BLDG", 7, 10),  # cross pair, only block agrees
    ]
    got = {r.contact_id: r for r in _pairs(spark, masters, contacts)}
    assert set(got) == {100, 101, 102, 103, 104}

    def expect(nm_a, bal_a, seg_a):
        return sum(
            w[f][0] if a else w[f][1]
            for f, a in zip(("nm", "bal", "seg"), (nm_a, bal_a, seg_a))
        )

    assert got[100].score == expect(True, True, True)
    assert got[100].is_match
    # single-field corruption survives the threshold...
    assert got[101].score == expect(False, True, True) and got[101].is_match
    assert got[102].score == expect(True, False, True) and got[102].is_match
    # ...double corruption is the documented FS false-negative class
    assert got[103].score == expect(False, False, True)
    assert not got[103].is_match
    assert not got[104].is_match


def test_blocking_prunes_pairs(spark):
    masters = [(1, "alice", 10.5, "AUTO", 7, 10)]
    contacts = [
        (200, "alice", 10.5, "AUTO", 8, 10),  # other nation
        (201, "alice", 99.5, "AUTO", 7, 99),  # other balance block
    ]
    assert _pairs(spark, masters, contacts) == []


def test_weights_are_log_likelihood_ratios(spark):
    import math

    for f, (wa, wd) in fs_weights().items():
        assert wa > 0 > wd, f
        # agree weight recovers m/u exactly
        m_over_u = 2.0**wa
        assert m_over_u == pytest.approx(
            {"nm": 95.0, "bal": 45.0, "seg": 4.75}[f], rel=1e-12
        )
        assert math.isfinite(wd)


def test_golden_records_hand_survivorship(spark):
    """3-member cluster: longest name wins, the 2-vote balance beats
    the 1-vote corruption, frequency beats lexicographic for seg."""
    from pyspark.sql import functions as F

    from mapreduce_implementation_grpc_spark.operators.linkage import (
        golden_records,
    )

    master = spark.createDataFrame(
        [(1, "customer#1", 100.00, "AUTO")],
        "custkey long, nm string, bal double, seg string",
    )
    contacts = spark.createDataFrame(
        [
            (11, "customer#1x", 100.00, "ZEBRA"),
            (12, "cust", 77.70, "ZEBRA"),
        ],
        "contact_id long, nm string, bal double, seg string",
    )
    matches = spark.createDataFrame(
        [(1, 11), (1, 12)], "custkey long, contact_id long"
    )
    r = golden_records(master, contacts, matches).collect()[0]
    assert r.n_sources == 3
    assert r.golden_name == "customer#1x"  # longest
    assert r.golden_bal_cents == 10000  # 2 votes vs 1
    assert r.golden_seg == "ZEBRA"  # 2 votes vs 1
    assert r.name_repaired  # survivorship changed the master's name


def test_golden_record_repairs_real_corruptions(spark, sf_check):
    """On the FEBRL-style frames: every matched truncated contact is
    outvoted by the master's full name (never repaired the wrong
    way), and matched nudged balances resolve to the ORIGINAL cents."""
    from pyspark.sql import functions as F

    from mapreduce_implementation_grpc_spark import registry
    from mapreduce_implementation_grpc_spark.sources.catalog import load_table

    golden = {
        r.custkey: r
        for r in registry.QUERIES["linkage_golden_record"](
            spark, sf_check
        ).collect()
    }
    orig = {
        r.c_custkey: (r.c_name.lower(), round(r.c_acctbal * 100))
        for r in load_table(spark, sf_check, "customer").collect()
    }
    assert set(golden) == set(orig)
    repaired = 0
    for k, g in golden.items():
        nm, cents = orig[k]
        # the master's full name always survives (truncations only
        # ever REMOVE characters, so longest == original)
        assert g.golden_name == nm, k
        assert not g.name_repaired, k
        if g.n_sources >= 2:
            # any matched cluster resolves balance to the original:
            # un-nudged pairs agree, nudged pairs tie -> min = original
            assert g.golden_bal_cents == cents, k
            repaired += 1
    assert repaired > 0  # the match set is non-trivial
