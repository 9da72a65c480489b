"""Skew profile + approximate percentile sketch: oracle parity and
sketch-vs-exact error bounds."""

from __future__ import annotations

from mapreduce_implementation_grpc_spark import registry
from tests.oracle_utils import assert_matches_oracle


def test_word_skew_profile_oracle(spark, sf_check):
    assert_matches_oracle(
        registry.QUERIES["word_skew_profile"](spark, sf_check),
        registry.ORACLES["word_skew_profile"],
        sf_check,
    )


def test_word_skew_profile_invariants(spark, sf_check):
    # percentiles must be monotone and consistent with the extremes
    # (the synthetic corpus's 31-word vocabulary is near-uniform, so
    # magnitude-of-skew is data-dependent -- the structural invariants
    # are what the operator owes the caller)
    row = registry.QUERIES["word_skew_profile"](spark, sf_check).collect()[0]
    assert 1 <= row.p50 <= row.p90 <= row.p99 <= row.max_cnt
    assert row.top1_share == round(row.max_cnt / row.n_tokens, 6)
    assert row.n_words <= row.n_tokens


def test_approx_quantiles_within_sketch_bound(spark, sf_check):
    """Greenwald-Khanna guarantees rank error <= n/accuracy. With
    accuracy=10000 and n ~ thousands per type, the approx percentile
    must land within the exact p +/- 1 percentile-point envelope."""
    exact = {
        r.event_type: r
        for r in registry.QUERIES["events_quantiles"](spark, sf_check).collect()
    }
    approx = {
        r.event_type: r
        for r in registry.QUERIES["events_quantiles_approx"](spark, sf_check).collect()
    }
    assert set(exact) == set(approx)
    for et, a in approx.items():
        e = exact[et]
        assert a.n_events == e.n_events
        spread = e.p99 - e.p50 or 1.0
        for p in ("p50", "p90", "p99"):
            assert abs(getattr(a, p) - getattr(e, p)) <= 0.05 * spread, (
                f"{et}.{p}: approx {getattr(a, p)} vs exact {getattr(e, p)}"
            )


def test_binned_quantiles_bracket_exact(spark, sf_check):
    """The binned estimate's left edge must bracket the true
    rank-based percentile (the ceil(p*n)-th smallest value) within
    one bin width -- the sketch's error bound by construction."""
    import math

    from mapreduce_implementation_grpc_spark import registry

    binned = {
        r.event_type: r
        for r in registry.QUERIES["events_quantiles_binned"](spark, sf_check).collect()
    }
    vals = {}
    for r in (
        spark.read.parquet(f"{sf_check}/events.parquet")
        .select("event_type", "value")
        .collect()
    ):
        vals.setdefault(r.event_type, []).append(float(r.value))
    for et, b in binned.items():
        vs = sorted(vals[et])
        n = len(vs)
        for bp, p in ((b.p50_bin, 0.5), (b.p90_bin, 0.9), (b.p99_bin, 0.99)):
            v_star = vs[math.ceil(p * n) - 1]
            assert bp <= v_star < bp + 10.0, (et, p, bp, v_star)


def test_portable_hll_error_within_bounds(spark, sf_check):
    """The portable HLL's relative error must stay within ~4 sigma of
    the published 1.04/sqrt(m) for m=256 (6.5%): |err| < 26%. (The
    exact value is deterministic and oracle-pinned; this guards the
    estimator MATH -- a broken rho or harmonic sum lands orders of
    magnitude off, not percent.)"""
    from mapreduce_implementation_grpc_spark.registry import QUERIES

    rows = QUERIES["hll_users_portable"](spark, sf_check).collect()
    assert rows and all(abs(r.rel_err) < 0.26 for r in rows)
    assert all(r.est_distinct > 0 for r in rows)


def test_cms_never_underestimates(spark, sf_check):
    """The Count-Min one-sided guarantee: est >= true for every
    probed word (collisions only ADD). Exact values are oracle-pinned;
    this guards the structural property."""
    from mapreduce_implementation_grpc_spark.registry import QUERIES

    rows = QUERIES["cms_heavy_hitters"](spark, sf_check).collect()
    assert len(rows) == 20
    assert all(r.overcount >= 0 for r in rows)
    assert all(r.est_cnt >= r.true_cnt for r in rows)
