"""Top-N-with-OTHERS rollup (nation_top_brands_others): structural
invariants and oracle parity."""

from __future__ import annotations

import pytest

from mapreduce_implementation_grpc_spark import registry

from tests.oracle_utils import assert_matches_oracle


def test_topn_others_invariants(spark, sf_check):
    rows = registry.QUERIES["nation_top_brands_others"](
        spark, sf_check
    ).collect()
    by_nation: dict[str, list] = {}
    for r in rows:
        by_nation.setdefault(r.n_name, []).append(r)
    for n_name, grp in by_nation.items():
        # at most 3 named brands + 1 OTHERS
        assert len(grp) <= 4
        named = [r for r in grp if r.brand != "OTHERS"]
        others = [r for r in grp if r.brand == "OTHERS"]
        assert len(named) <= 3
        assert len(others) <= 1
        assert all(r.n_brands == 1 for r in named)
        # shares of a nation sum to exactly the whole
        assert sum(r.share for r in grp) == pytest.approx(1.0, abs=1e-9)
        if others:
            # OTHERS only exists past a full top-3, and the total
            # distinct brands can never exceed the 25 in the data
            assert len(named) == 3
            assert 1 <= others[0].n_brands <= 25 - 3


def test_nation_top_brands_others_oracle(spark, sf_check):
    assert_matches_oracle(
        registry.QUERIES["nation_top_brands_others"](spark, sf_check),
        registry.ORACLES["nation_top_brands_others"],
        sf_check,
    )
