"""Registry-wide oracle parity: EVERY query with a DuckDB oracle gets
a parity check, automatically including queries added later.

The per-operator test files keep their focused parity tests at
sf_check (0.01) scale; this sweep runs the full registry at sf_smoke
(0.001) so a new or edited oracle can never ship without CI coverage
(the r2 ADVICE gap: eleven oracles existed with no guarding test).
Rows-only queries (no oracle: randomized sketches) are asserted to be
exactly the documented set so an accidentally-dropped oracle fails
loudly too.
"""

from __future__ import annotations

import pytest

from mapreduce_implementation_grpc_spark import registry
from tests.oracle_utils import assert_matches_oracle

# Randomized-sketch queries exempt from exact oracles by design.
ROWS_ONLY = {"approx_distinct_users", "events_quantiles_approx"}


def test_every_query_has_oracle_or_documented_exemption():
    missing = set(registry.QUERIES) - set(registry.ORACLES) - ROWS_ONLY
    assert not missing, f"queries without oracle or exemption: {sorted(missing)}"
    stale = set(registry.ORACLES) - set(registry.QUERIES)
    assert not stale, f"oracles without a query: {sorted(stale)}"
    assert ROWS_ONLY.isdisjoint(registry.ORACLES)


@pytest.mark.parametrize("name", sorted(registry.ORACLES))
def test_registry_oracle_parity(spark, sf_smoke, name):
    assert_matches_oracle(
        registry.QUERIES[name](spark, sf_smoke), registry.ORACLES[name], sf_smoke
    )
