"""Lint over the committed canary scale-slope ledger (VERDICT r8 #4):
every canary query whose measured log-log slope across
sf0.001/0.01/0.1 exceeds the ceiling must be allowlisted with a
reason -- a superlinear plan hiding under a small constant at the
single sf0.1 bench point trips this instead of surviving unnoticed.

The ledger (tools/canary_slope.json) is produced by
tools/canary_slope.py on a quiet machine and committed; this test
checks the committed artifact so CI needs no 3-SF timing run.
"""

from __future__ import annotations

import json
import os

from mapreduce_implementation_grpc_spark import registry

LEDGER = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "canary_slope.json",
)

# query -> reason its slope may exceed the ceiling (documented
# super-linear by design; keep in sync with SCALING.md)
SUPERLINEAR_ALLOWLIST: dict[str, str] = {
    "cosupply_triangles": (
        "exact degree-oriented triangle enumeration is O(E^1.5) by "
        "design -- the documented price of an exact motif count "
        "(SCALING.md r5); the bounded alternative would be a sampled "
        "or approximate count, kept out of the oracle-of-record path"
    ),
    "embedding_mutual_nn_lsh": (
        "banded-LSH candidate volume is ~quadratic in the embedding "
        "count at min_cosine=0.35 on this near-orthogonal synthetic "
        "corpus (pair recall 0.92 needs ~54% of pairs as candidates; "
        "SCALING.md r9) -- bounded by banding at real thresholds/"
        "corpora, quadratic-ish at this one by design"
    ),
}


def _load() -> dict:
    assert os.path.exists(LEDGER), (
        "tools/canary_slope.json missing -- run tools/canary_slope.py"
    )
    with open(LEDGER) as fh:
        return json.load(fh)


def test_slope_ledger_covers_canary_set():
    doc = _load()
    assert set(doc["queries"]) == set(registry.CANARY_QUERIES)


def test_superlinear_slopes_are_allowlisted():
    doc = _load()
    ceiling = doc["slope_ceiling"]
    flagged = {
        name
        for name, row in doc["queries"].items()
        if row["slope"] > ceiling
    }
    unexplained = flagged - set(SUPERLINEAR_ALLOWLIST)
    assert not unexplained, (
        f"superlinear canary slopes without a documented reason: "
        f"{sorted(unexplained)} (ceiling {ceiling}; measure with "
        "tools/canary_slope.py, then either fix the plan or allowlist "
        "with a reason)"
    )


def test_allowlist_entries_have_reasons():
    for name, reason in SUPERLINEAR_ALLOWLIST.items():
        assert name in registry.CANARY_QUERIES, name
        assert len(reason) > 40, f"{name}: reason too thin to audit"
