"""10x scale-probe ledger lint (round 10, VERDICT r9 #2): the
committed tools/scale_probe.json records each data-proportional
query's runtime at sf0.1 vs the builder-generated 10x dataset.
ratio10x = 10 would be ideal fully-data-bound linear scaling; a
ratio far ABOVE 10 means a stage whose cost grows faster than the
data -- driver collect, broadcast past its fit, quadratic fan-out --
i.e. exactly what will not survive 100 TB. This lint turns a
superlinear committed measurement into a test failure the way
test_canary_slope does for the sf-slope ledger.

Measured r10: every ratio in [1.08, 5.55] -- all SUBLINEAR (fixed
costs amortize). The ceiling leaves room for a query to become
genuinely data-bound (ratio -> 10 + noise) without alarming."""

from __future__ import annotations

import json
import os

# linear scaling (10) + the ~30% per-query noise band; anything above
# this is superlinear beyond measurement noise
RATIO_CEILING = 13.0

# Documented probe-DATA artifacts (r11): the 10x dataset is 10
# verbatim replicas (scale_probe_data.py docstring: "dedup operators
# see a 90%-duplicate corpus"). Operators whose work is quadratic in
# DUPLICATES are legitimately superlinear on that corpus and say
# nothing about volume scaling on real data:
# - embedding_mutual_nn_lsh: every LSH bucket holds 10 copies of each
#   original vector -> within-bucket candidate pairs grow ~100x (and
#   each pair IS an output candidate at cosine 1.0). Measured 53.5x
#   at k=10 -- close to the 100x/pipelining bound, exactly the
#   duplicate-quadratic prediction. The production pipeline dedups
#   (minhash/semantic_dedup) BEFORE ANN indexing for this reason.
#   (The r11 pin=False choice was re-validated on this corpus: the
#   pinned form measured 284 s vs 139 s unpinned at 10x -- pinning
#   the blown-up candidate set doubles the damage.)
DUPLICATE_QUADRATIC_EXEMPT = {"embedding_mutual_nn_lsh"}

LEDGER = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "scale_probe.json",
)


def test_probe_ledger_exists_and_is_sane():
    with open(LEDGER) as fh:
        doc = json.load(fh)
    assert doc["k"] == 10 and doc["runs"] >= 1
    assert len(doc["queries"]) >= 10
    for name, row in doc["queries"].items():
        assert row["sf0.1_sec"] > 0 and row["x10_sec"] > 0, name
        assert row["ratio10x"] == round(row["x10_sec"] / row["sf0.1_sec"], 2), name


def test_no_superlinear_scaling_in_committed_probe():
    with open(LEDGER) as fh:
        doc = json.load(fh)
    bad = {
        name: row["ratio10x"]
        for name, row in doc["queries"].items()
        if row["ratio10x"] > RATIO_CEILING
        and name not in DUPLICATE_QUADRATIC_EXEMPT
    }
    assert not bad, (
        f"superlinear 10x scaling committed: {bad} -- a stage in these "
        "plans grows faster than the data (collect/broadcast/fan-out?); "
        "re-run tools/scale_probe.py and find the code change"
    )


def test_heavy_canaries_are_covered():
    """The probe must keep covering the queries whose sf-slope ledger
    entries are the steepest -- they are the only ones with real
    data-proportional signal."""
    with open(LEDGER) as fh:
        doc = json.load(fh)
    for name in ("cosupply_triangles", "purchase_pagerank",
                 "market_share", "minhash_near_dup"):
        assert name in doc["queries"], name
