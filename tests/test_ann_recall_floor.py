"""Recall floor for the banded+re-ranked LSH ANN serving path
(VERDICT r8 #1 lead task): `ann_lsh_banded` must keep >=0.85 mean
top-5 recall vs exact kNN at sf0.1 (measured r9: 0.92).

Why a floor and not an exact pin: the recall value is deterministic
(fixed splitmix64 planes, fixed data), but the floor form documents
the OPERATING POINT -- any change to the plane generator, the band
geometry, or the re-rank that degrades retrieval quality fails
loudly, while a change that preserves or improves it passes without
editing the test. The r8 ladder this replaced: single-bucket 0.00,
Hamming-1 multi-probe 0.08-0.16, IVF 0.28-0.32 mean top-5 -- all
capped by the correlated LCG plane generator (see
operators/similarity.lsh_planes).
"""

from __future__ import annotations

import pytest


@pytest.mark.slow
def test_ann_lsh_banded_recall_floor(spark):
    from mapreduce_implementation_grpc_spark import registry

    sf = "/root/testdata/sf0.1"
    rows = registry.QUERIES["ann_recall_lsh_banded"](spark, sf).collect()
    assert len(rows) == 10, "expected one recall row per query vector"
    mean_recall = sum(r.recall for r in rows) / len(rows)
    # measured r9: 0.92 mean top-5 recall at sf0.1 (deterministic)
    assert mean_recall >= 0.85, (
        f"banded ANN recall collapsed: {mean_recall:.3f} "
        "(plane generator / band geometry / re-rank regression)"
    )


def test_banded_sweep_recall_monotone_in_bands(spark, sf_check):
    """Plane p depends only on its flat index, so a smaller sweep
    config's planes are a prefix of a larger one's: candidate sets
    nest, and recall must be monotone non-decreasing in bands for
    EVERY query."""
    from mapreduce_implementation_grpc_spark import registry

    rows = registry.QUERIES["ann_recall_lsh_banded_sweep"](
        spark, sf_check
    ).collect()
    by_query: dict[int, dict[int, float]] = {}
    for r in rows:
        by_query.setdefault(r.query_id, {})[r.bands] = r.recall
    assert by_query
    for qid, curve in by_query.items():
        vals = [curve[b] for b in sorted(curve)]
        assert vals == sorted(vals), (qid, curve)


@pytest.mark.slow
def test_ann_ladder_ordering(spark):
    """The probing ladder must stay ordered: banded+re-rank beats
    multi-probe beats single-bucket -- each rung strictly widens the
    candidate set on this corpus."""
    from mapreduce_implementation_grpc_spark import registry

    sf = "/root/testdata/sf0.1"

    def mean_recall(name: str) -> float:
        rows = registry.QUERIES[name](spark, sf).collect()
        return sum(r.recall for r in rows) / len(rows)

    single = mean_recall("ann_recall_lsh")
    multi = mean_recall("ann_recall_lsh_multiprobe")
    banded = mean_recall("ann_recall_lsh_banded")
    assert banded > multi >= single, (single, multi, banded)
