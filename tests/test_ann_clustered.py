"""Clustered-corpus ANN selectivity (round 10, VERDICT r9 #1/#3):
the measured answer to "does the banded/IVF serving path become
SELECTIVE on data with real neighborhood structure, or only on the
adversarial near-orthogonal driver corpus?"

Floors/ceilings, not exact pins: everything here is deterministic
(splitmix64 centers, md5 noise, fixed planes), but the floor form
documents the OPERATING POINT -- a change that degrades retrieval
quality or inflates probe volume fails loudly, one that preserves
or improves them passes without editing the test.

Measured r10 at sf0.01 / sf0.1 (oracle-hash-checked at 3 SFs):
- fixture geometry: within-cluster cosine ~0.79, cross ~0.00
- banded 8x7:  recall 0.94 / 0.96 at candidate fraction ~0.10
- banded 16x7: recall 0.98 / 1.00 at ~0.18
- banded 64x7: recall 1.00 at ~0.44 (vs 0.92 at ~0.42 on the
  near-orthogonal corpus -- same config, same cost, more recall)
- learned-cell IVF (k=25, 2 probes): recall 1.00 at ~0.08
"""

from __future__ import annotations

import pytest

from mapreduce_implementation_grpc_spark import registry


def _mean(rows, field):
    vals = [getattr(r, field) for r in rows]
    return sum(vals) / len(vals)


def test_clustered_fixture_has_neighborhood_structure(spark, sf_check):
    rows = registry.QUERIES["clustered_corpus_structure"](
        spark, sf_check
    ).collect()
    by = {r.same_cluster: r for r in rows}
    assert set(by) == {0, 1}
    # within-cluster pairs are strong neighbors, cross pairs are noise
    assert by[1].mean_cos >= 0.7, by[1]
    assert abs(by[0].mean_cos) <= 0.05, by[0]
    # every query has cluster-mates: 10 queries x (cluster size - 1)
    assert by[1].n_pairs >= 10


def test_clustered_banded_recall_and_selectivity(spark, sf_check):
    """The headline: at 8 bands the banded path reaches >=0.9 recall
    probing <=15% of the corpus -- the selectivity SCALING.md could
    previously only assert. At 16 bands >=0.95 recall under 25%."""
    rows = registry.QUERIES["ann_clustered_selectivity"](
        spark, sf_check
    ).collect()
    by_bands: dict[int, list] = {}
    for r in rows:
        by_bands.setdefault(r.bands, []).append(r)
    assert set(by_bands) == {4, 8, 16, 64}
    assert all(len(v) == 10 for v in by_bands.values())
    assert _mean(by_bands[8], "recall") >= 0.90
    assert _mean(by_bands[8], "cand_frac") <= 0.15
    assert _mean(by_bands[16], "recall") >= 0.95
    assert _mean(by_bands[16], "cand_frac") <= 0.25
    # the serving config (64x7): full recall, and the cost ceiling
    # matches the orthogonal corpus's measured ~0.44 random-collision
    # floor for 64 bands
    assert _mean(by_bands[64], "recall") >= 0.98
    assert _mean(by_bands[64], "cand_frac") <= 0.50


def test_clustered_recall_monotone_in_bands(spark, sf_check):
    """Plane-prefix property: candidate sets nest across sweep
    widths, so recall is monotone non-decreasing in bands for EVERY
    query (and so is the candidate count)."""
    rows = registry.QUERIES["ann_clustered_selectivity"](
        spark, sf_check
    ).collect()
    by_query: dict[int, dict[int, tuple]] = {}
    for r in rows:
        by_query.setdefault(r.query_id, {})[r.bands] = (
            r.recall, r.n_candidates,
        )
    assert len(by_query) == 10
    for qid, curve in by_query.items():
        recalls = [curve[b][0] for b in sorted(curve)]
        cands = [curve[b][1] for b in sorted(curve)]
        assert recalls == sorted(recalls), (qid, curve)
        assert cands == sorted(cands), (qid, curve)


@pytest.mark.slow
def test_clustered_ivf_kmeans_recall_floor(spark, sf_check):
    """On clustered data the learned cells align with the true
    clusters: the 2-probe serve must keep >=0.95 recall while
    scanning <=12% of the corpus (measured: 1.00 at ~0.08)."""
    rows = registry.QUERIES["ann_clustered_ivf_kmeans_recall"](
        spark, sf_check
    ).collect()
    assert len(rows) == 10
    assert _mean(rows, "recall") >= 0.95
    assert _mean(rows, "cand_frac") <= 0.12


@pytest.mark.slow
def test_ivf_kmeans_standard_recall_floor(spark, sf_check):
    """The standard-corpus rung VERDICT r9 #3 asked for: learned-cell
    IVF measured 0.86 mean top-5 recall at sf0.01 (~24% probed) --
    must stay above the 0.28-0.32 label-cell ceiling it beats."""
    rows = registry.QUERIES["ann_recall_ivf_kmeans"](
        spark, sf_check
    ).collect()
    assert len(rows) == 10
    assert _mean(rows, "recall") >= 0.6


@pytest.mark.slow
def test_selectivity_story_clustered_vs_orthogonal(spark, sf_check):
    """The round's claim in one assertion: at EQUAL-or-better recall
    the banded path probes a far smaller corpus fraction on clustered
    data than the orthogonal corpus's measured operating point (0.92
    recall at ~0.42 fraction, 64x7). Clustered 8x7 must beat that
    recall at under half the fraction."""
    rows = registry.QUERIES["ann_clustered_selectivity"](
        spark, sf_check
    ).collect()
    b8 = [r for r in rows if r.bands == 8]
    assert _mean(b8, "recall") >= 0.92
    assert _mean(b8, "cand_frac") <= 0.21
