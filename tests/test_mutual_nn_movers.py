"""Mutual nearest neighbors (similarity.mutual_nearest_pairs) and
the rank-movers league table: crafted-geometry checks + oracle
parity."""

from __future__ import annotations

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.operators.similarity import (
    mutual_nearest_pairs,
)

from tests.oracle_utils import assert_matches_oracle


def _pairs_df(spark, rows):
    return spark.createDataFrame(rows, "vec_a long, vec_b long, cosine double")


def test_mutual_pair_kept_one_sided_pair_dropped(spark):
    # 1<->2 is reciprocal best (0.9). 3's best is 2 (0.8), but 2's
    # best is 1, so (2, 3) is one-sided and must drop.
    rows = [(1, 2, 0.9), (2, 3, 0.8), (1, 3, 0.1)]
    got = [(r.vec_a, r.vec_b, r.cosine) for r in mutual_nearest_pairs(_pairs_df(spark, rows)).collect()]
    assert got == [(1, 2, 0.9)]


def test_mutual_nn_chain_alternates(spark):
    # chain 1-2-3-4 with rising similarity: only the strongest link
    # (3,4) is reciprocal; 2's best is 3 (taken), 1 matches nobody
    rows = [(1, 2, 0.5), (2, 3, 0.6), (3, 4, 0.7)]
    got = {(r.vec_a, r.vec_b) for r in mutual_nearest_pairs(_pairs_df(spark, rows)).collect()}
    assert got == {(3, 4)}


def test_mutual_nn_tie_breaks_deterministically(spark):
    # node 2 sees equal cosine to 1 and 3: tie-break picks the lower
    # neighbor id (1), making (1,2) mutual and (2,3) not
    rows = [(1, 2, 0.5), (2, 3, 0.5)]
    got = {(r.vec_a, r.vec_b) for r in mutual_nearest_pairs(_pairs_df(spark, rows)).collect()}
    assert got == {(1, 2)}


def test_mutual_nn_subset_of_dup_pairs(spark, sf_check):
    mut = registry.QUERIES["embedding_mutual_nn"](spark, sf_check)
    dup = registry.QUERIES["embedding_dup_pairs"](spark, sf_check)
    mset = {(r.vec_a, r.vec_b) for r in mut.collect()}
    dset = {(r.vec_a, r.vec_b) for r in dup.collect()}
    assert mset and mset <= dset
    # reciprocity makes it a matching: every vector appears at most once
    seen: set[int] = set()
    for a, b in mset:
        assert a not in seen and b not in seen
        seen.update((a, b))


def test_embedding_mutual_nn_oracle(spark, sf_check):
    assert_matches_oracle(
        registry.QUERIES["embedding_mutual_nn"](spark, sf_check),
        registry.ORACLES["embedding_mutual_nn"],
        sf_check,
    )


def test_nation_rank_movers_oracle_and_invariants(spark, sf_check):
    df = registry.QUERIES["nation_rank_movers"](spark, sf_check)
    assert_matches_oracle(df, registry.ORACLES["nation_rank_movers"], sf_check)
    rows = df.collect()
    assert len(rows) == 25
    # each year's ranks are a permutation of 1..25; deltas sum to 0
    assert sorted(r.rank_1995 for r in rows) == list(range(1, 26))
    assert sorted(r.rank_1996 for r in rows) == list(range(1, 26))
    assert sum(r.rank_delta for r in rows) == 0
