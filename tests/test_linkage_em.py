"""One EM iteration of the Fellegi-Sunter model from the documented
(m, u) constants (VERDICT r7 "What's missing" #4): the constants are
fixed by design (fitting is a procedure, not a query), so this
pytest-only check shows what one EM step does to them on the real
sf0.01 candidate pairs.

Measured behavior (deterministic data): the numeric parameters move
toward the generator's actual corruption rates -- m_nm -> ~0.80
(every 5th contact name truncated), m_bal -> ~0.67 (every 3rd balance
nudged), u's ride on the ~12 blocked non-matches -- but the DECISION
SET is exactly invariant: re-scoring every candidate pair with the
one-step-refit weights flips zero match/non-match classifications.
That is the operative fixed-point property: the documented constants
sit inside the basin where the classifier's decisions are already
EM-stable, which is what using fixed constants assumes."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.mark.slow
def test_one_em_step_preserves_the_match_decision_set(spark, sf_check):
    from mapreduce_implementation_grpc_spark.operators.linkage import (
        FS_FIELDS,
        _scored_pairs,
    )
    from mapreduce_implementation_grpc_spark.registry.eval_temporal import (
        _linkage_frames,
    )

    master, contacts = _linkage_frames(spark, sf_check)
    rows = _scored_pairs(master, contacts, ["nat", "blk"], 0.0).collect()
    G = np.array(
        [[r.nm_agree, r.bal_agree, r.seg_agree] for r in rows], dtype=float
    )
    truth = np.array([r.contact_id - 10_000_000 == r.custkey for r in rows])
    assert truth.any() and (~truth).any(), "need both classes in the block"

    m = np.array([mm for _, mm, _ in FS_FIELDS])
    u = np.array([uu for _, _, uu in FS_FIELDS])
    p = truth.mean()  # true prevalence among blocked candidates

    # E-step: posterior match probability under the documented params
    pm = (m**G * (1 - m) ** (1 - G)).prod(axis=1)
    pu = (u**G * (1 - u) ** (1 - G)).prod(axis=1)
    w = p * pm / (p * pm + (1 - p) * pu)
    # M-step: refit (m, u)
    m1 = (w[:, None] * G).sum(axis=0) / w.sum()
    u1 = ((1 - w)[:, None] * G).sum(axis=0) / (1 - w).sum()

    # refit m tracks the empirical agreement rates of true matches
    emp_m = G[truth].mean(axis=0)
    assert np.abs(m1 - emp_m).max() < 0.05, (m1, emp_m)

    # the decision set is EXACTLY invariant under one EM step
    def weights(mv, uv):
        return np.log2(mv / uv), np.log2((1 - mv) / (1 - uv))

    wa0, wd0 = weights(m, u)
    wa1, wd1 = weights(m1, u1)
    s0 = (G * wa0 + (1 - G) * wd0).sum(axis=1)
    s1 = (G * wa1 + (1 - G) * wd1).sum(axis=1)
    flips = int(((s0 > 0) != (s1 > 0)).sum())
    assert flips == 0, f"{flips} pairs changed class after one EM step"

    # weight structure survives the refit: agreement evidence stays
    # positive and disagreement negative for the near-unique fields;
    # the 5-category segment field stays correctly ordered
    assert (wa1[:2] > 0).all() and (wd1[:2] < 0).all()
    assert wa1[2] > wd1[2]
