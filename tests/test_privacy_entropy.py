"""k-anonymity report and token-entropy invariants."""

from __future__ import annotations

import math
import os

import pytest

from mapreduce_implementation_grpc_spark import registry


def test_k_anonymity_crafted_groups(spark, tmp_path):
    # group (7, 'A', 0): 12 rows (safe); (7, 'B', 0): 3 rows at risk;
    # (8, 'A', 1): 1 row at risk
    rows = (
        [(i, f"Customer#{i}", 7, 100.0, "A") for i in range(12)]
        + [(100 + i, f"Customer#{100+i}", 7, 500.0, "B") for i in range(3)]
        + [(200, "Customer#200", 8, 1500.0, "A")]
    )
    d = str(tmp_path / "t")
    os.makedirs(d)
    spark.createDataFrame(
        rows,
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).write.parquet(os.path.join(d, "customer.parquet"))
    r = registry.QUERIES["k_anonymity_report"](spark, d).collect()[0]
    assert r.k == 10
    assert r.n_groups == 3
    assert r.n_violating_groups == 2
    assert r.rows_at_risk == 4
    assert r.min_group_size == 1


def test_entropy_bounds_and_uniform_case(spark, tmp_path):
    # uniform 4-word distribution -> exactly 2 bits; single word -> 0
    d = str(tmp_path / "docs")
    os.makedirs(d)
    spark.createDataFrame(
        [
            (1, "aa bb cc dd", "u", "s", 11),
            (2, "zz zz zz zz", "o", "s", 11),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(os.path.join(d, "documents.parquet"))
    got = {
        r.lang: r
        for r in registry.QUERIES["lang_token_entropy"](spark, d).collect()
    }
    assert got["u"].entropy_bits == 2.0 and got["u"].vocab == 4
    assert got["o"].entropy_bits == 0.0 and got["o"].vocab == 1
    assert got["u"].n_tokens == got["o"].n_tokens == 4


def test_entropy_upper_bound_log2_vocab(spark, sf_check):
    rows = registry.QUERIES["lang_token_entropy"](spark, sf_check).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 < r.entropy_bits <= math.log2(r.vocab) + 1e-9, r.lang
