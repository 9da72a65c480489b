"""Containment join (operators/setjoin.containment_prefix_pairs):
asymmetric near-dup cases Jaccard misses."""

from __future__ import annotations

from mapreduce_implementation_grpc_spark.operators.setjoin import (
    containment_prefix_pairs,
    jaccard_prefix_pairs,
)

# doc 1 is doc 2's opening quoted whole inside much more text;
# doc 3 is unrelated
SMALL = "alpha beta gamma delta epsilon zeta"
BIG = (
    SMALL
    + " one two three four five six seven eight nine ten eleven twelve "
    "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
)
DOCS = [(1, SMALL), (2, BIG), (3, "red green blue cyan magenta yellow")]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_contained_chunk_found_and_directed(spark):
    rows = containment_prefix_pairs(_docs(spark)).collect()
    got = {(r.doc_small, r.doc_big): r for r in rows}
    assert (1, 2) in got
    r = got[(1, 2)]
    # every 3-shingle of doc 1 appears in doc 2
    assert r.inter == r.size_small
    assert r.containment == 1.0
    # direction matters: doc 2 is NOT contained in doc 1
    assert (2, 1) not in got
    # the unrelated doc pairs with nothing
    assert all(3 not in pair for pair in got)


def test_jaccard_misses_what_containment_catches(spark):
    jac = jaccard_prefix_pairs(_docs(spark)).collect()
    assert jac == []  # J(1,2) ~ |A|/|B| << 4/5
    con = containment_prefix_pairs(_docs(spark)).collect()
    assert len(con) == 1


def test_threshold_is_exact_integer_boundary(spark):
    # small doc with 10 shingles, 9 of them in big -> C = 9/10
    # exactly at threshold 9/10: inclusive (10*9 >= 9*10)
    small = "a b c d e f g h i j k l"  # 10 3-shingles
    big = "a b c d e f g h i j XX YY ZZ"  # drops the last shingles
    docs = spark.createDataFrame(
        [(1, small), (2, big + " filler " * 3)], "doc_id bigint, text string"
    )
    rows = containment_prefix_pairs(docs).collect()
    found = {(r.doc_small, r.doc_big): r for r in rows}
    if (1, 2) in found:
        r = found[(1, 2)]
        assert 10 * r.inter >= 9 * r.size_small
    # boundary semantics are pinned by the oracle hash at 3 SFs; here
    # just assert nothing BELOW threshold leaks through
    assert all(10 * r.inter >= 9 * r.size_small for r in rows)
