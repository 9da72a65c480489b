"""Training-data shaping operators: exact crafted-corpus properties +
oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.operators.chunking import (
    doc_chunks,
    pack_sequences,
)
from tests.oracle_utils import assert_matches_oracle


@pytest.fixture(scope="module")
def chunk_docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, source="s0", text="a b c d e f g h i j"),  # 10 tokens
            Row(doc_id=2, source="s0", text="one two three"),
            Row(doc_id=3, source="s1", text="..."),                  # 0 tokens
            Row(doc_id=4, source="s1", text="solo"),
        ]
    )


def test_doc_chunks_windows_exact(chunk_docs):
    rows = doc_chunks(chunk_docs, chunk_size=4, stride=3).collect()
    got = {(r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text) for r in rows}
    # doc 1: starts 0,3,6,9 -> windows of 4 (tail short)
    assert got[(1, 0)] == (4, "a b c d")
    assert got[(1, 1)] == (4, "d e f g")
    assert got[(1, 2)] == (4, "g h i j")
    assert got[(1, 3)] == (1, "j")
    # doc 2: one full window
    assert got[(2, 0)] == (3, "one two three")
    # doc 3 (zero tokens) produces nothing; doc 4 one 1-token chunk
    assert not any(d == 3 for d, _ in got)
    assert got[(4, 0)] == (1, "solo")


def test_doc_chunks_overlap_covers_every_token(chunk_docs):
    # stride < chunk_size: every token of every doc appears in >=1 chunk
    rows = doc_chunks(chunk_docs, chunk_size=4, stride=3).collect()
    per_doc_tokens = {}
    for r in rows:
        per_doc_tokens.setdefault(r.doc_id, set()).update(r.chunk_text.split(" "))
    assert per_doc_tokens[1] == set("abcdefghij")


def test_pack_sequences_prefix_packing(spark):
    # bpe-ish count = sum(ceil+adjust (len+3)//4) per token
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="s0", text="aaaa bbbb"),   # 2 + ... tokens of len 4 -> (4+3)//4=1 each? (7)//4=1 -> 2 tokens
            Row(doc_id=2, source="s0", text="cccc dddd"),
            Row(doc_id=3, source="s0", text="eeee"),
            Row(doc_id=10, source="s1", text="zzzz"),
        ]
    )
    rows = {r.doc_id: r for r in pack_sequences(docs, budget=3).collect()}
    # per-doc n_tokens: doc1=2, doc2=2, doc3=1; shard s0 prefix sums 0,2,4
    assert (rows[1].bin_id, rows[1].offset) == (0, 0)
    assert (rows[2].bin_id, rows[2].offset) == (0, 2)
    assert (rows[3].bin_id, rows[3].offset) == (1, 1)
    # shard s1 packs independently
    assert (rows[10].bin_id, rows[10].offset) == (0, 0)


@pytest.mark.parametrize(
    "name", ["doc_chunks", "pack_sequences", "ngram_counts", "vocab_ids"]
)
def test_oracle_parity(spark, sf_check, name):
    assert_matches_oracle(
        registry.QUERIES[name](spark, sf_check), registry.ORACLES[name], sf_check
    )
