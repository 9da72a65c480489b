"""Quantile normalization (doc_length_quantile_norm): mapping
properties and oracle parity."""

from __future__ import annotations

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.sources.catalog import load_table

from tests.oracle_utils import assert_matches_oracle


def test_quantile_norm_properties(spark, sf_check):
    docs = {
        r.doc_id: (r.lang, r.n_chars)
        for r in load_table(spark, sf_check, "documents")
        .select("doc_id", "lang", "n_chars")
        .collect()
    }
    rows = registry.QUERIES["doc_length_quantile_norm"](
        spark, sf_check
    ).collect()
    # total function: one output row per document, originals untouched
    assert len(rows) == len(docs)
    got = {r.doc_id: r for r in rows}
    for doc_id, (lang, n_chars) in docs.items():
        assert got[doc_id].lang == lang
        assert got[doc_id].n_chars == n_chars
    # every normalized value is a length that EXISTS in the corpus
    corpus_lengths = {v for _, v in docs.values()}
    assert all(r.norm_n_chars in corpus_lengths for r in rows)
    # monotone within a language: rank order is preserved
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for grp in by_lang.values():
        grp.sort(key=lambda r: (r.n_chars, r.doc_id))
        norms = [r.norm_n_chars for r in grp]
        assert norms == sorted(norms)
        # the top-ranked doc of every language maps to the global max
        assert norms[-1] == max(corpus_lengths)


def test_quantile_norm_oracle(spark, sf_check):
    assert_matches_oracle(
        registry.QUERIES["doc_length_quantile_norm"](spark, sf_check),
        registry.ORACLES["doc_length_quantile_norm"],
        sf_check,
    )
