"""Lexical richness per language (lang_lexical_richness):
frequency-spectrum invariants and oracle parity."""

from __future__ import annotations

import pytest

from mapreduce_implementation_grpc_spark import registry

from tests.oracle_utils import assert_matches_oracle


def test_lexical_richness_invariants(spark, sf_check):
    rows = registry.QUERIES["lang_lexical_richness"](
        spark, sf_check
    ).collect()
    assert rows
    ent = {
        r.lang: (r.n_tokens, r.vocab)
        for r in registry.QUERIES["lang_token_entropy"](
            spark, sf_check
        ).collect()
    }
    for r in rows:
        # frequency-spectrum algebra
        assert 0 <= r.n_hapax <= r.n_types <= r.n_tokens
        assert r.ttr == pytest.approx(r.n_types / r.n_tokens)
        assert r.hapax_share == pytest.approx(r.n_hapax / r.n_types)
        # shares one tokenize definition with the entropy query
        assert ent[r.lang] == (r.n_tokens, r.n_types)


def test_lang_lexical_richness_oracle(spark, sf_check):
    assert_matches_oracle(
        registry.QUERIES["lang_lexical_richness"](spark, sf_check),
        registry.ORACLES["lang_lexical_richness"],
        sf_check,
    )
