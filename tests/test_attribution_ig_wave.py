"""Wave-7 r7 operators: Markov removal-effect attribution, feature
information gain, and Dunning G2 keyness. Crafted-funnel hand checks
and structural invariants. (Oracle parity runs in the registry-wide
sweep and tools/check_correctness.py.)"""

from __future__ import annotations

import datetime as dt
import math
import os
import tempfile

import pytest

from mapreduce_implementation_grpc_spark import registry


def _write_events(spark, rows):
    """rows: (user_id, [event_type, ...]) -> events parquet dir."""
    flat = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for uid, seq in rows:
        for i, et in enumerate(seq):
            flat.append(
                (eid, base + dt.timedelta(minutes=i), uid, et, 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        flat,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def test_attribution_structural_invariants(spark, sf_check):
    out = registry.QUERIES["attribution_markov_removal"](
        spark, sf_check
    ).collect()
    assert {r.channel for r in out} == {"click", "error", "signup", "view"}
    for r in out:
        assert 0.0 <= r.p_removed <= r.p_base <= 1.0
        assert 0.0 <= r.removal_effect <= 1.0 + 1e-12
        assert r.removal_effect == pytest.approx(
            1.0 - r.p_removed / r.p_base, abs=1e-9
        )
    shares = [r.attribution_share for r in out]
    if any(s is not None for s in shares):
        assert sum(shares) == pytest.approx(1.0, abs=1e-9)


def test_attribution_gatekeeper_channel_gets_full_effect(spark):
    """'gate' is on EVERY path into purchase -> removing it kills all
    conversion (effect 1); 'side' never leads anywhere."""
    rows = [(u, ["gate", "purchase"]) for u in range(10)]
    rows += [(100 + u, ["side", "gate", "purchase"]) for u in range(5)]
    rows += [(200 + u, ["side", "side"]) for u in range(5)]
    d = _write_events(spark, rows)
    out = {
        r.channel: r
        for r in registry.QUERIES["attribution_markov_removal"](
            spark, d
        ).collect()
    }
    assert out["gate"].p_removed == pytest.approx(0.0, abs=1e-9)
    assert out["gate"].removal_effect == pytest.approx(1.0, abs=1e-9)
    assert out["side"].removal_effect < 1.0
    assert out["gate"].attribution_share > out["side"].attribution_share


def test_information_gain_bounds(spark, sf_check):
    out = registry.QUERIES["feature_information_gain"](
        spark, sf_check
    ).collect()
    assert {r.feature for r in out} == {"has_digit", "len_bucket", "source"}
    for r in out:
        # IG in [0, H(Y)] up to the 9dp term rounding
        assert r.ig_nats >= -1e-6
        assert r.ig_nats <= r.h_y + 1e-6
        assert r.h_y_given_x >= -1e-6


def test_information_gain_perfect_feature(spark):
    """source == label -> IG(source) recovers H(Y); a constant-ish
    feature carries ~0."""
    docs = [
        (i, "plain words only", "en" if i % 3 == 0 else "fr",
         "en" if i % 3 == 0 else "fr", 16)
        for i in range(90)
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {
        r.feature: r
        for r in registry.QUERIES["feature_information_gain"](
            spark, d
        ).collect()
    }
    p = 1 / 3
    h = -(p * math.log(p) + (1 - p) * math.log(1 - p))
    assert out["source"].h_y == pytest.approx(h, abs=1e-6)
    assert out["source"].ig_nats == pytest.approx(h, abs=1e-6)
    # text and n_chars are constant -> has_digit/len_bucket carry 0
    assert out["has_digit"].ig_nats == pytest.approx(0.0, abs=1e-6)
    assert out["len_bucket"].ig_nats == pytest.approx(0.0, abs=1e-6)


def test_g2_keyness_discriminates_and_agrees_with_chi2_on_top(spark):
    docs = []
    for i in range(40):
        docs.append((i, "zebra common filler words here", "en", "s", 30))
    for i in range(40, 80):
        docs.append((i, "quokka common filler words here", "fr", "s", 30))
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    g2 = registry.QUERIES["term_keyness_g2"](spark, d).collect()
    top = {r.lang: r.word for r in g2 if r.rank == 1}
    assert top["en"] == "zebra" and top["fr"] == "quokka"
    for r in g2:
        assert r.g2 >= -1e-9
    chi = registry.QUERIES["term_chi2_keywords"](spark, d).collect()
    chi_top = {r.lang: r.word for r in chi if r.rank == 1}
    assert chi_top == top
